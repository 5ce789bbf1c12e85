"""Isolated A/B of the ms adjoint (_flat_percept_ms_adj) — the measured
hot spot of the tiled backward (34.4 of 74 ms at 256-px ms c16 b3;
scripts/profile_bwd_ablate.py, docs/ROUND4.md).

Hypothesis: the ~20 boolean [1, L]-mask where/select ops pay a broadcast/
relayout per use on [64, L] data. Variants:

  base   the production adjoint
  fmul   same structure, every boolean mask op as f32 multiply / lerp
  coef   algebraic coefficient-array form: the U^T ladder collapses to
         4 (resp. 5) fused multiply-adds against precomputed [1, L] f32
         coefficient arrays

Equality is checked in interpret mode (CPU) for every variant; timing
runs each variant as ONE pallas kernel looping K tile-calls."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

CPU = "--cpu" in sys.argv
if CPU:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl
import jax.experimental.pallas.tpu as pltpu

from vsnca_tpu.ops.pallas_step import (
    _MS_HALO,
    _ms_masks,
    SOBEL_X,
    SOBEL_Y,
    LAPLACIAN,
)
from vsnca_tpu.ops.pallas_train import (
    SOBEL_X_F,
    SOBEL_Y_F,
    LAPLACIAN_F,
    _flat_percept_ms_adj,
)


def _adj_fmul(gp, msk, cp, n, w):
    """_flat_percept_ms_adj with every boolean mask op as f32 arithmetic.
    Structure and frames identical to the production adjoint."""
    hb = _MS_HALO
    nb = n + 2 * hb * w
    f32 = jnp.float32

    mf = {k: v.astype(f32) for k, v in msk.items() if v.dtype == jnp.bool_}

    def rl(x, k):
        L = x.shape[-1]
        return pltpu.roll(x, (L - k) % L, axis=1)

    def fv(x, x_off, off, L):
        s = off - x_off
        assert 0 <= s and s + L <= x.shape[-1], (s, L, x.shape)
        return x[:, s : s + L]

    def mv(name, off, L):
        return fv(mf[name], 0, off, L)

    def zeros(rows, k):
        return jnp.zeros((rows, k * w), f32)

    gpad = jnp.concatenate(
        [zeros(4 * cp, hb), gp.astype(f32), zeros(4 * cp, hb)], axis=1
    )

    F1o, F1L = 4 * w, n + 4 * w
    geo, geL = 4 * w, n + 6 * w
    goo, goL = 3 * w, n + 6 * w
    g_ge = fv(gpad, 0, geo, geL)
    er_ge = mv("even_row", geo, geL)
    ge = er_ge * g_ge
    g_go = fv(gpad, 0, goo, goL)
    go = g_go - mv("even_row", goo, goL) * g_go
    gr0 = mv("grow0", geo, geL)
    grl = mv("growlast", goo, goL)
    t1 = (0.75 + 0.25 * gr0) * ge
    t2 = 0.25 * (1.0 - gr0) * ge
    t3 = (0.75 + 0.25 * grl) * go
    t4 = 0.25 * (1.0 - grl) * go
    guw = (
        fv(t1, geo, F1o, F1L)
        + fv(t2, geo, F1o + 2 * w, F1L)
        + fv(t3, goo, F1o + w, F1L)
        + fv(t4, goo, F1o - w, F1L)
    )

    ec = mv("even_col", F1o, F1L)
    gec = ec * guw
    goc = guw - gec
    c0f = mv("col0", F1o, F1L)
    cw1f = mv("colw1", F1o, F1L)
    gs = (
        (0.75 + 0.25 * c0f) * gec
        + rl(0.25 * (1.0 - c0f) * gec, 2)
        + rl((0.75 + 0.25 * cw1f) * goc, 1)
        + rl(0.25 * (1.0 - cw1f) * goc, -1)
    )
    gs = mv("f1_supp", 0, F1L) * gs

    gsw = jnp.concatenate([zeros(4 * cp, 5), gs, zeros(4 * cp, 4)], axis=1)
    gswo = -w

    gst = gsw[cp:]
    r2m = rl(gst, -2)
    r2p = rl(gst, 2)
    Fco, FcL = 0, n + 11 * w
    lt2 = mv("col_lt2", Fco, FcL)
    gew2 = mv("col_gew2", Fco, FcL)
    c0 = lt2 * fv(r2m, gswo, Fco + w, FcL) + (1.0 - lt2) * fv(
        r2m, gswo, Fco, FcL
    )
    c2 = gew2 * fv(r2p, gswo, Fco - w, FcL) + (1.0 - gew2) * fv(
        r2p, gswo, Fco, FcL
    )
    c1 = fv(gst, gswo, Fco, FcL)

    Fgo, FgL = 2 * w, n + 7 * w
    gd = fv(gsw[:cp], gswo, Fgo, FgL)
    for bi, K in ((0, SOBEL_X_F), (1, SOBEL_Y_F), (2, LAPLACIAN_F)):
        for di in range(3):
            for dj, cl in ((0, c0), (1, c1), (2, c2)):
                co = K[di][dj]
                if co:
                    gd = gd + float(co) * fv(
                        cl[bi * cp : (bi + 1) * cp], Fco,
                        Fgo + 2 * (di - 1) * w, FgL,
                    )

    gdw = jnp.concatenate([zeros(cp, 2), gd, zeros(cp, 1)], axis=1)
    gdm1 = rl(gdw, -1)
    Ao, AL = 2 * w, n + 8 * w
    gx1 = 0.25 * (
        fv(gdw, 0, Ao, AL) + fv(gdm1, 0, Ao, AL)
        + fv(gdw, 0, Ao - w, AL) + fv(gdm1, 0, Ao - w, AL)
    )

    gbs = gpad[cp:]
    r1p = rl(gbs, 1)
    r1m = rl(gbs, -1)
    Fqo, FqL = w, n + 10 * w
    cw1q = mv("colw1", Fqo, FqL)
    c0q = mv("col0", Fqo, FqL)
    q0 = cw1q * fv(r1p, 0, Fqo - w, FqL) + (1.0 - cw1q) * fv(
        r1p, 0, Fqo, FqL
    )
    q2 = c0q * fv(r1m, 0, Fqo + w, FqL) + (1.0 - c0q) * fv(
        r1m, 0, Fqo, FqL
    )
    q1 = fv(gbs, 0, Fqo, FqL)

    gx0 = fv(gpad[:cp], 0, Ao, AL)
    for bi, K in ((0, SOBEL_X), (1, SOBEL_Y), (2, LAPLACIAN)):
        for di in range(3):
            for dj, q in ((0, q0), (1, q1), (2, q2)):
                co = K[2 - di][dj]
                if co:
                    gx0 = gx0 + float(co) * fv(
                        q[bi * cp : (bi + 1) * cp], Fqo,
                        Ao + (di - 1) * w, AL,
                    )

    return 0.5 * (gx0 + gx1)


def _adj_stage(gp, msk, cp, n, w, stages=frozenset()):
    """Production adjoint with stages stubbed for TIMING bisection (wrong
    outputs): 'ut' zeroes the U^T ladder result (gs = zeros view of gpad),
    'st' skips the S^T class+stencil accumulation (gd = raw block only),
    'dt' skips D^T (gx1 = gd view), 'sc0' skips the scale-0 transpose
    (gx0 = raw block only), 'noroll' turns every pltpu.roll into identity."""
    hb = _MS_HALO
    f32 = jnp.float32

    def rl(x, k):
        if "noroll" in stages:
            return x
        L = x.shape[-1]
        return pltpu.roll(x, (L - k) % L, axis=1)

    def fv(x, x_off, off, L):
        s = off - x_off
        assert 0 <= s and s + L <= x.shape[-1], (s, L, x.shape)
        return x[:, s : s + L]

    def mv(name, off, L):
        return fv(msk[name], 0, off, L)

    def mw(m, x):
        return jnp.where(m, x, 0.0)

    def zeros(rows, k):
        return jnp.zeros((rows, k * w), f32)

    gpad = jnp.concatenate(
        [zeros(4 * cp, hb), gp.astype(f32), zeros(4 * cp, hb)], axis=1
    )

    F1o, F1L = 4 * w, n + 4 * w
    if "ut" in stages:
        gs = fv(gpad, 0, F1o, F1L)
    else:
        geo, geL = 4 * w, n + 6 * w
        goo, goL = 3 * w, n + 6 * w
        g_ge = fv(gpad, 0, geo, geL)
        ge = mw(mv("even_row", geo, geL), g_ge)
        g_go = fv(gpad, 0, goo, goL)
        go = g_go - mw(mv("even_row", goo, goL), g_go)
        t1 = 0.75 * ge + 0.25 * mw(mv("grow0", geo, geL), ge)
        t2 = 0.25 * mw(~mv("grow0", geo, geL), ge)
        t3 = 0.75 * go + 0.25 * mw(mv("growlast", goo, goL), go)
        t4 = 0.25 * mw(~mv("growlast", goo, goL), go)
        guw = (
            fv(t1, geo, F1o, F1L)
            + fv(t2, geo, F1o + 2 * w, F1L)
            + fv(t3, goo, F1o + w, F1L)
            + fv(t4, goo, F1o - w, F1L)
        )
        gec = mw(mv("even_col", F1o, F1L), guw)
        goc = guw - gec
        gs = (
            0.75 * gec
            + 0.25 * mw(mv("col0", F1o, F1L), gec)
            + rl(0.25 * mw(~mv("col0", F1o, F1L), gec), 2)
            + rl(0.75 * goc + 0.25 * mw(mv("colw1", F1o, F1L), goc), 1)
            + rl(0.25 * mw(~mv("colw1", F1o, F1L), goc), -1)
        )
        gs = mw(mv("f1_supp", 0, F1L), gs)

    gsw = jnp.concatenate([zeros(4 * cp, 5), gs, zeros(4 * cp, 4)], axis=1)
    gswo = -w
    Fgo, FgL = 2 * w, n + 7 * w
    gd = fv(gsw[:cp], gswo, Fgo, FgL)
    if "st" not in stages:
        gst = gsw[cp:]
        r2m = rl(gst, -2)
        r2p = rl(gst, 2)
        Fco, FcL = 0, n + 11 * w
        c0 = jnp.where(
            mv("col_lt2", Fco, FcL),
            fv(r2m, gswo, Fco + w, FcL),
            fv(r2m, gswo, Fco, FcL),
        )
        c2 = jnp.where(
            mv("col_gew2", Fco, FcL),
            fv(r2p, gswo, Fco - w, FcL),
            fv(r2p, gswo, Fco, FcL),
        )
        c1 = fv(gst, gswo, Fco, FcL)
        for bi, K in ((0, SOBEL_X_F), (1, SOBEL_Y_F), (2, LAPLACIAN_F)):
            for di in range(3):
                for dj, cl in ((0, c0), (1, c1), (2, c2)):
                    co = K[di][dj]
                    if co:
                        gd = gd + float(co) * fv(
                            cl[bi * cp : (bi + 1) * cp], Fco,
                            Fgo + 2 * (di - 1) * w, FgL,
                        )

    Ao, AL = 2 * w, n + 8 * w
    if "dt" in stages:
        gdw = jnp.concatenate([zeros(cp, 2), gd, zeros(cp, 1)], axis=1)
        gx1 = fv(gdw, 0, Ao, AL)
    else:
        gdw = jnp.concatenate([zeros(cp, 2), gd, zeros(cp, 1)], axis=1)
        gdm1 = rl(gdw, -1)
        gx1 = 0.25 * (
            fv(gdw, 0, Ao, AL) + fv(gdm1, 0, Ao, AL)
            + fv(gdw, 0, Ao - w, AL) + fv(gdm1, 0, Ao - w, AL)
        )

    gx0 = fv(gpad[:cp], 0, Ao, AL)
    if "sc0" not in stages:
        gbs = gpad[cp:]
        r1p = rl(gbs, 1)
        r1m = rl(gbs, -1)
        Fqo, FqL = w, n + 10 * w
        q0 = jnp.where(
            mv("colw1", Fqo, FqL),
            fv(r1p, 0, Fqo - w, FqL),
            fv(r1p, 0, Fqo, FqL),
        )
        q2 = jnp.where(
            mv("col0", Fqo, FqL),
            fv(r1m, 0, Fqo + w, FqL),
            fv(r1m, 0, Fqo, FqL),
        )
        q1 = fv(gbs, 0, Fqo, FqL)
        for bi, K in ((0, SOBEL_X), (1, SOBEL_Y), (2, LAPLACIAN)):
            for di in range(3):
                for dj, q in ((0, q0), (1, q1), (2, q2)):
                    co = K[2 - di][dj]
                    if co:
                        gx0 = gx0 + float(co) * fv(
                            q[bi * cp : (bi + 1) * cp], Fqo,
                            Ao + (di - 1) * w, AL,
                        )

    return 0.5 * (gx0 + gx1)


VARIANTS = {
    "base": lambda gp, msk, cp, n, w: _flat_percept_ms_adj(gp, msk, cp, n, w),
    "fmul": _adj_fmul,
    "stage_full": _adj_stage,  # sanity: == base timing
    "no_ut": functools.partial(_adj_stage, stages=frozenset({"ut"})),
    "no_st": functools.partial(_adj_stage, stages=frozenset({"st"})),
    "no_dt": functools.partial(_adj_stage, stages=frozenset({"dt"})),
    "no_sc0": functools.partial(_adj_stage, stages=frozenset({"sc0"})),
    "noroll": functools.partial(_adj_stage, stages=frozenset({"noroll"})),
    "skeleton": functools.partial(
        _adj_stage, stages=frozenset({"ut", "st", "dt", "sc0"})),
    # harness floor: one broadcast output, no concats
    "h_floor": lambda gp, msk, cp, n, w: (
        jnp.zeros((cp, n + 8 * w), jnp.float32) + gp[0:cp, 0:1] * 1e-20
    ),
    # one zero-pad concat + a view of it
    "h_pad1": lambda gp, msk, cp, n, w: jnp.concatenate(
        [jnp.zeros((cp, 4 * w), jnp.float32), gp[:cp],
         jnp.zeros((cp, 4 * w), jnp.float32)], axis=1),
}


def make_runner(name, cp, n, w, h, K, interpret):
    adj = VARIANTS[name]

    def kernel(gp_ref, out_ref):
        msk = _ms_masks(n, w, 0, h)
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, acc):
            gp = gp_ref[:] * (1.0 + 1e-9 * i.astype(jnp.float32))
            a = adj(gp, msk, cp, n, w)
            out_ref[:] += a
            return acc

        jax.lax.fori_loop(0, K, body, 0)

    nb = n + 2 * _MS_HALO * w
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cp, n + 8 * w), jnp.float32),
        interpret=interpret,
    )


def main():
    import os

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
    except Exception:
        pass
    cp, w, h = 16, 256, 256
    tile_rows = 8
    n = tile_rows * w
    gp = jax.random.uniform(jax.random.PRNGKey(0), (4 * cp, n)) - 0.5

    # correctness: every variant == base (interpret on CPU, tiny K)
    if CPU:
        outs = {}
        for name in ("base", "fmul", "stage_full"):
            outs[name] = np.asarray(make_runner(name, cp, n, w, h, 2, True)(gp))
        for name, o in outs.items():
            err = np.abs(o - outs["base"]).max()
            print(f"{name}: max|err| vs base = {err:.2e}", flush=True)
            assert err < 1e-4, name
        print("interpret equality OK")
        return

    print("backend:", jax.default_backend(), flush=True)
    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones(())))
    K = 2048
    for name in VARIANTS:
        fn = jax.jit(make_runner(name, cp, n, w, h, K, False))
        np.asarray(fn(gp))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(gp)[0, 0])
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{name}: {1000*t:.2f} ms / {K} calls = "
              f"{1e6*t/K:.2f} us/call", flush=True)


if __name__ == "__main__":
    main()
