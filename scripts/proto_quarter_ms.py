"""PROTOTYPE: quarter-split (parity-dense) layout for the ms NCA step.

The anchor-lane ms percept (ops/pallas_step._flat_percept_ms) computes the
scale-1 stages at FULL resolution with 3/4 garbage lanes (only even-row/
even-col anchors matter). This prototype stores state in a quarter layout

    p' = q * (hw/4) + (r//2) * (w/2) + (c//2),   q = 2*(r%2) + (c%2)

so anchors are DENSE: the scale-1 down/stencil/up stages run on [*, hw/4]
arrays (4x volume cut) and the scale-0 stencil becomes 4 region passes of
cross-region views + single-lane roll classes. Requires w/2 % 128 == 0
(so all region/row views stay lane-tile aligned) — i.e. w >= 256.

Validates one full NCA step (update_rate=1.0, conditioning None) against
the XLA dynca_step, then A/Bs 64-step loops against an anchor-lane
whole-grid kernel at the same shape. Round-4 design evidence only — not
wired into the library.
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.ops.filters import LAPLACIAN, SOBEL_X, SOBEL_Y
from vsnca_tpu.ops.pallas_step import (
    _flat_percept,
    _flat_percept_ms,
    _ms_masks,
    _round8,
    _stencil_from,
)

H, W = 32, 256
CFG = NCAConfig(c_in=16, fc_dim=128, padding_mode="circular",
                conditioning=None, perception_scales=(0, 1),
                update_rate=1.0)
CP = _round8(CFG.c_in)
HW = H * W
Q = HW // 4
WW = W // 2
HH = H // 2
F = CFG.fc_dim
P = 4 * CP


# ---------------------------------------------------------------- layout
def to_quarter(x_nhwc):
    """[1, H, W, C] -> [CP, HW] quarter layout (host-side, np)."""
    x = np.zeros((CP, HW), np.float32)
    a = np.transpose(np.asarray(x_nhwc)[0], (2, 0, 1))  # [C, H, W]
    for q, (qr, qc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        blk = a[:, qr::2, qc::2].reshape(a.shape[0], Q)
        x[: a.shape[0], q * Q : (q + 1) * Q] = blk
    return jnp.asarray(x)


def from_quarter(xq):
    """[CP, HW] quarter layout -> [1, H, W, C]."""
    a = np.zeros((CP, H, W), np.float32)
    xq = np.asarray(xq)
    for q, (qr, qc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        a[:, qr::2, qc::2] = xq[:, q * Q : (q + 1) * Q].reshape(CP, HH, WW)
    return jnp.asarray(a[: CFG.c_in])[None].transpose(0, 2, 3, 1)


def to_flat(x_nhwc):
    """[1, H, W, C] -> [CP, HW] row-major flat layout."""
    x = np.zeros((CP, HW), np.float32)
    a = np.transpose(np.asarray(x_nhwc)[0], (2, 0, 1)).reshape(-1, HW)
    x[: a.shape[0]] = a
    return jnp.asarray(x)


def from_flat(xf):
    a = np.asarray(xf)[: CFG.c_in].reshape(-1, H, W)
    return jnp.asarray(a)[None].transpose(0, 2, 3, 1)


# ------------------------------------------------- quarter-layout percept
def _lcls(R, b0, bw1):
    """L[a,b] = R[a, b-1] circular in b (region array [*, Q])."""
    r = pltpu.roll(R, 1, axis=1)
    fix = pltpu.roll(r, Q - WW, axis=1)  # fix[p] = R[p + ww - 1]
    return jnp.where(b0, fix, r)


def _rcls(R, b0, bw1):
    """R'[a,b] = R[a, b+1] circular in b."""
    r = pltpu.roll(R, Q - 1, axis=1)
    fix = pltpu.roll(r, WW, axis=1)  # fix[p] = R[p - ww + 1]
    return jnp.where(bw1, fix, r)


def _band(R):
    """Circular H-halo band [*, Q + 2ww]: rows a-1 .. hh."""
    return jnp.concatenate([R[:, Q - WW :], R, R[:, :WW]], axis=1)


def _bv(band, s):
    """View at row offset s in {-1, 0, +1} of an H-band."""
    return band[:, WW + s * WW : WW + s * WW + Q]


def _band_clamp(R):
    """Edge-clamp H band (upsample uses clamp, not wrap)."""
    return jnp.concatenate([R[:, :WW], R, R[:, Q - WW :]], axis=1)


def quarter_percept(x, b0, bw1):
    """x [CP, HW] quarter layout -> percept [4CP, HW] quarter layout,
    perception_scales (0, 1), circular padding."""
    EE, EO, OE, OO = (x[:, i * Q : (i + 1) * Q] for i in range(4))
    EOL, OOL = _lcls(EO, b0, bw1), _lcls(OO, b0, bw1)
    EER, OER = _rcls(EE, b0, bw1), _rcls(OE, b0, bw1)

    bands = {k: _band(v) for k, v in (
        ("EE", EE), ("EO", EO), ("OE", OE), ("OO", OO),
        ("EOL", EOL), ("OOL", OOL), ("EER", EER), ("OER", OER),
    )}

    def g(name, s=0):
        return _bv(bands[name], s) if s else dict(
            EE=EE, EO=EO, OE=OE, OO=OO, EOL=EOL, OOL=OOL, EER=EER, OER=OER
        )[name]

    # scale-0 stencil taps per region: nb(di, dj) with di,dj in 0..2
    # (row -1/0/+1, col -1/0/+1), from the quarter-layout neighbor map.
    TAPS = {
        "EE": [[("OOL", -1), ("OE", -1), ("OO", -1)],
               [("EOL", 0), ("EE", 0), ("EO", 0)],
               [("OOL", 0), ("OE", 0), ("OO", 0)]],
        "EO": [[("OE", -1), ("OO", -1), ("OER", -1)],
               [("EE", 0), ("EO", 0), ("EER", 0)],
               [("OE", 0), ("OO", 0), ("OER", 0)]],
        "OE": [[("EOL", 0), ("EE", 0), ("EO", 0)],
               [("OOL", 0), ("OE", 0), ("OO", 0)],
               [("EOL", 1), ("EE", 1), ("EO", 1)]],
        "OO": [[("EE", 0), ("EO", 0), ("EER", 0)],
               [("OE", 0), ("OO", 0), ("OER", 0)],
               [("EE", 1), ("EO", 1), ("EER", 1)]],
    }

    def scale0(region):
        taps = TAPS[region]

        def nb(di, dj):
            name, s = taps[di][dj]
            return g(name, s)

        return [nb(1, 1), _stencil_from(nb, SOBEL_X),
                _stencil_from(nb, SOBEL_Y), _stencil_from(nb, LAPLACIAN)]

    s0 = {r: scale0(r) for r in ("EE", "EO", "OE", "OO")}

    # ---- scale 1: dense half grid ----
    d = 0.25 * (EE + EO + OE + OO)  # [CP, Q], the exact 2x2 anchor average
    band_d = jnp.concatenate([d[:, Q - WW :], d, d[:, :WW]], axis=1)
    sb0 = jax.lax.broadcasted_iota(jnp.int32, (1, Q + 2 * WW), 1) % WW
    _, p_half = _flat_percept(
        band_d, None, Q, WW, "circular", jnp.float32,
        sb0 == 0, sb0 == WW - 1,
    )  # [4CP, Q]: (d, sx, sy, lap) dense at half res

    # upsample (align_corners=False, edge clamp), all 4 blocks at once
    s = p_half
    sL = jnp.where(b0, s, pltpu.roll(s, 1, axis=1))
    sR = jnp.where(bw1, s, pltpu.roll(s, Q - 1, axis=1))
    W0 = 0.75 * s + 0.25 * sL
    W1 = 0.75 * s + 0.25 * sR
    bW0, bW1 = _band_clamp(W0), _band_clamp(W1)
    u = {
        "EE": 0.75 * W0 + 0.25 * _bv(bW0, -1),
        "EO": 0.75 * W1 + 0.25 * _bv(bW1, -1),
        "OE": 0.75 * W0 + 0.25 * _bv(bW0, 1),
        "OO": 0.75 * W1 + 0.25 * _bv(bW1, 1),
    }

    # percept = 0.5 * (scale0 + upsampled scale1), assembled region-major
    outs = []
    for qi, r in enumerate(("EE", "EO", "OE", "OO")):
        blocks = jnp.concatenate(s0[r], axis=0)  # [4CP, Q]
        outs.append(0.5 * (blocks + u[r]))
    # lanes concat in region order -> [4CP, HW] quarter layout
    return jnp.concatenate(outs, axis=1)


# ------------------------------------------------------------ kernels
def make_quarter_percept_only(n_steps):
    """Percept-only loop: isolates the percept cost (no MLP; state evolves
    by a small multiple of the folded percept so nothing is DCE'd)."""
    def kernel(x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref, st_ref):
        st_ref[0] = x_ref[:]
        b0 = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1) % WW == 0
        bw1 = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1) % WW == WW - 1

        def step(i, c):
            x = st_ref[jnp.mod(i, 2)]
            pct = quarter_percept(x, b0, bw1)
            acc = (pct[:CP] + pct[CP : 2 * CP] + pct[2 * CP : 3 * CP]
                   + pct[3 * CP :])
            st_ref[jnp.mod(i + 1, 2)] = x + 1e-4 * acc
            return c

        jax.lax.fori_loop(0, n_steps, step, 0)
        o_ref[:] = st_ref[jnp.mod(n_steps, 2)]

    return kernel


def make_anchor_percept_only(n_steps):
    hb = 6

    def kernel(x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref, st_ref):
        st_ref[0] = x_ref[:]
        msk = _ms_masks(HW, W, 0, H)

        def step(i, c):
            x = st_ref[jnp.mod(i, 2)]
            band = jnp.concatenate(
                [x[:, HW - hb * W :], x, x[:, : hb * W]], axis=1)
            _, pct = _flat_percept_ms(band, None, HW, W, jnp.float32, msk)
            acc = (pct[:CP] + pct[CP : 2 * CP] + pct[2 * CP : 3 * CP]
                   + pct[3 * CP :])
            st_ref[jnp.mod(i + 1, 2)] = x + 1e-4 * acc
            return c

        jax.lax.fori_loop(0, n_steps, step, 0)
        o_ref[:] = st_ref[jnp.mod(n_steps, 2)]

    return kernel


def make_quarter_kernel(n_steps):
    def kernel(x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref, st_ref):
        st_ref[0] = x_ref[:]
        b0 = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1) % WW == 0
        bw1 = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1) % WW == WW - 1

        def step(i, c):
            # double-buffered Jacobi like the production kernels (an
            # in-place read+write state serializes on the RAW hazard)
            x = st_ref[jnp.mod(i, 2)]
            pct = quarter_percept(x, b0, bw1)
            hid = jnp.maximum(
                jnp.dot(w1t_ref[:], pct,
                        preferred_element_type=jnp.float32)
                + b1_ref[:].reshape(F, 1), 0.0)
            dx = jnp.dot(w2t_ref[:], hid,
                         preferred_element_type=jnp.float32) \
                + b2_ref[:].reshape(CP, 1)
            st_ref[jnp.mod(i + 1, 2)] = x + dx  # update_rate=1.0: mask == 1
            return c

        jax.lax.fori_loop(0, n_steps, step, 0)
        o_ref[:] = st_ref[jnp.mod(n_steps, 2)]

    return kernel


def make_anchor_kernel(n_steps):
    hb = 6

    def kernel(x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref, st_ref):
        st_ref[0] = x_ref[:]
        msk = _ms_masks(HW, W, 0, H)

        def step(i, c):
            x = st_ref[jnp.mod(i, 2)]
            band = jnp.concatenate(
                [x[:, HW - hb * W :], x, x[:, : hb * W]], axis=1)
            _, pct = _flat_percept_ms(band, None, HW, W, jnp.float32, msk)
            hid = jnp.maximum(
                jnp.dot(w1t_ref[:], pct,
                        preferred_element_type=jnp.float32)
                + b1_ref[:].reshape(F, 1), 0.0)
            dx = jnp.dot(w2t_ref[:], hid,
                         preferred_element_type=jnp.float32) \
                + b2_ref[:].reshape(CP, 1)
            st_ref[jnp.mod(i + 1, 2)] = x + dx
            return c

        jax.lax.fori_loop(0, n_steps, step, 0)
        o_ref[:] = st_ref[jnp.mod(n_steps, 2)]

    return kernel


def build_kernel(make, params, n_steps, interpret=False):
    """Returns a jitted x -> state-after-n_steps callable (built once)."""
    w1 = np.zeros((P, F), np.float32)
    w1_np = np.asarray(params["w1"])  # [4c, F]
    c = CFG.c_in
    for k in range(4):
        w1[k * CP : k * CP + c] = w1_np[k * c : (k + 1) * c]
    w1t = jnp.asarray(w1.T)
    w2 = np.zeros((F, CP), np.float32)
    w2[:, :c] = np.asarray(params["w2"])
    w2t = jnp.asarray(w2.T)
    b1 = jnp.asarray(np.asarray(params["b1"]).reshape(1, F))
    b2 = np.zeros((1, CP), np.float32)
    b2[0, :c] = np.asarray(params["b2"])
    b2 = jnp.asarray(b2)

    with jax.default_matmul_precision("default"):
        fn = pl.pallas_call(
            make(n_steps),
            out_shape=jax.ShapeDtypeStruct((CP, HW), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, CP, HW), jnp.float32)],
            interpret=interpret,
        )
        return jax.jit(lambda x: fn(x, w1t, b1, w2t, b2))


def fetch(x):
    return np.asarray(jax.device_get(x)).ravel()[0]


def main():
    interpret = os.environ.get("PROTO_INTERPRET", "") == "1"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    else:
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.expanduser("~/.cache/vsnca_jax"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              5.0)
        except Exception:
            pass
    print("backend:", jax.default_backend(), "interpret:", interpret,
          flush=True)

    from vsnca_tpu.models.dynca import dynca_init, dynca_step

    params = dynca_init(jax.random.PRNGKey(0), CFG)
    x_nhwc = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, CFG.c_in),
                                jnp.float32) - 0.5

    # ---- 1-step parity vs XLA ----
    with jax.default_matmul_precision("default"):
        ref = dynca_step(params, x_nhwc, jax.random.PRNGKey(2), CFG)

    fq1 = build_kernel(make_quarter_kernel, params, 1, interpret)
    got_q = from_quarter(fq1(to_quarter(x_nhwc)))
    dq = np.abs(np.asarray(got_q) - np.asarray(ref))
    print(f"quarter 1-step vs XLA: mean {dq.mean():.3e} max {dq.max():.3e}",
          flush=True)

    fa1 = build_kernel(make_anchor_kernel, params, 1, interpret)
    got_a = from_flat(fa1(to_flat(x_nhwc)))
    da = np.abs(np.asarray(got_a) - np.asarray(ref))
    print(f"anchor  1-step vs XLA: mean {da.mean():.3e} max {da.max():.3e}",
          flush=True)
    assert dq.mean() < 1e-6 and dq.max() < 1e-3, "quarter layout WRONG"

    if interpret:
        print("interpret validation done", flush=True)
        return

    # ---- 64-step A/B (one dispatch each, min-of-3) ----
    for name, make, conv in (("anchor", make_anchor_kernel, to_flat),
                             ("quarter", make_quarter_kernel, to_quarter),
                             ("anchor-percept", make_anchor_percept_only,
                              to_flat),
                             ("quarter-percept", make_quarter_percept_only,
                              to_quarter)):
        xq = conv(x_nhwc)
        f64 = build_kernel(make, params, 64)
        fetch(f64(xq))  # compile+warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(f64(xq))
            dt = (time.perf_counter() - t0) / 64
            best = dt if best is None else min(best, dt)
        print(f"{name}: {1e3*best:.4f} ms/step ({H}x{W} c{CFG.c_in} ms)",
              flush=True)


if __name__ == "__main__":
    main()
