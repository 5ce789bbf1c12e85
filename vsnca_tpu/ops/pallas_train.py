"""Differentiable fused NCA rollout: custom-VJP Pallas kernels for training.

This is the north-star training path (BASELINE.json: "a single fused Pallas
kernel rolled out under lax.scan with rematerialized backprop-through-time"):

- FORWARD: the double-buffered Jacobi roll kernel (see
  ``pallas_step._make_kernel_roll``) with two changes: the PRNG is re-seeded
  per step from ``hash(seed, batch, step)`` so the backward pass can
  regenerate every stochastic mask bit-exactly, and the state is DMA'd out
  to an HBM checkpoint buffer every SEGMENT steps (K-step segment
  checkpointing). State stays VMEM-resident for the whole rollout.

- BACKWARD (remat-in-kernel): walks segments in REVERSE; per segment it
  DMAs the checkpoint in, recomputes the K intermediate states and masks
  into VMEM scratch (bit-exact: same tile order, same per-step seeds), then
  runs backprop-through-time over the segment with two tile passes per
  step: (1) recompute percept/hidden, form the MLP gradients and the
  perception cotangent gp, accumulating dW/db (and the conditioning
  cotangent); (2) apply the ADJOINT perception stencil — correlation with
  the 180°-flipped filters under circular wrap (Sobel flips to its
  negation; the Laplacian is symmetric) — to update dL/dx in place. No
  percept/hidden tensor ever touches HBM, which is exactly the traffic the
  XLA remat backward pays per step.

Scope (auto-fallback to the XLA path otherwise, see
``fused_train_supported``): padding_mode='circular' (all training presets),
perception_scales=(0,), W % 128 == 0, grid + scratch within the VMEM budget.

Reference hot loop being accelerated: ConditioneDyNCA/experiments.py:226
(forward_nsteps under BPTT, models/dynca.py:117-133).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.ops.filters import LAPLACIAN, SOBEL_X, SOBEL_Y
from vsnca_tpu.ops.pallas_step import (
    _LANE,
    _MS_HALO,
    _draw_mask,
    _draw_mask_flat,
    _flat_neighbors,
    _flat_pad_weights,
    _flat_percept,
    _flat_percept_ms,
    _flat_tile_update,
    _flat_tile_update_ms,
    _ms_masks_base,
    _ms_masks_tile,
    _mlp_dx,
    _pick_tile_h,
    _pick_tile_rows,
    _round8,
    _round_up,
    _stencil_from,
    _uniform_threshold,
)


def _flip(k):
    """180° filter rotation: the adjoint of correlation is correlation with
    the flipped kernel."""
    return [[k[2 - i][2 - j] for j in range(3)] for i in range(3)]


SOBEL_X_F = _flip(SOBEL_X)
SOBEL_Y_F = _flip(SOBEL_Y)
LAPLACIAN_F = _flip(LAPLACIAN)

_HASH_B = 1000003
_HASH_S = 7919


def _step_seed(seed0, bidx, step):
    return seed0 + bidx * jnp.int32(_HASH_B) + step * jnp.int32(_HASH_S)


def _flat_band_circ(buf_slice, t: int, n: int, w: int, hw: int,
                    n_tiles: int, hb: int = 1):
    """Flat circular band [*, n + 2*hb*w] (hb-row halos) over a [*, hw]
    value-slice fn — THE shared halo/wrap builder for the flat train
    kernels (fwd + both backwards). Interior tiles are pure aligned views;
    the first/last tiles wrap hb rows (requires hb*w <= n for interior
    tiles not to straddle both ends, i.e. tile_rows >= hb)."""
    o = t * n
    parts = []
    lo = o - hb * w
    if t == 0:
        parts.append(buf_slice(hw - hb * w, hw))
        lo = 0
    if t == n_tiles - 1:
        parts.append(buf_slice(lo, hw))
        parts.append(buf_slice(0, hb * w))
    else:
        parts.append(buf_slice(lo, o + n + hb * w))
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=1)


def _flat_recompute_segment(
    s, segment, n_tiles, n, seed_ref, bidx, states_ref, tile_percept,
    w1t_ref, b1_ref, w2t_ref, b2_ref, f, cp, thr, compute_dtype,
):
    """states[k] = x_{sK+k} for k in [1, segment): rebuild a segment's
    intermediate states from its checkpoint, replaying the forward's
    per-step seeds and tile order bit-exactly. The segment's LAST step
    needs no recompute here (backward_step reseeds and regenerates its own
    percept/masks), so the loop runs segment-1 iterations."""
    if segment == 1:
        return

    def one_k(k, carry):
        pltpu.prng_seed(_step_seed(seed_ref[0], bidx, s * segment + k))
        for t in range(n_tiles):
            o = t * n
            center, percept = tile_percept(k, t)
            mask = _draw_mask_flat(n, thr)
            hid = jnp.maximum(
                jnp.dot(w1t_ref[:], percept,
                        preferred_element_type=jnp.float32)
                + b1_ref[:].reshape(f, 1),
                0.0,
            ).astype(compute_dtype)
            dx = (
                jnp.dot(w2t_ref[:], hid, preferred_element_type=jnp.float32)
                + b2_ref[:].reshape(cp, 1)
            )
            states_ref[k + 1, :, o : o + n] = center + dx * mask
        return carry

    jax.lax.fori_loop(0, segment - 1, one_k, 0)


def _band_rows_circ(src_sl, lo: int, hi: int, rows: int):
    """Rows lo-1 .. hi (+1 halo each side) of a [C, rows, W] slice fn under
    circular wrap. lo/hi are static."""
    a, b = lo - 1, hi + 1
    if a >= 0 and b <= rows:
        return src_sl(a, b)
    parts = []
    if a < 0:
        parts.append(src_sl(rows - 1, rows))
        a = 0
    parts.append(src_sl(a, min(b, rows)))
    if b > rows:
        parts.append(src_sl(0, 1))
    return jnp.concatenate(parts, axis=1)


def _stencil_bands(band, w: int):
    """(left, band, right) lane-rolled views for 3x3 stencils, circular."""
    left = pltpu.roll(band, 1, axis=2)
    right = pltpu.roll(band, w - 1, axis=2)
    return left, band, right


def _tiled_band(tile_slice, t, n_tiles: int, tile_rows: int, w: int,
                hb: int):
    """[*, n + 2*hb*w] circular band around tile t of a TILED buffer.
    ``tile_slice(idx, lo, hi)`` returns rows [lo, hi) of tile ``idx`` as
    lanes (idx may be traced; lo/hi are static). hb may exceed tile_rows —
    the halo then spans ceil(hb/tile_rows) neighbor tiles per side
    (requires n_tiles >= 2*ceil(hb/tile_rows) + 1 when it does)."""
    m = -(-hb // tile_rows)
    lead = hb - (m - 1) * tile_rows
    parts = [tile_slice((t - m) % n_tiles, tile_rows - lead, tile_rows)]
    for j in range(m - 1, 0, -1):
        parts.append(tile_slice((t - j) % n_tiles, 0, tile_rows))
    parts.append(tile_slice(t, 0, tile_rows))
    for j in range(1, m):
        parts.append(tile_slice((t + j) % n_tiles, 0, tile_rows))
    parts.append(tile_slice((t + m) % n_tiles, 0, lead))
    return jnp.concatenate(parts, axis=1)


def _flat_percept_ms_adj(gp, msk, cp: int, n: int, w: int,
                         stages: frozenset = frozenset()):
    """State cotangent of ``_flat_percept_ms``'s percept: from gp [4cp, n]
    (cotangent of the 4 stencil blocks at tile-interior positions) produce
    the band [cp, n + 8w] of contributions to x at global rows
    [t0-4, t0+tile_rows+4). ``msk`` is the SAME _ms_masks(n, w, t0, h)
    bundle the percept uses.

    Mechanical transpose of the forward chain (down -> half-res stencils ->
    up, plus the scale-0 stencils, averaged 0.5), in the VIEW-BASED form
    that made the forward percept fast (docs/ROUND3.md): every
    row-multiple shift is a framed VIEW of a zero-embedded buffer and only
    the 8 irreducible +-1/+-2 LANE shifts are pltpu.roll calls (~58 in the
    r3a roll-chain form, git history). Frames are (offset, length) windows
    of the band frame [0, nb); all offsets are multiples of w (lane-tile
    aligned for w % 128 == 0). Circular-roll wrap garbage either reads the
    6w-wide zero pads (exact) or lands in the one support-free tail that
    ``f1_supp`` re-zeroes; every downstream view was checked against frame
    edges (trace-time asserts). Masks are always viewed at the ABSOLUTE
    window of the array they gate, which preserves the transpose's
    mask-at-source semantics. Blocks ride ONE [4cp, *] chain through U^T
    (the per-block form re-ran it 4x).

    ``stages`` (PROFILING ONLY — outputs become wrong): stub one transpose
    stage for in-kernel marginal timing, members 'ut' (U^T ladder), 'st'
    (half-res stencil transpose), 'dt' (D^T), 'sc0' (scale-0 transpose).

    MEASURED NEGATIVE (r4, do not retry): replacing the two zero-pad
    concats (gpad/gsw below) with persistent VMEM scratch refs whose pads
    are zeroed once in the kernel prologue — per call only the support
    center stored, every view a ref load — made the 64-step 256²-ms
    backward ~9 ms SLOWER (72.7 -> 81.4 ms; adj share 32.9 -> 42.0,
    /tmp/ablate_hw3 vs hw5, scripts/profile_bwd_ablate.py). Value concats
    stay in Mosaic's register/stack world where slices fold into
    consumers; ref slice reads are real VMEM round-trips on every view.
    The stage probes bound the remaining win: the four transpose stages
    total ~14.7 ms of the 32.9 ms adjoint; the ~18 ms skeleton is the
    concat materializations themselves, and the scratch-ref form pays
    MORE, not less."""
    hb = _MS_HALO
    nb = n + 2 * hb * w
    f32 = jnp.float32

    def rl(x, k):
        """out[p] = x[p + k] on x's own frame (lane |k| <= 2; the wrapped
        edge lanes are handled per the frame analysis above)."""
        L = x.shape[-1]
        return pltpu.roll(x, (L - k) % L, axis=1)

    def fv(x, x_off, off, L):
        """View of frame-(x_off) array x at band window [off, off+L)."""
        s = off - x_off
        assert 0 <= s and s + L <= x.shape[-1], (s, L, x.shape)
        return x[:, s : s + L]

    def mv(name, off, L):
        return fv(msk[name], 0, off, L)

    def mw(m, x):
        return jnp.where(m, x, 0.0)

    def zeros(rows, k):
        return jnp.zeros((rows, k * w), f32)

    # gp zero-embedded on the full band frame (0, nb), all 4 blocks.
    gpad = jnp.concatenate(
        [zeros(4 * cp, hb), gp.astype(f32), zeros(4 * cp, hb)], axis=1
    )

    def gv(r0, r1, off, L):
        return gpad[r0:r1, off : off + L]

    # ---- U_H^T (row part; pure views) ---------------------------------
    # guw[a] = 0.75 ge[a] + 0.25[grow0 a] ge[a] + 0.25[~grow0 a+2w] ge[a+2w]
    #        + (0.75 + 0.25[growlast a+w]) go[a+w] + 0.25[~growlast a-w] go[a-w]
    F1o, F1L = 4 * w, n + 4 * w          # guw/gs frame
    if "ut" in stages:
        gs = gv(0, 4 * cp, F1o, F1L)
    else:
        geo, geL = 4 * w, n + 6 * w          # ge window [4w, n+10w)
        goo, goL = 3 * w, n + 6 * w          # go window [3w, n+9w)
        g_ge = gv(0, 4 * cp, geo, geL)
        ge = mw(mv("even_row", geo, geL), g_ge)
        g_go = gv(0, 4 * cp, goo, goL)
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

        # ---- U_W^T (lane part; 3 rolls on the wide [4cp, n+4w] chain) --
        gec = mw(mv("even_col", F1o, F1L), guw)
        goc = guw - gec
        gs = (
            0.75 * gec
            + 0.25 * mw(mv("col0", F1o, F1L), gec)
            + rl(0.25 * mw(~mv("col0", F1o, F1L), gec), 2)
            + rl(0.75 * goc + 0.25 * mw(mv("colw1", F1o, F1L), goc), 1)
            + rl(0.25 * mw(~mv("colw1", F1o, F1L), goc), -1)
        )
        # The +1/+2 rolls wrap gs's leading lanes into the support-free
        # tail [n+7w, n+8w) — re-zero it (exact: guw's support ends at
        # n+7w).
        gs = mw(mv("f1_supp", 0, F1L), gs)

    # Widen for the class/stencil/raw views below (pads are exact zeros:
    # gs's support lives in [4w, n+7w)). Frame (-w, n+13w) is the minimal
    # cover of every class/stencil view (bounds asserted below); at
    # tile_rows=8 the tighter frame is what keeps the tile body under the
    # 16 MB scoped-vmem limit.
    gswo = -w
    gsw = jnp.concatenate(
        [zeros(4 * cp, 5), gs, zeros(4 * cp, 4)], axis=1
    )  # frame (-w, n+13w)

    def sv(r0, r1, off, L):
        s = off - gswo
        return gsw[r0:r1, s : s + L]

    # ---- S^T as a forward-style stencil: flipped kernel over classes ---
    # gd[x] = raw[x] + sum_{di,dj} Kf[di][dj] * cl_dj[x + 2(di-1)w], with
    # cl_0/cl_2 the -2/+2 lane classes under the half-res W-wrap (the
    # transpose of the forward's m0/m2 tap classes).
    Fgo, FgL = 2 * w, n + 7 * w  # gd frame (support-exact: [2w, n+9w))
    gd = sv(0, cp, Fgo, FgL)  # raw block
    if "st" not in stages:
        gst = sv(cp, 4 * cp, gswo, n + 13 * w)  # stencil blocks, frame gswo
        r2m = rl(gst, -2)   # r2m[p] = gst[p-2]
        r2p = rl(gst, 2)    # r2p[p] = gst[p+2]
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

    # ---- D^T ----------------------------------------------------------
    gdw = jnp.concatenate([zeros(cp, 2), gd, zeros(cp, 1)], axis=1)
    Ao, AL = 2 * w, n + 8 * w  # output band frame
    if "dt" in stages:
        gx1 = fv(gdw, 0, Ao, AL)
    else:
        gdm1 = rl(gdw, -1)  # gdm1[p] = gd[p-1]
        gx1 = 0.25 * (
            fv(gdw, 0, Ao, AL) + fv(gdm1, 0, Ao, AL)
            + fv(gdw, 0, Ao - w, AL) + fv(gdm1, 0, Ao - w, AL)
        )

    # ---- scale-0 transpose (shared q-classes, flipped-row coefficients) -
    # gx0[x] = raw[x] + sum_{di,dj} K[2-di][dj] * q_dj[x + (di-1)w];
    # q0[p] = colw1(p) ? gb[p+1-w] : gb[p+1],
    # q2[p] = col0(p)  ? gb[p-1+w] : gb[p-1]   (full-res W-wrap).
    gx0 = gv(0, cp, Ao, AL)  # raw block
    if "sc0" not in stages:
        gbs = gv(cp, 4 * cp, 0, nb)  # [3cp, nb]
        r1p = rl(gbs, 1)    # r1p[p] = gbs[p+1]
        r1m = rl(gbs, -1)   # r1m[p] = gbs[p-1]
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


def _make_fwd_kernel(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    segment: int,
    tile_h: int,
    has_cond: bool,
    compute_dtype,
):
    c = cfg.c_in
    cc = cfg.c_cond if has_cond else 0
    p_dim = 4 * c + cc
    f = cfg.fc_dim
    thr = _uniform_threshold(cfg.update_rate)
    n_tiles = h // tile_h
    assert cfg.padding_mode == "circular"

    def kernel(seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, *rest):
        if has_cond:
            cond_ref, out_ref, ckpt_ref, alt_ref, dma_sem = rest
        else:
            out_ref, ckpt_ref, alt_ref, dma_sem = rest
            cond_ref = None

        bidx = pl.program_id(0)

        load = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[0], dma_sem)
        load.start()
        load.wait()

        def run_step(src, dst):
            for t in range(n_tiles):
                r0 = t * tile_h
                band = _band_rows_circ(
                    lambda a, b: src[0, :, a:b, :], r0, r0 + tile_h, h
                )
                left, _, right = _stencil_bands(band, w)

                def nb(di, dj):
                    arr = (left, band, right)[dj]
                    return arr[:, di : di + tile_h, :]

                center = band[:, 1 : 1 + tile_h, :]
                parts = [
                    center,
                    _stencil_from(nb, SOBEL_X),
                    _stencil_from(nb, SOBEL_Y),
                    _stencil_from(nb, LAPLACIAN),
                ]
                if cond_ref is not None:
                    parts.append(cond_ref[0, :, r0 : r0 + tile_h, :])
                percept = jnp.concatenate(parts, axis=0)
                percept = percept.reshape(p_dim, tile_h * w).astype(compute_dtype)

                dx = _mlp_dx(percept, w1t_ref, b1_ref, w2t_ref, b2_ref,
                             c, f, tile_h, w, compute_dtype)
                mask = _draw_mask(tile_h, w, thr)
                dst[0, :, r0 : r0 + tile_h, :] = center + dx * mask[None]

        def ckpt_store(src, i):
            dma = pltpu.make_async_copy(
                src.at[0], ckpt_ref.at[bidx, i // segment], dma_sem
            )
            dma.start()
            dma.wait()

        def one_step(i, carry):
            pltpu.prng_seed(_step_seed(seed_ref[0], bidx, i))

            @pl.when(i % 2 == 0)
            def _():
                @pl.when(i % segment == 0)
                def _():
                    ckpt_store(out_ref, i)

                run_step(out_ref, alt_ref)

            @pl.when(i % 2 == 1)
            def _():
                @pl.when(i % segment == 0)
                def _():
                    ckpt_store(alt_ref, i)

                run_step(alt_ref, out_ref)

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)
        if n_steps % 2 == 1:
            out_ref[:] = alt_ref[:]

    return kernel


def _make_bwd_kernel(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    segment: int,
    tile_h: int,
    has_cond: bool,
    compute_dtype,
):
    c = cfg.c_in
    cc = cfg.c_cond if has_cond else 0
    p_dim = 4 * c + cc
    f = cfg.fc_dim
    thr = _uniform_threshold(cfg.update_rate)
    n_tiles = h // tile_h
    n_segments = n_steps // segment
    assert cfg.padding_mode == "circular"

    # contraction over the pixel axis (last dim of both operands)
    dn_nn = (((1,), (1,)), ((), ()))

    def kernel(
        seed_ref, ckpt_ref, g_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
        w1_ref, w2_ref, *rest,
    ):
        if has_cond:
            (cond_ref, dx0_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
             dcond_ref, states_ref, masks_ref, gx_ref, gp_ref, dma_sem) = rest
        else:
            (dx0_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
             states_ref, masks_ref, gx_ref, gp_ref, dma_sem) = rest
            cond_ref = dcond_ref = None

        bidx = pl.program_id(0)

        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)  # bias grads are [1, 1, F]/[1, 1, C]
        if dcond_ref is not None:
            dcond_ref[:] = jnp.zeros_like(dcond_ref)
        gx_ref[:] = g_ref[0]

        def tile_percept(src_k, r0):
            """Recompute the percept tile [P, tile_h*W] from states[src_k]."""
            band = _band_rows_circ(
                lambda a, b: states_ref[src_k, :, a:b, :], r0, r0 + tile_h, h
            )
            left, _, right = _stencil_bands(band, w)

            def nb(di, dj):
                arr = (left, band, right)[dj]
                return arr[:, di : di + tile_h, :]

            center = band[:, 1 : 1 + tile_h, :]
            parts = [
                center,
                _stencil_from(nb, SOBEL_X),
                _stencil_from(nb, SOBEL_Y),
                _stencil_from(nb, LAPLACIAN),
            ]
            if cond_ref is not None:
                parts.append(cond_ref[0, :, r0 : r0 + tile_h, :])
            percept = jnp.concatenate(parts, axis=0)
            return center, percept.reshape(p_dim, tile_h * w).astype(compute_dtype)

        def recompute_segment(s):
            """states[k] = x_{sK+k}, masks[k] = m_{sK+k}; bit-exact replay of
            the forward (same per-step seeds, same tile order). The k loop is
            a fori_loop with dynamic leading-dim indexing — unrolling
            segment x n_tiles tile bodies made the Mosaic program so large
            the (remote) compile took tens of minutes."""

            def one_k(k, carry):
                pltpu.prng_seed(
                    _step_seed(seed_ref[0], bidx, s * segment + k)
                )
                for t in range(n_tiles):
                    r0 = t * tile_h
                    center, percept = tile_percept(k, r0)
                    mask = _draw_mask(tile_h, w, thr)
                    masks_ref[k, r0 : r0 + tile_h, :] = mask

                    @pl.when(k < segment - 1)
                    def _():
                        dx = _mlp_dx(percept, w1t_ref, b1_ref, w2t_ref,
                                     b2_ref, c, f, tile_h, w, compute_dtype)
                        states_ref[k + 1, :, r0 : r0 + tile_h, :] = (
                            center + dx * mask[None]
                        )

                return carry

            jax.lax.fori_loop(0, segment, one_k, 0)

        def backward_step(k):
            # pass 1: MLP cotangents + param grads + gp
            for t in range(n_tiles):
                r0 = t * tile_h
                _, percept = tile_percept(k, r0)
                z1 = (
                    jnp.dot(w1t_ref[:], percept, preferred_element_type=jnp.float32)
                    + b1_ref[:].reshape(f, 1)
                )
                hid = jnp.maximum(z1, 0.0).astype(compute_dtype)
                gdx = (
                    gx_ref[:, r0 : r0 + tile_h, :]
                    * masks_ref[k, r0 : r0 + tile_h, :][None]
                ).reshape(c, tile_h * w).astype(compute_dtype)
                gz1 = jnp.where(
                    z1 > 0.0,
                    jnp.dot(w2_ref[:], gdx, preferred_element_type=jnp.float32),
                    0.0,
                ).astype(compute_dtype)
                gp = jax.lax.dot_general(
                    w1_ref[:], gz1,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [P, n]
                gp_ref[:, r0 : r0 + tile_h, :] = gp[: 4 * c].reshape(
                    4 * c, tile_h, w
                )
                if dcond_ref is not None:
                    dcond_ref[0, :, r0 : r0 + tile_h, :] += gp[4 * c :].reshape(
                        cc, tile_h, w
                    )
                dw1t_ref[0] += jax.lax.dot_general(
                    gz1, percept, dimension_numbers=dn_nn,
                    preferred_element_type=jnp.float32,
                )
                db1_ref[0, 0] += jnp.sum(gz1, axis=1, dtype=jnp.float32)
                dw2t_ref[0] += jax.lax.dot_general(
                    gdx, hid, dimension_numbers=dn_nn,
                    preferred_element_type=jnp.float32,
                )
                db2_ref[0, 0] += jnp.sum(gdx, axis=1, dtype=jnp.float32)

            # pass 2: adjoint perception stencil (flipped kernels, circular)
            for t in range(n_tiles):
                r0 = t * tile_h
                band4 = _band_rows_circ(
                    lambda a, b: gp_ref[:, a:b, :], r0, r0 + tile_h, h
                )
                left4, _, right4 = _stencil_bands(band4, w)

                def nb_g(g):
                    def nb(di, dj):
                        arr = (left4, band4, right4)[dj]
                        return arr[g * c : (g + 1) * c, di : di + tile_h, :]

                    return nb

                adj = (
                    band4[0:c, 1 : 1 + tile_h, :]
                    + _stencil_from(nb_g(1), SOBEL_X_F)
                    + _stencil_from(nb_g(2), SOBEL_Y_F)
                    + _stencil_from(nb_g(3), LAPLACIAN_F)
                )
                gx_ref[:, r0 : r0 + tile_h, :] += adj

        def per_segment(si, carry):
            s = n_segments - 1 - si
            load = pltpu.make_async_copy(
                ckpt_ref.at[bidx, s], states_ref.at[0], dma_sem
            )
            load.start()
            load.wait()
            recompute_segment(s)
            jax.lax.fori_loop(
                0, segment, lambda ki, cc_: backward_step(segment - 1 - ki) or cc_, 0
            )
            return carry

        jax.lax.fori_loop(0, n_segments, per_segment, 0)
        dx0_ref[0] = gx_ref[:]

    return kernel


def bwd_vmem_bytes_estimate(
    c: int, h: int, w: int, fc_dim: int, c_cond: int, segment: int, tile_h: int
) -> int:
    wl = _round_up(w, _LANE)
    n = tile_h * w
    buf = 4 * (
        segment * c * h * wl        # states
        + segment * h * wl          # masks
        + c * h * wl                # gx
        + 4 * c * h * wl            # gp
        + c * h * wl                # dx0 / g blocks
        + (c_cond * h * wl if c_cond else 0)
    )
    tiles = 4 * n * (
        (4 * c + c_cond) * 2        # percept (+ band headroom)
        + 3 * fc_dim                # z1, hid, gz1
        + 2 * c                     # gdx, adj
    )
    return buf + tiles


def pick_segment(cfg: NCAConfig, h: int, w: int, n_steps: int) -> Optional[int]:
    """Largest K in {16, 8, 4, 2} dividing n_steps that fits the VMEM budget."""
    tile_h = _pick_tile_h(h, w, 2048)
    if h % tile_h != 0:
        return None
    for k in (16, 8, 4, 2):
        if n_steps % k:
            continue
        est = bwd_vmem_bytes_estimate(
            cfg.c_in, h, w, cfg.fc_dim, cfg.c_cond if cfg.conditioning else 0,
            k, tile_h,
        )
        if est < 12 * 2**20:
            return k
    return None


def fused_train_supported(cfg: NCAConfig, h: int, w: int, n_steps: int) -> bool:
    """True when the custom-VJP fused rollout applies (see module doc)."""
    if cfg.padding_mode != "circular":
        return False
    if tuple(cfg.perception_scales) != (0,):
        return False
    if w % _LANE != 0 or h % 8 != 0:
        return False
    return pick_segment(cfg, h, w, n_steps) is not None


def _common_weight_args(params, compute_dtype):
    cdt = jnp.dtype(compute_dtype)
    return (
        params["w1"].T.astype(cdt),       # w1t [F, P]
        params["b1"].astype(jnp.float32),
        params["w2"].T.astype(cdt),       # w2t [C, F]
        params["b2"].astype(jnp.float32),
    )


def _fwd_call(params, x, cond, seed_i32, cfg, n_steps, segment, compute_dtype,
              interpret):
    b, c, h, w = x.shape
    tile_h = _pick_tile_h(h, w, 2048)
    has_cond = cond is not None
    n_segments = n_steps // segment
    kernel = _make_fwd_kernel(
        cfg, h, w, n_steps, segment, tile_h, has_cond, jnp.dtype(compute_dtype)
    )
    w1t, b1, w2t, b2 = _common_weight_args(params, compute_dtype)

    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        rep(w1t.shape), rep(b1.shape), rep(w2t.shape), rep(b2.shape),
    ]
    args = [seed_i32.reshape(1), x, w1t, b1, w2t, b2]
    if has_cond:
        in_specs.append(block(cond.shape[1:]))
        args.append(cond.astype(x.dtype))

    cc = cfg.c_cond if has_cond else 0
    flops_step = 2 * h * w * ((4 * c + cc) * cfg.fc_dim + cfg.fc_dim * c)
    # Kernel matmuls are validated at DEFAULT matmul precision; a global
    # 'highest' setting would expand them into multi-pass sequences whose
    # temporaries blow Mosaic's 16 MB scoped-vmem stack (measured: the
    # 128px flat backward needs 21.7 MB under 'highest'). Pin it here.
    with jax.default_matmul_precision("default"):
        y, ckpt = pl.pallas_call(
            kernel,
            grid=(b,),
            out_shape=(
                jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
                jax.ShapeDtypeStruct((b, n_segments, c, h, w), jnp.float32),
            ),
            in_specs=in_specs,
            out_specs=(
                block((c, h, w)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, c, h, w), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * flops_step,
                bytes_accessed=(2 + n_segments) * b * c * h * w * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    return y, ckpt


def _bwd_call(params, ckpt, cond, seed_i32, gy, cfg, n_steps, segment,
              compute_dtype, interpret):
    b, n_segments, c, h, w = ckpt.shape
    tile_h = _pick_tile_h(h, w, 2048)
    has_cond = cond is not None
    cc = cfg.c_cond if has_cond else 0
    f = cfg.fc_dim
    p = 4 * c + cc
    kernel = _make_bwd_kernel(
        cfg, h, w, n_steps, segment, tile_h, has_cond, jnp.dtype(compute_dtype)
    )
    w1t, b1, w2t, b2 = _common_weight_args(params, compute_dtype)
    cdt = jnp.dtype(compute_dtype)
    w1 = params["w1"].astype(cdt)   # [P, F]
    w2 = params["w2"].astype(cdt)   # [F, C]

    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # checkpoints stay in HBM
        block((c, h, w)),                        # gy
        rep(w1t.shape), rep(b1.shape), rep(w2t.shape), rep(b2.shape),
        rep(w1.shape), rep(w2.shape),
    ]
    args = [seed_i32.reshape(1), ckpt, gy, w1t, b1, w2t, b2, w1, w2]
    if has_cond:
        in_specs.append(block(cond.shape[1:]))
        args.append(cond.astype(jnp.float32))

    out_shape = [
        jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),   # dx0
        jax.ShapeDtypeStruct((b, f, p), jnp.float32),      # dw1t
        jax.ShapeDtypeStruct((b, 1, f), jnp.float32),      # db1 (1-row so the
                                                           # block is legal: last
                                                           # two dims == array's)
        jax.ShapeDtypeStruct((b, c, f), jnp.float32),      # dw2t
        jax.ShapeDtypeStruct((b, 1, c), jnp.float32),      # db2
    ]
    out_specs = [
        block((c, h, w)), block((f, p)), block((1, f)), block((c, f)),
        block((1, c)),
    ]
    if has_cond:
        out_shape.append(jax.ShapeDtypeStruct((b, cc, h, w), jnp.float32))
        out_specs.append(block((cc, h, w)))

    flops_step = 2 * h * w * (3 * (p * f + f * c))  # fwd recompute + 2 bwd mms
    # Kernel matmuls are validated at DEFAULT matmul precision; a global
    # 'highest' setting would expand them into multi-pass sequences whose
    # temporaries blow Mosaic's 16 MB scoped-vmem stack (measured: the
    # 128px flat backward needs 21.7 MB under 'highest'). Pin it here.
    with jax.default_matmul_precision("default"):
        outs = pl.pallas_call(
            kernel,
            grid=(b,),
            out_shape=tuple(out_shape),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((segment, c, h, w), jnp.float32),   # states
                pltpu.VMEM((segment, h, w), jnp.float32),      # masks
                pltpu.VMEM((c, h, w), jnp.float32),            # gx
                pltpu.VMEM((4 * c, h, w), jnp.float32),        # gp
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n_steps * flops_step,
                bytes_accessed=2 * n_segments * b * c * h * w * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    if has_cond:
        dx0, dw1t, db1, dw2t, db2, dcond = outs
    else:
        dx0, dw1t, db1, dw2t, db2 = outs
        dcond = None
    dparams = {
        "w1": jnp.sum(dw1t, axis=0).T.astype(params["w1"].dtype),
        "b1": jnp.sum(db1, axis=(0, 1)).astype(params["b1"].dtype),
        "w2": jnp.sum(dw2t, axis=0).T.astype(params["w2"].dtype),
        "b2": jnp.sum(db2, axis=(0, 1)).astype(params["b2"].dtype),
    }
    return dparams, dx0, dcond


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_rollout_train_chw(
    params: dict,
    x: jnp.ndarray,
    cond: Optional[jnp.ndarray],
    seed_f: jnp.ndarray,
    cfg: NCAConfig,
    n_steps: int,
    segment: int,
    compute_dtype: str = "float32",
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused rollout on CHW state.

    x: [B, C, H, W] f32; cond: optional [B, c_cond, H, W]; seed_f: FLOAT32
    scalar PRNG seed (float so custom_vjp has a well-typed zero cotangent;
    values should stay within int32 range). Returns the final state.
    Gradients flow to params, x, and cond; masks are constants (the
    reference's pass-through Bernoulli semantics, SURVEY.md §7).

    Primal-only calls (no grad taken) use a single-checkpoint forward
    (segment = n_steps) so they skip the per-segment checkpoint DMAs; the
    differentiated path runs through _train_fwd with the real segment."""
    y, _ = _fwd_call(
        params, x, cond, seed_f.astype(jnp.int32), cfg, n_steps, n_steps,
        compute_dtype, interpret,
    )
    return y


def _train_fwd(params, x, cond, seed_f, cfg, n_steps, segment, compute_dtype,
               interpret):
    seed_i32 = seed_f.astype(jnp.int32)
    y, ckpt = _fwd_call(
        params, x, cond, seed_i32, cfg, n_steps, segment, compute_dtype,
        interpret,
    )
    return y, (params, ckpt, cond, seed_i32)


def _train_bwd(cfg, n_steps, segment, compute_dtype, interpret, res, gy):
    params, ckpt, cond, seed_i32 = res
    dparams, dx0, dcond = _bwd_call(
        params, ckpt, cond, seed_i32, gy, cfg, n_steps, segment,
        compute_dtype, interpret,
    )
    if cond is not None and dcond is None:
        dcond = jnp.zeros_like(cond)
    return dparams, dx0, dcond, jnp.zeros((), jnp.float32)


fused_rollout_train_chw.defvjp(_train_fwd, _train_bwd)


# ==========================================================================
# Flat-layout custom-VJP kernel pair: the [ceil8(C), H*W] layout of
# pallas_step's flat rollout (all pixels on lanes — no percept relayouts, no
# misaligned sublane slices; measured 1.67x over the [C, H, W] kernels on
# the forward at 256^2) applied to the differentiable training rollout.
# Same segment-checkpoint + remat-in-kernel scheme as the CHW pair above;
# masks are regenerated from the per-step seeds instead of stored (the
# backward walks tiles in the same order as the forward).
# ==========================================================================


def _make_fwd_kernel_flat(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    segment: int,
    tile_rows: int,
    cp: int,
    ccp: int,
    compute_dtype,
):
    f = cfg.fc_dim
    thr = _uniform_threshold(cfg.update_rate)
    n = tile_rows * w
    n_tiles = h // tile_rows
    hw = h * w
    assert cfg.padding_mode == "circular"
    has_cond = ccp > 0
    assert tuple(cfg.perception_scales) == (0,)  # ms: tiled fwd factory

    def kernel(seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, *rest):
        if has_cond:
            cond_ref, out_ref, ckpt_ref, alt_ref, dma_sem = rest
        else:
            out_ref, ckpt_ref, alt_ref, dma_sem = rest
            cond_ref = None

        bidx = pl.program_id(0)
        load = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[0], dma_sem)
        load.start()
        load.wait()

        col = jax.lax.broadcasted_iota(jnp.int32, (1, n + 2 * w), 1) % w
        is_col0 = col == 0
        is_colw1 = col == w - 1

        def band_of(src, t):
            return _flat_band_circ(
                lambda a, b: src[0, :, a:b], t, n, w, hw, n_tiles
            )

        def run_step(src, dst):
            for t in range(n_tiles):
                o = t * n
                cond_tile = (
                    cond_ref[0, :, o : o + n] if cond_ref is not None else None
                )
                dst[0, :, o : o + n] = _flat_tile_update(
                    band_of(src, t), cond_tile,
                    w1t_ref, b1_ref, w2t_ref, b2_ref,
                    cp, f, n, w, thr, "circular", compute_dtype,
                    is_col0, is_colw1,
                )

        def ckpt_store(src, i):
            dma = pltpu.make_async_copy(
                src.at[0], ckpt_ref.at[bidx, i // segment], dma_sem
            )
            dma.start()
            dma.wait()

        def one_step(i, carry):
            pltpu.prng_seed(_step_seed(seed_ref[0], bidx, i))

            @pl.when(i % 2 == 0)
            def _():
                @pl.when(i % segment == 0)
                def _():
                    ckpt_store(out_ref, i)

                run_step(out_ref, alt_ref)

            @pl.when(i % 2 == 1)
            def _():
                @pl.when(i % segment == 0)
                def _():
                    ckpt_store(alt_ref, i)

                run_step(alt_ref, out_ref)

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)
        if n_steps % 2 == 1:
            out_ref[:] = alt_ref[:]

    return kernel


def _make_fwd_kernel_flat_tiled_ms(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    segment: int,
    tile_rows: int,
    cp: int,
    ccp: int,
    compute_dtype,
):
    """Segment-checkpointing forward for perception_scales (0,1): the ms
    percept's per-tile temporaries are ~3x the scale-0 body, and Mosaic
    does not reuse stack allocations across UNROLLED tile bodies (measured
    44.3 MB scoped demand at 256^2 x 32 tiles) — so the tile loop is a
    ``fori_loop`` over two [n_tiles, cp, n] Jacobi buffers with modular
    leading-dim band reads, the same validated pattern as the tiled
    backward. x / checkpoints stay FLAT in HBM (per-tile lane-slice DMAs
    retile both ways); the output block is tiled and the wrapper untiles
    it once per call. Mask-draw order (per step: tiles 0..n_tiles-1)
    matches the unrolled forward and both backwards."""
    f = cfg.fc_dim
    thr = _uniform_threshold(cfg.update_rate)
    n = tile_rows * w
    n_tiles = h // tile_rows
    assert cfg.padding_mode == "circular"
    assert tuple(cfg.perception_scales) == (0, 1)
    assert h % 2 == 0 and w % 2 == 0 and tile_rows >= 4
    assert tile_rows % 2 == 0  # hoisted row-parity mask needs even offsets
    assert n_tiles >= 2
    has_cond = ccp > 0

    def kernel(seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, *rest):
        if has_cond:
            condt_ref, outt_ref, ckpt_ref, alt_ref, dma_sem = rest
        else:
            outt_ref, ckpt_ref, alt_ref, dma_sem = rest
            condt_ref = None

        bidx = pl.program_id(0)
        for t in range(n_tiles):
            dma = pltpu.make_async_copy(
                x_ref.at[bidx, :, pl.ds(t * n, n)], outt_ref.at[0, t],
                dma_sem,
            )
            dma.start()
            dma.wait()

        def band_of(src, t):
            """[cp, n + 2*_MS_HALO*w] modular tiled circular band."""
            return _tiled_band(
                lambda idx, lo, hi: src[idx, :, lo * w : hi * w],
                t, n_tiles, tile_rows, w, _MS_HALO,
            )

        ms_base = _ms_masks_base(n, w, h)

        def run_step(src, dst):
            def one_t(t, carry):
                cond_tile = condt_ref[0, t] if condt_ref is not None else None
                dst[t] = _flat_tile_update_ms(
                    band_of(src, t), cond_tile,
                    w1t_ref, b1_ref, w2t_ref, b2_ref,
                    cp, f, n, w, thr, compute_dtype,
                    _ms_masks_tile(ms_base, t * tile_rows, h),
                )
                return carry

            jax.lax.fori_loop(0, n_tiles, one_t, 0)

        def ckpt_store(src, i):
            for t in range(n_tiles):
                dma = pltpu.make_async_copy(
                    src.at[t],
                    ckpt_ref.at[bidx, i // segment, :, pl.ds(t * n, n)],
                    dma_sem,
                )
                dma.start()
                dma.wait()

        def one_step(i, carry):
            pltpu.prng_seed(_step_seed(seed_ref[0], bidx, i))

            @pl.when(i % 2 == 0)
            def _():
                @pl.when(i % segment == 0)
                def _():
                    ckpt_store(outt_ref.at[0], i)

                run_step(outt_ref.at[0], alt_ref)

            @pl.when(i % 2 == 1)
            def _():
                @pl.when(i % segment == 0)
                def _():
                    ckpt_store(alt_ref, i)

                run_step(alt_ref, outt_ref.at[0])

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)
        if n_steps % 2 == 1:
            outt_ref[0] = alt_ref[:]

    return kernel


def _make_bwd_kernel_flat(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    segment: int,
    tile_rows: int,
    cp: int,
    ccp: int,
    compute_dtype,
    need_dcond: bool = True,
):
    f = cfg.fc_dim
    thr = _uniform_threshold(cfg.update_rate)
    n = tile_rows * w
    n_tiles = h // tile_rows
    n_segments = n_steps // segment
    hw = h * w
    assert cfg.padding_mode == "circular"
    assert tuple(cfg.perception_scales) == (0,)  # ms rides the tiled pair
    has_cond = ccp > 0

    dn_nn = (((1,), (1,)), ((), ()))  # contract the pixel axis

    def kernel(
        seed_ref, ckpt_ref, g_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
        w1_ref, w2_ref, *rest,
    ):
        if has_cond and need_dcond:
            (cond_ref, dx0_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
             dcond_ref, states_ref, gp_ref, dma_sem) = rest
        elif has_cond:
            (cond_ref, dx0_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
             states_ref, gp_ref, dma_sem) = rest
            dcond_ref = None
        else:
            (dx0_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
             states_ref, gp_ref, dma_sem) = rest
            cond_ref = dcond_ref = None

        bidx = pl.program_id(0)

        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        if dcond_ref is not None:
            dcond_ref[:] = jnp.zeros_like(dcond_ref)
        # dL/dx accumulates IN the dx0 output block (saves a cp*hw VMEM
        # buffer); gy stays in HBM and is DMA'd in once.
        gload = pltpu.make_async_copy(g_ref.at[bidx], dx0_ref.at[0], dma_sem)
        gload.start()
        gload.wait()
        gx_ref = dx0_ref.at[0]

        col = jax.lax.broadcasted_iota(jnp.int32, (1, n + 2 * w), 1) % w
        is_col0 = col == 0
        is_colw1 = col == w - 1

        def band_of(buf_slice, t):
            return _flat_band_circ(buf_slice, t, n, w, hw, n_tiles)

        def tile_percept(src_k, t):
            band = band_of(lambda a, b: states_ref[src_k, :, a:b], t)
            o = t * n
            cond_tile = (
                cond_ref[0, :, o : o + n] if cond_ref is not None else None
            )
            return _flat_percept(
                band, cond_tile, n, w, "circular", compute_dtype,
                is_col0, is_colw1,
            )

        def recompute_segment(s):
            _flat_recompute_segment(
                s, segment, n_tiles, n, seed_ref, bidx, states_ref,
                tile_percept, w1t_ref, b1_ref, w2t_ref, b2_ref, f, cp, thr,
                compute_dtype,
            )

        def backward_step(s, k):
            # pass 1: MLP cotangents + param grads + perception cotangent gp
            # (masks regenerated: same seed, same tile order as the forward)
            pltpu.prng_seed(_step_seed(seed_ref[0], bidx, s * segment + k))
            for t in range(n_tiles):
                o = t * n
                _, percept = tile_percept(k, t)
                mask = _draw_mask_flat(n, thr)
                z1 = (
                    jnp.dot(w1t_ref[:], percept,
                            preferred_element_type=jnp.float32)
                    + b1_ref[:].reshape(f, 1)
                )
                hid = jnp.maximum(z1, 0.0).astype(compute_dtype)
                gdx = (gx_ref[:, o : o + n] * mask).astype(compute_dtype)
                gz1 = jnp.where(
                    z1 > 0.0,
                    jnp.dot(w2_ref[:], gdx, preferred_element_type=jnp.float32),
                    0.0,
                ).astype(compute_dtype)
                gp = jax.lax.dot_general(
                    w1_ref[:], gz1,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [P, n]
                gp_ref[:, o : o + n] = gp[: 4 * cp]
                if dcond_ref is not None:
                    dcond_ref[0, :, o : o + n] += gp[4 * cp :]
                dw1t_ref[0] += jax.lax.dot_general(
                    gz1, percept, dimension_numbers=dn_nn,
                    preferred_element_type=jnp.float32,
                )
                db1_ref[0, 0] += jnp.sum(gz1, axis=1, dtype=jnp.float32)
                dw2t_ref[0] += jax.lax.dot_general(
                    gdx, hid, dimension_numbers=dn_nn,
                    preferred_element_type=jnp.float32,
                )
                db2_ref[0, 0] += jnp.sum(gdx, axis=1, dtype=jnp.float32)

            # pass 2: adjoint perception stencil (flipped filters, circular)
            for t in range(n_tiles):
                o = t * n
                band4 = band_of(lambda a, b: gp_ref[:, a:b], t)
                left4, band4, right4 = _flat_neighbors(
                    band4, n, w, "circular", is_col0, is_colw1
                )

                def nb_g(g):
                    def nb(di, dj):
                        arr = (left4, band4, right4)[dj]
                        return arr[g * cp : (g + 1) * cp,
                                   di * w : di * w + n]

                    return nb

                adj = (
                    band4[0:cp, w : w + n]
                    + _stencil_from(nb_g(1), SOBEL_X_F)
                    + _stencil_from(nb_g(2), SOBEL_Y_F)
                    + _stencil_from(nb_g(3), LAPLACIAN_F)
                )
                gx_ref[:, o : o + n] += adj

        def per_segment(si, carry):
            s = n_segments - 1 - si
            load = pltpu.make_async_copy(
                ckpt_ref.at[bidx, s], states_ref.at[0], dma_sem
            )
            load.start()
            load.wait()
            recompute_segment(s)
            jax.lax.fori_loop(
                0, segment,
                lambda ki, cc_: backward_step(s, segment - 1 - ki) or cc_, 0,
            )
            return carry

        jax.lax.fori_loop(0, n_segments, per_segment, 0)

    return kernel


def _make_bwd_kernel_flat_tiled(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    segment: int,
    tile_rows: int,
    cp: int,
    ccp: int,
    compute_dtype,
    need_dcond: bool = True,
    tap_steps: Tuple[int, ...] = (),
    ablate: frozenset = frozenset(),
):
    """Fori-over-tiles scatter backward with TILED [n_tiles, cp, n] buffers.

    ``ablate`` (PROFILING ONLY — outputs become wrong): Python-staged stage
    removal for per-stage hardware timing. Members: ``"dw"`` drops the
    weight-gradient accumulations, ``"adj"`` drops the adjoint
    compute+scatter, ``"adjc"`` zeroes only the adjoint compute (scatter
    dataflow kept — isolates adj_of vs the RMW scatters), ``"gp"``
    additionally drops the gp matmul. ``"gp"`` requires ``"adj"`` (the
    adjoint consumes gp).

    The unrolled flat backwards hit Mosaic's scoped-vmem stack wall at 256²:
    the stack allocator does not reuse temporaries across unrolled tile
    bodies, so demand grows ~330 B per GRID pixel regardless of tile size
    (docs/ROUND2.md). Here the tile loop is a ``fori_loop`` with ONE body —
    stack demand is one TILE's temporaries — which requires the per-tile
    views to be dynamic-index-able: state/gx/cond live as
    ``[n_tiles, cp, n]`` (tile index on a leading dim, the validated Mosaic
    dynamic-indexing pattern), retiled from the flat HBM layout by per-tile
    lane-slice DMAs (checkpoints, gy) or an XLA transpose in the wrapper
    (cond in, dx0/dcond out). Adjoint scatter + one-tile delay + top-wrap
    parking are identical to ``_make_bwd_kernel_flat_scatter`` with modular
    tile arithmetic. This is the path that puts the flagship 256² training
    presets (BASELINE configs 2-4; reference hot loop
    ConditioneDyNCA/experiments.py:226) on the fused custom-VJP pair."""
    assert "gp" not in ablate or "adj" in ablate, "gp ablation implies adj"
    f = cfg.fc_dim
    thr = _uniform_threshold(cfg.update_rate)
    n = tile_rows * w
    n_tiles = h // tile_rows
    n_segments = n_steps // segment
    hw = h * w
    assert cfg.padding_mode == "circular"
    assert n_tiles >= 2, "tiled backward needs >= 2 row tiles"
    has_cond = ccp > 0
    ms = tuple(cfg.perception_scales) == (0, 1)
    if ms:
        # tile_rows >= 4 keeps the 4-row adjoint reach within one neighbor
        # tile; the percept halo may span two (multi-tile bands); even
        # tile offsets keep the hoisted row-parity mask tile-invariant.
        assert h % 2 == 0 and w % 2 == 0 and tile_rows >= 4
        assert tile_rows % 2 == 0
    # Adjoint reach: rows of neighbor-tile overlap the scatter must carry
    # (1 for the 3x3 stencil, 4 for the scale-(0,1) down/stencil/up chain).
    ew = (4 if ms else 1) * w

    dn_nn = (((1,), (1,)), ((), ()))
    if tap_steps:
        # In-kernel frame taps: the reverse walk injects each tap frame's
        # cotangent exactly when gx represents that state (segment must be
        # 1 so the forward checkpointed every state the taps slice).
        assert segment == 1
        assert all(1 <= t < n_steps for t in tap_steps)

    def kernel(
        seed_ref, ckpt_ref, g_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
        w1_ref, w2_ref, *rest,
    ):
        rest = list(rest)
        gtaps_ref = rest.pop(0) if tap_steps else None
        # Scratch refs sit at the tail in _bwd_call_flat_tiled's
        # scratch_shapes order: gx, states, adj, [cond_scr], dma_sem.
        dma_sem = rest.pop()
        cond_scr_ref = rest.pop() if has_cond else None
        adj_ref = rest.pop()
        states_ref = rest.pop()
        gx_scr_ref = rest.pop()
        if has_cond and need_dcond:
            (condt_ref, dx0t_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
             dcondt_ref) = rest
        elif has_cond:
            (condt_ref, dx0t_ref, dw1t_ref, db1_ref, dw2t_ref,
             db2_ref) = rest
            dcondt_ref = None
        else:
            dx0t_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref = rest
            condt_ref = dcondt_ref = None

        bidx = pl.program_id(0)

        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        if dcondt_ref is not None:
            dcondt_ref[:] = jnp.zeros_like(dcondt_ref)
        # dL/dx accumulates in a VMEM SCRATCH and ships to the ANY-space
        # dx0 output in one DMA at the end: a blocked VMEM output would be
        # double-buffered by the grid pipeline (2 x 4.2 MB at 256^2), which
        # is exactly the headroom the tr=8 ms tile body needs. gy is DMA'd
        # in per tile (lane slices of the flat HBM layout retile for free).
        for t in range(n_tiles):
            gl = pltpu.make_async_copy(
                g_ref.at[bidx, :, pl.ds(t * n, n)], gx_scr_ref.at[t], dma_sem
            )
            gl.start()
            gl.wait()
        gxt_ref = gx_scr_ref  # [n_tiles, cp, n]

        col = jax.lax.broadcasted_iota(jnp.int32, (1, n + 2 * w), 1) % w
        is_col0 = col == 0
        is_colw1 = col == w - 1
        cola = jax.lax.broadcasted_iota(jnp.int32, (1, n + 4 * w), 1) % w
        a_col0 = cola == 0
        a_colw1 = cola == w - 1

        def band_of_tiled(k, t, hb=1):
            """Flat circular band [cp, n + 2*hb*w] for tile t of states[k]:
            modular leading-dim reads replace _flat_band_circ's static
            boundary cases (hb may span multiple neighbor tiles)."""
            return _tiled_band(
                lambda idx, lo, hi: states_ref[k, idx, :, lo * w : hi * w],
                t, n_tiles, tile_rows, w, hb,
            )

        ms_base = _ms_masks_base(n, w, h) if ms else None

        def tile_masks(t):
            return _ms_masks_tile(ms_base, t * tile_rows, h)

        def tile_percept(src_k, t, msk=None):
            cond_tile = None
            if condt_ref is not None:
                # cond stays in HBM (tiled layout): per-tile DMA into a
                # [ccp, n] scratch — 2 MB of VMEM the 256^2 ms backward
                # can't spare, at ~0.2 ms/grad of extra HBM traffic.
                dma = pltpu.make_async_copy(
                    condt_ref.at[bidx, t], cond_scr_ref, dma_sem
                )
                dma.start()
                dma.wait()
                cond_tile = cond_scr_ref[:]
            if ms:
                # wide_up MUST match the forward kernel's choice (True):
                # wide and narrow are expression-tree identical, but Mosaic
                # fuses FMAs differently per layout on hardware, and a
                # 1-ulp recompute drift flips relu gates in the backward
                # (measured as a 1.8e-3 b1 grad error vs the scan under
                # 'highest'-precision references; interpret mode cannot
                # see it).
                return _flat_percept_ms(
                    band_of_tiled(src_k, t, _MS_HALO), cond_tile, n, w,
                    compute_dtype, tile_masks(t) if msk is None else msk,
                )
            return _flat_percept(
                band_of_tiled(src_k, t), cond_tile, n, w, "circular",
                compute_dtype, is_col0, is_colw1,
            )

        def load_ckpt(s):
            for t in range(n_tiles):
                d = pltpu.make_async_copy(
                    ckpt_ref.at[bidx, s, :, pl.ds(t * n, n)],
                    states_ref.at[0, t], dma_sem,
                )
                d.start()
                d.wait()

        def recompute_segment(s):
            """states[k] = x_{sK+k} for k in [1, segment): same per-step
            seeds, same tile order as the forward (bit-exact replay)."""
            if segment == 1:
                return

            def one_k(k, carry):
                pltpu.prng_seed(_step_seed(seed_ref[0], bidx, s * segment + k))

                def one_t(t, c2):
                    center, percept = tile_percept(k, t)
                    mask = _draw_mask_flat(n, thr)
                    hid = jnp.maximum(
                        jnp.dot(w1t_ref[:], percept,
                                preferred_element_type=jnp.float32)
                        + b1_ref[:].reshape(f, 1),
                        0.0,
                    ).astype(compute_dtype)
                    dx = (
                        jnp.dot(w2t_ref[:], hid,
                                preferred_element_type=jnp.float32)
                        + b2_ref[:].reshape(cp, 1)
                    )
                    states_ref[k + 1, t] = center + dx * mask
                    return c2

                jax.lax.fori_loop(0, n_tiles, one_t, 0)
                return carry

            jax.lax.fori_loop(0, segment - 1, one_k, 0)

        def adj_of(gp_tile, t, msk=None):
            """Adjoint band [cp, n + 2*ew] from one tile's gp [4cp, n]
            (cross-tile halo contributions emerge as the band's edge rows).
            Scale-0: flipped-stencil correlation on a zero-padded band.
            ms: the mechanical transpose of the down/stencil/up chain
            (t feeds the global-row masks; t may be traced)."""
            if ms:
                return _flat_percept_ms_adj(
                    gp_tile, tile_masks(t) if msk is None else msk,
                    cp, n, w,
                    stages=frozenset(
                        s[4:] for s in ablate if s.startswith("adj_")
                    ),
                )
            z = jnp.zeros((4 * cp, 2 * w), gp_tile.dtype)
            gpb = jnp.concatenate([z, gp_tile, z], axis=1)  # [4cp, n+4w]
            left, band, right = _flat_neighbors(
                gpb, n + 2 * w, w, "circular", a_col0, a_colw1
            )

            def nb_g(g):
                def nb(di, dj):
                    arr = (left, band, right)[dj]
                    return arr[g * cp : (g + 1) * cp,
                               di * w : di * w + n + 2 * w]

                return nb

            return (
                band[0:cp, w : w + n + 2 * w]
                + _stencil_from(nb_g(1), SOBEL_X_F)
                + _stencil_from(nb_g(2), SOBEL_Y_F)
                + _stencil_from(nb_g(3), LAPLACIAN_F)
            )

        def backward_step(s, k):
            # Tap cotangent injection: gx currently represents the state
            # AFTER step s*segment+k — a tap frame at that state adds its
            # cotangent here, before this step's reverse pass consumes gx.
            for ti, tstep in enumerate(tap_steps):
                @pl.when(s * segment + k + 1 == tstep)
                def _(ti=ti):
                    for t in range(n_tiles):
                        gl = pltpu.make_async_copy(
                            gtaps_ref.at[ti, bidx, :, pl.ds(t * n, n)],
                            adj_ref.at[:, : n],
                            dma_sem,
                        )
                        gl.start()
                        gl.wait()
                        gxt_ref[t] += adj_ref[:, : n]

            pltpu.prng_seed(_step_seed(seed_ref[0], bidx, s * segment + k))

            def tile_body(t, carry):
                msk = tile_masks(t) if ms else None
                _, percept = tile_percept(k, t, msk)
                mask = _draw_mask_flat(n, thr)
                # relu mask derived from hid (hid > 0 <=> z1 > 0): one
                # fewer [F, n] f32 stack buffer than keeping z1 around.
                hid = jnp.maximum(
                    jnp.dot(w1t_ref[:], percept,
                            preferred_element_type=jnp.float32)
                    + b1_ref[:].reshape(f, 1),
                    0.0,
                ).astype(compute_dtype)
                gdx = (gxt_ref[t] * mask).astype(compute_dtype)
                gz1 = jnp.where(
                    hid > 0.0,
                    jnp.dot(w2_ref[:], gdx,
                            preferred_element_type=jnp.float32),
                    0.0,
                ).astype(compute_dtype)
                if "gp" not in ablate:
                    gp = jax.lax.dot_general(
                        w1_ref[:], gz1,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [P, n]
                    if dcondt_ref is not None and "dw" not in ablate:
                        dcondt_ref[0, t] += gp[4 * cp :]
                if "dw" not in ablate:
                    dw1t_ref[0] += jax.lax.dot_general(
                        gz1, percept, dimension_numbers=dn_nn,
                        preferred_element_type=jnp.float32,
                    )
                    db1_ref[0, 0] += jnp.sum(gz1, axis=1, dtype=jnp.float32)
                    dw2t_ref[0] += jax.lax.dot_general(
                        gdx, hid, dimension_numbers=dn_nn,
                        preferred_element_type=jnp.float32,
                    )
                    db2_ref[0, 0] += jnp.sum(gdx, axis=1, dtype=jnp.float32)

                if "adj" not in ablate:
                    # Delayed scatter: tile t-1's adjoint lands AFTER this
                    # tile's pass-1 read of its (overlapping) first rows;
                    # tile 0's top-wrap chunk (last tile's rows — its pass-1
                    # runs last) parks in adj_ref's spare last ew lanes.
                    @pl.when(t > 0)
                    def _():
                        j = t - 1
                        adj = adj_ref[:, : n + 2 * ew]
                        gxt_ref[j] += adj[:, ew : ew + n]
                        gxt_ref[t, :, : ew] += adj[:, n + ew :]

                        @pl.when(j == 0)
                        def _():
                            adj_ref[:, n + 2 * ew :] = adj[:, : ew]

                        @pl.when(j > 0)
                        def _():
                            gxt_ref[j - 1, :, n - ew :] += adj[:, : ew]

                    if "adjc" in ablate:
                        # Keep the scatter dataflow, zero the adjoint
                        # compute: isolates adj_of vs the RMW scatters.
                        adj_ref[:, : n + 2 * ew] = jnp.zeros(
                            (cp, n + 2 * ew), jnp.float32
                        )
                    else:
                        adj_ref[:, : n + 2 * ew] = adj_of(gp[: 4 * cp], t, msk)
                return carry

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)
            if "adj" not in ablate:
                # Final scatter: last tile's adjoint, then the parked chunk.
                jlast = n_tiles - 1
                adj = adj_ref[:, : n + 2 * ew]
                gxt_ref[jlast] += adj[:, ew : ew + n]
                gxt_ref[0, :, : ew] += adj[:, n + ew :]
                gxt_ref[jlast - 1, :, n - ew :] += adj[:, : ew]
                gxt_ref[jlast, :, n - ew :] += adj_ref[:, n + 2 * ew :]

        def per_segment(si, carry):
            s = n_segments - 1 - si
            load_ckpt(s)
            recompute_segment(s)
            jax.lax.fori_loop(
                0, segment,
                lambda ki, cc_: backward_step(s, segment - 1 - ki) or cc_, 0,
            )
            return carry

        jax.lax.fori_loop(0, n_segments, per_segment, 0)

        st = pltpu.make_async_copy(
            gx_scr_ref, dx0t_ref.at[bidx], dma_sem
        )
        st.start()
        st.wait()

    return kernel


def _make_bwd_kernel_flat_scatter(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    segment: int,
    tile_rows: int,
    cp: int,
    ccp: int,
    compute_dtype,
    need_dcond: bool = True,
):
    """Flat backward WITHOUT the whole-grid gp buffer (which alone is
    4*cp*H*W*4 bytes — 16.8 MB at 256², past VMEM): each tile's perception
    cotangent is folded into dL/dx by a SCATTER of its adjoint-stencil band,
    delayed by one tile so the next tile's pass-1 read of its first row
    happens before the overlapping halo write. Tile 0's top-wrap chunk
    (which lands on the LAST tile's rows) is deferred to the end of the
    step. Only per-tile gp/adjoint bands live in VMEM."""
    c = cfg.c_in
    f = cfg.fc_dim
    thr = _uniform_threshold(cfg.update_rate)
    n = tile_rows * w
    n_tiles = h // tile_rows
    n_segments = n_steps // segment
    hw = h * w
    assert cfg.padding_mode == "circular"
    assert tuple(cfg.perception_scales) == (0,)  # ms rides the tiled pair
    assert n_tiles >= 2, "scatter backward needs >= 2 row tiles"
    has_cond = ccp > 0

    dn_nn = (((1,), (1,)), ((), ()))

    def kernel(
        seed_ref, ckpt_ref, g_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
        w1_ref, w2_ref, *rest,
    ):
        if has_cond and need_dcond:
            (cond_ref, dx0_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
             dcond_ref, states_ref, adj_ref, dma_sem) = rest
        elif has_cond:
            (cond_ref, dx0_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
             states_ref, adj_ref, dma_sem) = rest
            dcond_ref = None
        else:
            (dx0_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
             states_ref, adj_ref, dma_sem) = rest
            cond_ref = dcond_ref = None

        bidx = pl.program_id(0)

        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        if dcond_ref is not None:
            dcond_ref[:] = jnp.zeros_like(dcond_ref)
        gload = pltpu.make_async_copy(g_ref.at[bidx], dx0_ref.at[0], dma_sem)
        gload.start()
        gload.wait()
        gx_ref = dx0_ref.at[0]

        col = jax.lax.broadcasted_iota(jnp.int32, (1, n + 2 * w), 1) % w
        is_col0 = col == 0
        is_colw1 = col == w - 1
        # adjoint bands are n + 4w long (±1-row outputs, each needing ±1-row
        # taps of the zero-padded tile gp)
        cola = jax.lax.broadcasted_iota(jnp.int32, (1, n + 4 * w), 1) % w
        a_col0 = cola == 0
        a_colw1 = cola == w - 1

        def band_of(buf_slice, t):
            return _flat_band_circ(buf_slice, t, n, w, hw, n_tiles)

        def tile_percept(src_k, t):
            band = band_of(lambda a, b: states_ref[src_k, :, a:b], t)
            o = t * n
            cond_tile = (
                cond_ref[0, :, o : o + n] if cond_ref is not None else None
            )
            return _flat_percept(
                band, cond_tile, n, w, "circular", compute_dtype,
                is_col0, is_colw1,
            )

        def recompute_segment(s):
            _flat_recompute_segment(
                s, segment, n_tiles, n, seed_ref, bidx, states_ref,
                tile_percept, w1t_ref, b1_ref, w2t_ref, b2_ref, f, cp, thr,
                compute_dtype,
            )

        def adj_of(gp_tile):
            """Adjoint-stencil band [cp, n + 2w] from a single tile's gp
            [4cp, n] zero-padded on both sides (cross-tile halo contributions
            emerge as the band's ±1-row edges)."""
            z = jnp.zeros((4 * cp, 2 * w), gp_tile.dtype)
            gpb = jnp.concatenate([z, gp_tile, z], axis=1)  # [4cp, n+4w]
            left, band, right = _flat_neighbors(
                gpb, n + 2 * w, w, "circular", a_col0, a_colw1
            )

            def nb_g(g):
                def nb(di, dj):
                    arr = (left, band, right)[dj]
                    return arr[g * cp : (g + 1) * cp,
                               di * w : di * w + n + 2 * w]

                return nb

            return (
                band[0:cp, w : w + n + 2 * w]
                + _stencil_from(nb_g(1), SOBEL_X_F)
                + _stencil_from(nb_g(2), SOBEL_Y_F)
                + _stencil_from(nb_g(3), LAPLACIAN_F)
            )

        def scatter_adj(t, adj):
            """gx[rows of tile t ± 1] += adj, excluding tile 0's top-wrap
            chunk (returned for deferral)."""
            o = t * n
            if t == 0:
                gx_ref[:, 0 : n + w] += adj[:, w:]
                return adj[:, 0:w]  # -> gx[hw-w:hw], deferred
            if t == n_tiles - 1:
                gx_ref[:, o - w : hw] += adj[:, : n + w]
                gx_ref[:, 0:w] += adj[:, n + w :]
                return None
            gx_ref[:, o - w : o + n + w] += adj
            return None

        def backward_step(s, k):
            pltpu.prng_seed(_step_seed(seed_ref[0], bidx, s * segment + k))
            for t in range(n_tiles):
                o = t * n
                _, percept = tile_percept(k, t)
                mask = _draw_mask_flat(n, thr)
                z1 = (
                    jnp.dot(w1t_ref[:], percept,
                            preferred_element_type=jnp.float32)
                    + b1_ref[:].reshape(f, 1)
                )
                hid = jnp.maximum(z1, 0.0).astype(compute_dtype)
                gdx = (gx_ref[:, o : o + n] * mask).astype(compute_dtype)
                gz1 = jnp.where(
                    z1 > 0.0,
                    jnp.dot(w2_ref[:], gdx, preferred_element_type=jnp.float32),
                    0.0,
                ).astype(compute_dtype)
                gp = jax.lax.dot_general(
                    w1_ref[:], gz1,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [P, n]
                if dcond_ref is not None:
                    dcond_ref[0, :, o : o + n] += gp[4 * cp :]
                dw1t_ref[0] += jax.lax.dot_general(
                    gz1, percept, dimension_numbers=dn_nn,
                    preferred_element_type=jnp.float32,
                )
                db1_ref[0, 0] += jnp.sum(gz1, axis=1, dtype=jnp.float32)
                dw2t_ref[0] += jax.lax.dot_general(
                    gdx, hid, dimension_numbers=dn_nn,
                    preferred_element_type=jnp.float32,
                )
                db2_ref[0, 0] += jnp.sum(gdx, axis=1, dtype=jnp.float32)

                # Delayed scatter: tile t-1's adjoint lands AFTER this
                # tile's pass-1 read of its (overlapping) first row. Tile
                # 0's top-wrap chunk parks in adj_ref's spare last w lanes.
                if t > 0:
                    d = scatter_adj(t - 1, adj_ref[:, : n + 2 * w])
                    if t == 1:
                        adj_ref[:, n + 2 * w :] = d
                adj_ref[:, : n + 2 * w] = adj_of(gp[: 4 * cp])
            scatter_adj(n_tiles - 1, adj_ref[:, : n + 2 * w])
            gx_ref[:, hw - w : hw] += adj_ref[:, n + 2 * w :]

        def per_segment(si, carry):
            s = n_segments - 1 - si
            load = pltpu.make_async_copy(
                ckpt_ref.at[bidx, s], states_ref.at[0], dma_sem
            )
            load.start()
            load.wait()
            recompute_segment(s)
            jax.lax.fori_loop(
                0, segment,
                lambda ki, cc_: backward_step(s, segment - 1 - ki) or cc_, 0,
            )
            return carry

        jax.lax.fori_loop(0, n_segments, per_segment, 0)

    return kernel


def _flat_tile_rows(h: int, w: int) -> int:
    """Row-tile size shared by the flat train fwd/bwd kernels (they MUST
    agree: masks replay in tile order). Smaller tiles at big grids keep the
    per-tile temporaries inside the tighter 256px VMEM budget."""
    return _pick_tile_rows(h, w, 2048)


def bwd_flat_vmem_bytes_estimate(
    cp: int, hw: int, fc_dim: int, ccp: int, segment: int, n: int, w: int,
    scatter: bool = False, need_dcond: bool = True,
) -> int:
    buf = 4 * (
        segment * cp * hw      # states
        + cp * hw              # dx0 block (doubles as the gx accumulator)
        + (ccp * hw if ccp else 0)                  # cond input block
        + (ccp * hw if (ccp and need_dcond) else 0)  # dcond output block
    )
    if scatter:
        buf += 4 * cp * (n + 3 * w)       # per-tile adjoint band + deferral
    else:
        buf += 4 * 4 * cp * hw            # whole-grid gp
    tiles = 4 * n * (
        (4 * cp + ccp) * 2     # percept + neighbor bands headroom
        + 3 * fc_dim           # z1, hid, gz1
        + 2 * cp               # gdx, adj
    )
    return buf + tiles


def bwd_tiled_vmem_bytes_estimate(
    cp: int, hw: int, fc_dim: int, ccp: int, segment: int, n: int, w: int,
    need_dcond: bool = True, ms: bool = False,
) -> int:
    """VMEM demand of the fori-over-tiles backward: whole-grid buffers are
    exact; the tile-body stack term is calibrated against the measured
    ~330 B/pixel of the unrolled bodies, halved because a single fori body
    lets Mosaic reuse within one body's live ranges (validated on hardware;
    see docs/ROUND3.md). ``ms`` (perception_scales (0,1)): the adjoint
    band widens to 4-row edges and the percept/transpose chains add ~17
    live [cp, n+12w] ranges (calibrated against the measured 19.11 MB
    total at 256^2/tr=8/c16, docs/ROUND3.md); the cond INPUT rides in HBM
    (per-tile DMA), so only its [ccp, n] scratch counts."""
    ew = (4 if ms else 1) * w
    buf = 4 * (
        segment * cp * hw      # states (tiled layout, same byte count)
        + cp * hw              # dx0/gx tiled output block
        + (ccp * n if ccp else 0)                    # cond tile scratch
        + (ccp * hw if (ccp and need_dcond) else 0)  # dcond tiled output
    )
    buf += 4 * cp * (n + 3 * ew)  # adjoint band + parked top-wrap chunk
    tile = 4 * n * (
        (4 * cp + ccp) * 2 + 3 * fc_dim + 8 * cp
    ) // 2
    if ms:
        # Recalibrated r3b: the view-based adjoint (fewer/narrower live
        # ranges) and the gx-in-scratch fix (no double-buffered dx0 block)
        # brought the measured 256^2 budget from 19.11 MB (tr=8, r3a) to a
        # compiling tr=8 body; factor 7 is purely the measured tr=8/tr=16
        # boundary (tr=8 passes at 13.8 MB, tr=16's forward measured
        # 17.1 MB > limit).
        tile += 4 * (n + 12 * w) * cp * 7  # percept + transpose live ranges
    return buf + tile


def plan_flat_train(
    cfg: NCAConfig, h: int, w: int, n_steps: int, need_dcond: bool = True,
    force_mode: Optional[str] = None,
) -> Optional[Tuple[int, str, int]]:
    """(segment, mode, tile_rows) for the flat VJP pair, or None.

    Modes, in preference order:
    - 'gather': whole-grid perception cotangent in VMEM (measured fastest
      at 128px).
    - 'scatter': per-tile adjoint scatter, no gp buffer — mid-size grids.
      Both unrolled backwards stop at H·W <= 32k px: Mosaic's stack
      allocator does not reuse temporaries across unrolled tile bodies
      (~330 B/grid-pixel regardless of tile size, docs/ROUND2.md).
    - 'tiled': fori-over-tiles scatter backward with [n_tiles, cp, n]
      buffers — ONE tile body, so the stack holds one tile's temporaries.
      Extends the fused pair to the flagship 256² presets; tile size is
      part of the plan (fwd/bwd must draw masks in the same tile order).

    ``need_dcond=False`` (the trainer's case: cond is a positional constant
    or stop-gradient'd edge map) drops the conditioning cotangent output
    from the budget. ``force_mode`` restricts the search to one mode (tests,
    A/B benchmarks)."""
    cp = _round8(cfg.c_in)
    ccp = _round8(cfg.c_cond) if cfg.conditioning else 0
    ms = tuple(cfg.perception_scales) == (0, 1)
    if ms and (h % 2 or w % 2):
        return None
    tile_rows = _flat_tile_rows(h, w)
    if h % tile_rows != 0:
        return None
    n = tile_rows * w
    n_tiles = h // tile_rows
    # Small segments first: recompute cost is (k-1)/k extra forwards per
    # step while the extra checkpoint DMA traffic of k=1 is negligible —
    # measured 7.74 ms (k=1) vs 8.05 ms (k=2) on the 64-step 128px gradient.
    # (HBM checkpoints grow to n_steps*batch*state at k=1: <= ~1.5 GB for
    # every supported grid size.)
    modes = ("gather", "scatter", "tiled")
    if ms:
        modes = ("tiled",)  # only the fori-over-tiles pair carries the
        #                     scale-(0,1) percept + its transposed adjoint
    if force_mode is not None:
        modes = (force_mode,)
    for mode in modes:
        if mode == "scatter" and (n_tiles < 2 or h * w > 32768):
            continue
        if mode == "gather" and h * w > 32768 and force_mode is None:
            continue  # whole-grid gp alone approaches the scoped limit
        if mode == "tiled":
            # Tile size is a free parameter here (smaller tiles shrink the
            # single body's stack); it must divide H and keep >= 2 tiles.
            for tr in sorted(
                {t for t in (tile_rows, tile_rows // 2, tile_rows // 4,
                             tile_rows // 8, 1)
                 if t >= 1 and tile_rows % max(t, 1) == 0},
                reverse=True,
            ):
                nt = tr * w
                if h // tr < 2:
                    continue
                if ms and tr > 8:
                    continue  # ms: tr=8 (n=2048/tile) is the largest
                    #           hardware-validated body; tr=16's FORWARD
                    #           blew scoped vmem at 256^2 (17.1 MB)
                if ms and (tr < 4 or tr % 2):
                    continue  # ms: 4-row adjoint reach must stay within
                    #           one neighbor tile (modular band READS may
                    #           span several; duplicates are fine), and
                    #           EVEN tile offsets keep the hoisted row-
                    #           parity mask tile-invariant
                for k in (1, 2, 4, 8, 16):
                    if n_steps % k:
                        continue
                    if bwd_tiled_vmem_bytes_estimate(
                            cp, h * w, cfg.fc_dim, ccp, k, nt, w, need_dcond,
                            ms,
                    ) < 14 * 2**20:
                        return k, "tiled", tr
            continue
        for k in (1, 2, 4, 8, 16):
            if n_steps % k:
                continue
            if bwd_flat_vmem_bytes_estimate(
                    cp, h * w, cfg.fc_dim, ccp, k, n, w, mode == "scatter",
                    need_dcond,
            ) < 13 * 2**20:
                return k, mode, tile_rows
    return None


def pick_segment_flat(cfg: NCAConfig, h: int, w: int,
                      n_steps: int) -> Optional[int]:
    plan = plan_flat_train(cfg, h, w, n_steps)
    return None if plan is None else plan[0]


def fused_train_flat_supported(cfg: NCAConfig, h: int, w: int,
                               n_steps: int,
                               need_dcond: bool = True) -> bool:
    """True when the flat-layout custom-VJP rollout applies
    (perception_scales (0,) in any mode, (0,1) via the tiled pair). The
    trainer passes need_dcond=False (its conditioning is a positional
    constant or a stop-gradient'd edge map — no cotangent needed)."""
    if cfg.padding_mode != "circular":
        return False
    if tuple(cfg.perception_scales) not in ((0,), (0, 1)):
        return False
    if w % _LANE != 0:
        return False
    return plan_flat_train(cfg, h, w, n_steps, need_dcond) is not None


def _flat_shapes(cfg: NCAConfig, has_cond: bool):
    c = cfg.c_in
    cp = _round8(c)
    cc = cfg.c_cond if has_cond else 0
    ccp = _round8(cc) if cc else 0
    return c, cp, cc, ccp


def _fwd_call_flat(params, xf, condf, seed_i32, cfg, n_steps, segment,
                   compute_dtype, interpret, h, w, tile_rows=None):
    b, cp, hw = xf.shape
    c, _, cc, ccp = _flat_shapes(cfg, condf is not None)
    if tile_rows is None:
        tile_rows = _flat_tile_rows(h, w)
    if tuple(cfg.perception_scales) == (0, 1):
        return _fwd_call_flat_tiled_ms(
            params, xf, condf, seed_i32, cfg, n_steps, segment,
            compute_dtype, interpret, h, w, tile_rows,
        )
    n_segments = n_steps // segment
    kernel = _make_fwd_kernel_flat(
        cfg, h, w, n_steps, segment, tile_rows, cp, ccp,
        jnp.dtype(compute_dtype),
    )
    w1t, b1, w2t, b2 = _flat_pad_weights(params, c, cp, cc, ccp, compute_dtype)

    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        rep(w1t.shape), rep(b1.shape), rep(w2t.shape), rep(b2.shape),
    ]
    args = [seed_i32.reshape(1), xf, w1t, b1, w2t, b2]
    if condf is not None:
        in_specs.append(block(condf.shape[1:]))
        args.append(condf)

    flops_step = 2 * hw * ((4 * cp + ccp) * cfg.fc_dim + cfg.fc_dim * cp)
    # Kernel matmuls are validated at DEFAULT matmul precision; a global
    # 'highest' setting would expand them into multi-pass sequences whose
    # temporaries blow Mosaic's 16 MB scoped-vmem stack (measured: the
    # 128px flat backward needs 21.7 MB under 'highest'). Pin it here.
    with jax.default_matmul_precision("default"):
        y, ckpt = pl.pallas_call(
            kernel,
            grid=(b,),
            out_shape=(
                jax.ShapeDtypeStruct((b, cp, hw), jnp.float32),
                jax.ShapeDtypeStruct((b, n_segments, cp, hw), jnp.float32),
            ),
            in_specs=in_specs,
            out_specs=(
                block((cp, hw)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, cp, hw), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * flops_step,
                bytes_accessed=(2 + n_segments) * b * cp * hw * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    return y, ckpt


def _fwd_call_flat_tiled_ms(params, xf, condf, seed_i32, cfg, n_steps,
                            segment, compute_dtype, interpret, h, w,
                            tile_rows):
    """Dispatch for the fori-over-tiles ms forward: x/checkpoints flat in
    HBM, cond rides in (and the final state comes out) tiled; the tiled
    output is untiled here, once per call."""
    b, cp, hw = xf.shape
    c, _, cc, ccp = _flat_shapes(cfg, condf is not None)
    n = tile_rows * w
    n_tiles = h // tile_rows
    n_segments = n_steps // segment
    kernel = _make_fwd_kernel_flat_tiled_ms(
        cfg, h, w, n_steps, segment, tile_rows, cp, ccp,
        jnp.dtype(compute_dtype),
    )
    w1t, b1, w2t, b2 = _flat_pad_weights(params, c, cp, cc, ccp, compute_dtype)

    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # x flat HBM
        rep(w1t.shape), rep(b1.shape), rep(w2t.shape), rep(b2.shape),
    ]
    args = [seed_i32.reshape(1), xf, w1t, b1, w2t, b2]
    if condf is not None:
        condt = _tile4(condf, n_tiles)
        in_specs.append(block(condt.shape[1:]))
        args.append(condt)

    flops_step = 2 * hw * 2 * ((4 * cp + ccp) * cfg.fc_dim + cfg.fc_dim * cp)
    # Kernel matmuls are validated at DEFAULT matmul precision (see
    # _fwd_call_flat). Pin it here too.
    with jax.default_matmul_precision("default"):
        yt, ckpt = pl.pallas_call(
            kernel,
            grid=(b,),
            out_shape=(
                jax.ShapeDtypeStruct((b, n_tiles, cp, n), jnp.float32),
                jax.ShapeDtypeStruct((b, n_segments, cp, hw), jnp.float32),
            ),
            in_specs=in_specs,
            out_specs=(
                block((n_tiles, cp, n)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((n_tiles, cp, n), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * flops_step,
                bytes_accessed=(2 + n_segments) * b * cp * hw * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    return _untile4(yt), ckpt


def _bwd_call_flat(params, ckpt, condf, seed_i32, gy, cfg, n_steps, segment,
                   compute_dtype, interpret, h, w, mode="gather",
                   tile_rows=None, need_dcond=True):
    b, n_segments, cp, hw = ckpt.shape
    c, _, cc, ccp = _flat_shapes(cfg, condf is not None)
    if tile_rows is None:
        tile_rows = _flat_tile_rows(h, w)
    f = cfg.fc_dim
    p = 4 * cp + ccp
    if mode == "tiled":
        return _bwd_call_flat_tiled(
            params, ckpt, condf, seed_i32, gy, cfg, n_steps, segment,
            compute_dtype, interpret, h, w, tile_rows, need_dcond,
        )
    make = (_make_bwd_kernel_flat_scatter if mode == "scatter"
            else _make_bwd_kernel_flat)
    kernel = make(
        cfg, h, w, n_steps, segment, tile_rows, cp, ccp,
        jnp.dtype(compute_dtype), need_dcond,
    )
    w1t, b1, w2t, b2 = _flat_pad_weights(params, c, cp, cc, ccp, compute_dtype)
    # Full padded [P, F] / [F, cp] weights for the cotangent matmuls.
    w1p = w1t.T
    w2p = w2t.T

    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # gy: DMA'd into dx0
        rep(w1t.shape), rep(b1.shape), rep(w2t.shape), rep(b2.shape),
        rep(w1p.shape), rep(w2p.shape),
    ]
    args = [seed_i32.reshape(1), ckpt, gy, w1t, b1, w2t, b2, w1p, w2p]
    if condf is not None:
        in_specs.append(block(condf.shape[1:]))
        args.append(condf)

    out_shape = [
        jax.ShapeDtypeStruct((b, cp, hw), jnp.float32),   # dx0
        jax.ShapeDtypeStruct((b, f, p), jnp.float32),     # dw1t
        jax.ShapeDtypeStruct((b, 1, f), jnp.float32),     # db1
        jax.ShapeDtypeStruct((b, cp, f), jnp.float32),    # dw2t
        jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),    # db2
    ]
    out_specs = [
        block((cp, hw)), block((f, p)), block((1, f)), block((cp, f)),
        block((1, cp)),
    ]
    if condf is not None and need_dcond:
        out_shape.append(jax.ShapeDtypeStruct((b, ccp, hw), jnp.float32))
        out_specs.append(block((ccp, hw)))

    flops_step = 2 * hw * (3 * (p * f + f * cp))
    # Kernel matmuls are validated at DEFAULT matmul precision; a global
    # 'highest' setting would expand them into multi-pass sequences whose
    # temporaries blow Mosaic's 16 MB scoped-vmem stack (measured: the
    # 128px flat backward needs 21.7 MB under 'highest'). Pin it here.
    with jax.default_matmul_precision("default"):
        outs = pl.pallas_call(
            kernel,
            grid=(b,),
            out_shape=tuple(out_shape),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((segment, cp, hw), jnp.float32),   # states
                (pltpu.VMEM((cp, tile_rows * w + 3 * w), jnp.float32)  # adj band
                 if mode == "scatter"
                 else pltpu.VMEM((4 * cp, hw), jnp.float32)),          # gp
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n_steps * flops_step,
                bytes_accessed=2 * n_segments * b * cp * hw * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    if condf is not None and need_dcond:
        dx0, dw1t, db1, dw2t, db2, dcond = outs
    else:
        dx0, dw1t, db1, dw2t, db2 = outs[:5]
        dcond = None
    # Un-pad the parameter gradients back to the reference layout.
    dw1p = jnp.sum(dw1t, axis=0).T  # [P, F] padded-row layout
    rows = [dw1p[k * cp : k * cp + c] for k in range(4)]
    if cc:
        rows.append(dw1p[4 * cp : 4 * cp + cc])
    dparams = {
        "w1": jnp.concatenate(rows, axis=0).astype(params["w1"].dtype),
        "b1": jnp.sum(db1, axis=(0, 1)).astype(params["b1"].dtype),
        "w2": jnp.sum(dw2t, axis=0).T[:, :c].astype(params["w2"].dtype),
        "b2": jnp.sum(db2, axis=(0, 1))[:c].astype(params["b2"].dtype),
    }
    return dparams, dx0, dcond


def _tile4(a, n_tiles):
    """[B, C, H*W] -> [B, n_tiles, C, n] (XLA transpose, once per call)."""
    b, c, hw = a.shape
    return a.reshape(b, c, n_tiles, hw // n_tiles).transpose(0, 2, 1, 3)


def _untile4(a):
    """[B, n_tiles, C, n] -> [B, C, H*W]."""
    b, nt, c, n = a.shape
    return a.transpose(0, 2, 1, 3).reshape(b, c, nt * n)


def _bwd_call_flat_tiled(params, ckpt, condf, seed_i32, gy, cfg, n_steps,
                         segment, compute_dtype, interpret, h, w, tile_rows,
                         need_dcond, gtaps=None, tap_steps=(),
                         ablate=frozenset()):
    """Backward dispatch for the fori-over-tiles kernel: cond rides in (and
    dx0/dcond come out) in the tiled [n_tiles, cp, n] layout; checkpoints
    and gy stay flat in HBM (the kernel retiles them with per-tile
    lane-slice DMAs)."""
    b, n_segments, cp, hw = ckpt.shape
    c, _, cc, ccp = _flat_shapes(cfg, condf is not None)
    f = cfg.fc_dim
    p = 4 * cp + ccp
    n = tile_rows * w
    n_tiles = h // tile_rows
    ew = (4 if tuple(cfg.perception_scales) == (0, 1) else 1) * w
    kernel = _make_bwd_kernel_flat_tiled(
        cfg, h, w, n_steps, segment, tile_rows, cp, ccp,
        jnp.dtype(compute_dtype), need_dcond, tuple(tap_steps),
        frozenset(ablate),
    )
    w1t, b1, w2t, b2 = _flat_pad_weights(params, c, cp, cc, ccp, compute_dtype)
    w1p = w1t.T
    w2p = w2t.T

    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # ckpt (flat HBM)
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # gy (flat HBM)
        rep(w1t.shape), rep(b1.shape), rep(w2t.shape), rep(b2.shape),
        rep(w1p.shape), rep(w2p.shape),
    ]
    args = [seed_i32.reshape(1), ckpt, gy, w1t, b1, w2t, b2, w1p, w2p]
    if tap_steps:
        # tap-frame cotangents [n_taps, B, cp, hw] ride in HBM; the kernel
        # DMAs lane slices at the injection steps.
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        args.append(gtaps)
    if condf is not None:
        condt = _tile4(condf, n_tiles)
        # cond rides in HBM; the kernel DMAs one [ccp, n] tile at a time.
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        args.append(condt)

    out_shape = [
        jax.ShapeDtypeStruct((b, n_tiles, cp, n), jnp.float32),  # dx0 tiled
        jax.ShapeDtypeStruct((b, f, p), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
        jax.ShapeDtypeStruct((b, cp, f), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # dx0 (DMA'd out)
        block((f, p)), block((1, f)),
        block((cp, f)), block((1, cp)),
    ]
    if condf is not None and need_dcond:
        out_shape.append(jax.ShapeDtypeStruct((b, n_tiles, ccp, n),
                                              jnp.float32))
        out_specs.append(block((n_tiles, ccp, n)))

    flops_step = 2 * hw * (3 * (p * f + f * cp))
    # Kernel matmuls are validated at DEFAULT matmul precision; a global
    # 'highest' setting would expand them into multi-pass sequences whose
    # temporaries blow Mosaic's 16 MB scoped-vmem stack. Pin it here.
    with jax.default_matmul_precision("default"):
        outs = pl.pallas_call(
            kernel,
            grid=(b,),
            out_shape=tuple(out_shape),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=(
                [
                    pltpu.VMEM((n_tiles, cp, n), jnp.float32),  # gx accum
                    pltpu.VMEM((segment, n_tiles, cp, n), jnp.float32),
                    pltpu.VMEM((cp, n + 3 * ew), jnp.float32),  # adj + park
                ]
                + ([pltpu.VMEM((ccp, n), jnp.float32)] if condf is not None
                   else [])
                + [pltpu.SemaphoreType.DMA(())]
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n_steps * flops_step,
                bytes_accessed=2 * n_segments * b * cp * hw * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    if condf is not None and need_dcond:
        dx0t, dw1t, db1, dw2t, db2, dcondt = outs
        dcond = _untile4(dcondt)
    else:
        dx0t, dw1t, db1, dw2t, db2 = outs[:5]
        dcond = None
    dx0 = _untile4(dx0t)
    dw1p = jnp.sum(dw1t, axis=0).T
    rows = [dw1p[k * cp : k * cp + c] for k in range(4)]
    if cc:
        rows.append(dw1p[4 * cp : 4 * cp + cc])
    dparams = {
        "w1": jnp.concatenate(rows, axis=0).astype(params["w1"].dtype),
        "b1": jnp.sum(db1, axis=(0, 1)).astype(params["b1"].dtype),
        "w2": jnp.sum(dw2t, axis=0).T[:, :c].astype(params["w2"].dtype),
        "b2": jnp.sum(db2, axis=(0, 1))[:c].astype(params["b2"].dtype),
    }
    return dparams, dx0, dcond


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
def fused_rollout_train_flat_hw(
    params: dict,
    xf: jnp.ndarray,
    condf: Optional[jnp.ndarray],
    seed_f: jnp.ndarray,
    cfg: NCAConfig,
    n_steps: int,
    segment: int,
    compute_dtype: str,
    interpret: bool,
    h: int,
    w: int,
    mode: str = "gather",
    tile_rows: Optional[int] = None,
    need_dcond: bool = True,
) -> jnp.ndarray:
    """Differentiable flat-layout fused rollout on [B, ceil8(C), H*W] state
    (+ padded flat cond). Gradients flow to params, xf, condf. ``mode`` and
    ``tile_rows`` come from ``plan_flat_train`` (the forward must draw masks
    in the backward's tile order, so tile size is part of the plan)."""
    y, _ = _fwd_call_flat(
        params, xf, condf, seed_f.astype(jnp.int32), cfg, n_steps, n_steps,
        compute_dtype, interpret, h, w, tile_rows,
    )
    return y


def _train_fwd_flat(params, xf, condf, seed_f, cfg, n_steps, segment,
                    compute_dtype, interpret, h, w, mode="gather",
                    tile_rows=None, need_dcond=True):
    seed_i32 = seed_f.astype(jnp.int32)
    y, ckpt = _fwd_call_flat(
        params, xf, condf, seed_i32, cfg, n_steps, segment, compute_dtype,
        interpret, h, w, tile_rows,
    )
    return y, (params, ckpt, condf, seed_i32)


def _train_bwd_flat(cfg, n_steps, segment, compute_dtype, interpret, h, w,
                    mode, tile_rows, need_dcond, res, gy):
    params, ckpt, condf, seed_i32 = res
    dparams, dx0, dcond = _bwd_call_flat(
        params, ckpt, condf, seed_i32, gy, cfg, n_steps, segment,
        compute_dtype, interpret, h, w, mode, tile_rows, need_dcond,
    )
    if condf is not None and dcond is None:
        dcond = jnp.zeros_like(condf)
    return dparams, dx0, dcond, jnp.zeros((), jnp.float32)


fused_rollout_train_flat_hw.defvjp(_train_fwd_flat, _train_bwd_flat)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
def fused_rollout_train_flat_taps_hw(
    params: dict,
    xf: jnp.ndarray,
    condf: Optional[jnp.ndarray],
    seed_f: jnp.ndarray,
    cfg: NCAConfig,
    n_steps: int,
    segment: int,
    compute_dtype: str,
    interpret: bool,
    h: int,
    w: int,
    tile_rows: Optional[int],
    need_dcond: bool,
    tap_steps: Tuple[int, ...],
):
    """Flat fused rollout with IN-KERNEL frame taps: one kernel pair for
    the whole tapped schedule. Returns (y, taps [n_taps, B, cp, hw]).

    Forward taps are FREE: at segment=1 the forward already checkpoints
    every state to HBM for the backward's replay, so tap t is a slice of
    the checkpoint buffer (reference frames = middle_feature_list[::64],
    fit_video_motion.py:235). The backward injects each tap's cotangent
    when its reverse walk reaches that state ('tiled' mode only). This
    replaces the per-chunk fused calls (one call per frame + tail) with
    ONE call — no per-chunk wrapper transposes/dispatch and no separate
    1-step XLA program for the reference schedule's step-1 frame."""
    y, ckpt = _fwd_call_flat(
        params, xf, condf, seed_f.astype(jnp.int32), cfg, n_steps, 1,
        compute_dtype, interpret, h, w, tile_rows,
    )
    return y, jnp.stack([ckpt[:, t] for t in tap_steps])


def _train_fwd_flat_taps(params, xf, condf, seed_f, cfg, n_steps, segment,
                         compute_dtype, interpret, h, w, tile_rows,
                         need_dcond, tap_steps):
    seed_i32 = seed_f.astype(jnp.int32)
    y, ckpt = _fwd_call_flat(
        params, xf, condf, seed_i32, cfg, n_steps, segment, compute_dtype,
        interpret, h, w, tile_rows,
    )
    taps = jnp.stack([ckpt[:, t] for t in tap_steps])
    return (y, taps), (params, ckpt, condf, seed_i32)


def _train_bwd_flat_taps(cfg, n_steps, segment, compute_dtype, interpret,
                         h, w, tile_rows, need_dcond, tap_steps, res, g):
    gy, gtaps = g
    params, ckpt, condf, seed_i32 = res
    dparams, dx0, dcond = _bwd_call_flat_tiled(
        params, ckpt, condf, seed_i32, gy, cfg, n_steps, segment,
        compute_dtype, interpret, h, w, tile_rows, need_dcond,
        gtaps=gtaps, tap_steps=tap_steps,
    )
    if condf is not None and dcond is None:
        dcond = jnp.zeros_like(condf)
    return dparams, dx0, dcond, jnp.zeros((), jnp.float32)


fused_rollout_train_flat_taps_hw.defvjp(
    _train_fwd_flat_taps, _train_bwd_flat_taps
)


def fused_train_flat_taps_supported(cfg: NCAConfig, h: int, w: int,
                                    n_steps: int,
                                    need_dcond: bool = True) -> bool:
    """In-kernel taps need the tiled backward at segment 1 (every state
    checkpointed; the injection walk assumes it)."""
    if not fused_train_flat_supported(cfg, h, w, n_steps, need_dcond):
        return False
    plan = plan_flat_train(cfg, h, w, n_steps, need_dcond,
                           force_mode="tiled")
    return plan is not None and plan[0] == 1


def fused_rollout_train_flat(
    params: dict,
    x_nhwc: jnp.ndarray,
    seed_f: jnp.ndarray,
    cfg: NCAConfig,
    n_steps: int,
    cond_nhwc: Optional[jnp.ndarray] = None,
    compute_dtype: str = "float32",
    interpret: bool = False,
    force_mode: Optional[str] = None,
    cond_no_grad: bool = False,
    force_segment: Optional[int] = None,
    tap_steps: Tuple[int, ...] = (),
):
    """NHWC wrapper for the FLAT custom-VJP kernel pair: returns
    (state, rgb) like ``dynca_rollout``, differentiable through the fused
    kernels. Channel pad/flatten happens inside the differentiated graph, so
    cotangents flow back through the (linear) reshape/pad exactly.
    ``force_mode`` pins the backward variant ('gather'/'scatter'/'tiled')
    and ``force_segment`` the checkpoint interval, for tests and A/B
    benchmarks. ``tap_steps`` (strictly increasing, in [1, n_steps)) runs
    the tapped-schedule variant: returns (state, rgb, [tap rgbs]) from ONE
    kernel pair (see fused_rollout_train_flat_taps_hw; requires
    fused_train_flat_taps_supported)."""
    b, h, w, _ = x_nhwc.shape
    plan = plan_flat_train(
        cfg, h, w, n_steps, need_dcond=not cond_no_grad, force_mode=force_mode
    )
    assert plan is not None, "flat fused training path unsupported"
    segment, mode, tile_rows = plan
    if force_segment is not None:
        assert n_steps % force_segment == 0
        segment = force_segment
    c, cp, cc, ccp = _flat_shapes(cfg, cond_nhwc is not None)
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    xf = jnp.pad(x, ((0, 0), (0, cp - c), (0, 0), (0, 0))).reshape(
        b, cp, h * w
    )
    condf = None
    if cond_nhwc is not None:
        cnd = jnp.transpose(cond_nhwc, (0, 3, 1, 2))
        condf = jnp.pad(
            cnd, ((0, 0), (0, ccp - cc), (0, 0), (0, 0))
        ).reshape(b, ccp, h * w).astype(jnp.float32)
    if tap_steps:
        if mode != "tiled":
            # small grids plan 'gather'/'scatter'; the tap injection lives
            # in the tiled backward — re-plan for it
            plan = plan_flat_train(
                cfg, h, w, n_steps, need_dcond=not cond_no_grad,
                force_mode="tiled",
            )
            assert plan is not None, "no tiled plan for in-kernel taps"
            segment, mode, tile_rows = plan
        assert segment == 1 and mode == "tiled", (
            "in-kernel taps need the seg-1 tiled plan "
            "(fused_train_flat_taps_supported)"
        )
        assert all(1 <= t < n_steps for t in tap_steps)
        out, taps = fused_rollout_train_flat_taps_hw(
            params, xf, condf, jnp.asarray(seed_f, jnp.float32), cfg,
            n_steps, segment, compute_dtype, interpret, h, w, tile_rows,
            not cond_no_grad, tuple(int(t) for t in tap_steps),
        )
        state = jnp.transpose(out.reshape(b, cp, h, w)[:, :c], (0, 2, 3, 1))
        tap_rgbs = [
            jnp.transpose(
                taps[i].reshape(b, cp, h, w)[:, : cfg.c_out], (0, 2, 3, 1)
            ) * 2.0
            for i in range(len(tap_steps))
        ]
        return state, state[..., : cfg.c_out] * 2.0, tap_rgbs
    out = fused_rollout_train_flat_hw(
        params, xf, condf, jnp.asarray(seed_f, jnp.float32), cfg, n_steps,
        segment, compute_dtype, interpret, h, w, mode, tile_rows,
        not cond_no_grad,
    )
    state = out.reshape(b, cp, h, w)[:, :c]
    state = jnp.transpose(state, (0, 2, 3, 1))
    return state, state[..., : cfg.c_out] * 2.0


def fused_rollout_train(
    params: dict,
    x_nhwc: jnp.ndarray,
    seed_f: jnp.ndarray,
    cfg: NCAConfig,
    n_steps: int,
    cond_nhwc: Optional[jnp.ndarray] = None,
    compute_dtype: str = "float32",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC wrapper: returns (state, rgb) like ``dynca_rollout`` — but
    differentiable through the fused kernel pair."""
    b, h, w, _ = x_nhwc.shape
    segment = pick_segment(cfg, h, w, n_steps)
    assert segment is not None, "fused training path unsupported for this shape"
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    cond = (
        jnp.transpose(cond_nhwc, (0, 3, 1, 2)) if cond_nhwc is not None else None
    )
    out = fused_rollout_train_chw(
        params, x, cond, jnp.asarray(seed_f, jnp.float32), cfg, n_steps,
        segment, compute_dtype, interpret,
    )
    state = jnp.transpose(out, (0, 2, 3, 1))
    return state, state[..., : cfg.c_out] * 2.0
