"""Fused Pallas NCA rollout kernel — the TPU counterpart of the reference's
hand-fused WebGL step shaders (docs/dynca.js:390-600, SURVEY.md §2.7).

Design (see pallas_guide.md):

- The ENTIRE rollout runs inside one kernel with the state resident in VMEM:
  for grids up to ~304^2 x 16ch fp32 the state (+ padded scratch) fits in the
  16 MB VMEM budget, so the N-step loop touches HBM exactly twice (initial
  load, final store). The XLA path materializes perception/hidden tensors to
  HBM every step and is bandwidth-bound; this kernel is compute-bound.
- Layout is [C, H, W] ("CHW"): W maps to lanes (multiples of 128 for the
  sizes of interest), H to sublanes, and the tiny channel dim is a leading
  untiled axis — the NHWC layout would pad C=12 lanes to 128 (10x VMEM
  waste).
- The two 1x1 convs run as [F, K] x [K, N] MXU matmuls with pixels streaming
  along N, row-tile by row-tile; perception is the shared 9-point stencil on
  a per-step padded scratch buffer honoring the replicate/circular/zeros
  mode (ConditioneDyNCA/models/dynca.py:85).
- The stochastic per-cell mask uses the on-core PRNG
  (pltpu.prng_seed/prng_random_bits): mask = 1 iff u24 >= (1-rate)*2^24,
  which equals floor(U(0,1) + rate) in distribution
  (dynca.py:131). Bit-parity with jax.random is neither possible nor
  required (SURVEY.md §7 "Randomness semantics").

This is the inference/deployment path; training uses the custom-VJP kernel
pair in ops/pallas_train.py (segment-checkpointed remat-in-kernel BPTT) when
supported, else the pure-JAX step whose gradients XLA derives.

Layout evolution (round 3 finding): the [C, H, W] kernels below pay two
relayouts per tile per step — the percept [C, th, W] -> [P, th*W]
sublane->lane flatten feeding the MXU, and the sublane-MISALIGNED
H-neighbor views band[:, di:di+th, :]. The FLAT layout ([ceil8(C), H*W],
every pixel on the lane axis) eliminates both and measured 1.67x faster at
256^2 (0.0457 vs 0.0762 ms/step, 910 fps @ 24 steps/frame) and 1.60x at
512^2 via the streaming variant (0.1143 vs 0.1830 XLA ms/step, 365 fps).
``select_rollout_kernel`` encodes the measured auto-selection policy; the
CHW kernels remain for multiscale (0, 1) and as the bit-exact-vs-XLA
reference points.

Scope decisions (measured on v5e):
- a multiscale (scales (0,1)) kernel variant exists (_make_kernel_roll_ms:
  resampling as clamped-bilinear MXU matmuls, per-tile half-percept bands)
  and is exact vs the XLA rollout, but measures BREAK-EVEN with XLA on v5e
  (107 fps @192x256xc16; Mosaic stack OOMs at 256^2xc16), so auto-selection
  keeps multiscale models on the XLA path (~80 fps @256px/24 steps, 2.7x
  real-time).
- an HBM-streaming row-band kernel (fused_rollout_stream_chw: double-
  buffered band DMA, 8-row-aligned halo blocks) extends the fused design
  past the VMEM cap. It is bit-exact vs the scan on hardware but measures
  DEAD EVEN with XLA at 512^2x12ch (0.1858 vs 0.1860 ms/step): at these
  shapes neither path is HBM-bound (~16 TFLOP/s effective — the bound is
  VPU/data-movement, not bandwidth), so auto-selection keeps >VMEM grids on
  XLA and the kernel stays available as an explicit call.
- algo='mat' folds the fixed stencils into the first matmul
  (stencil_folded_w1) so the MXU does the filter arithmetic; measured 45%
  SLOWER than 'roll' at 256^2 (0.119 vs 0.082 ms/step): stacking 9C tap
  rows moves more data than the stencil math it saves. Kept as a tested
  negative result.
- grids with W not a multiple of 128 or exceeding the VMEM fit use the XLA
  path (auto-fallback in VideoStylizer).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.ops.filters import LAPLACIAN, SOBEL_X, SOBEL_Y

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def vmem_bytes_estimate(
    c: int, h: int, w: int, fc_dim: int, tile_h: int, state_bytes: int = 4
) -> int:
    """Rough VMEM footprint: state + padded scratch + per-tile temporaries."""
    state = c * h * _round_up(w, _LANE) * state_bytes
    padded = c * (h + 2) * _round_up(w + 2, _LANE) * state_bytes
    n_tile = tile_h * w
    percept = 4 * c * _round_up(n_tile, _LANE) * 4 * 2  # percept + hidden headroom
    hidden = fc_dim * _round_up(n_tile, _LANE) * 4
    return state + padded + percept + hidden


def _pick_tile_h(h: int, w: int, target_n: int = 4096) -> int:
    """Largest divisor of H whose row-tile pixel count is <= target."""
    best = 8
    for th in range(8, h + 1, 8):
        if h % th == 0 and th * w <= target_n:
            best = th
    return best


def _uniform_threshold(update_rate: float) -> int:
    """u24 threshold such that P(bits24 >= thr) == update_rate."""
    thr = int(round((1.0 - update_rate) * (1 << 24)))
    return max(0, min(thr, 1 << 24))


def _stencil_from(padded_slice_fn, k) -> jnp.ndarray:
    acc = None
    for di in range(3):
        for dj in range(3):
            kv = float(k[di][dj])
            if kv == 0.0:
                continue
            term = padded_slice_fn(di, dj)
            term = term * kv if kv != 1.0 else term
            acc = term if acc is None else acc + term
    return acc



def _mlp_dx(percept, w1t_ref, b1_ref, w2t_ref, b2_ref, c, f, tile_h, w,
            compute_dtype):
    """Shared update-MLP tail: dx = w2(relu(w1 percept)) on a flat tile."""
    hid = jnp.maximum(
        jnp.dot(w1t_ref[:], percept, preferred_element_type=jnp.float32)
        + b1_ref[:].reshape(f, 1),
        0.0,
    ).astype(compute_dtype)
    return (
        jnp.dot(w2t_ref[:], hid, preferred_element_type=jnp.float32)
        + b2_ref[:].reshape(c, 1)
    ).reshape(c, tile_h, w)


def _draw_mask(tile_h, w, thr):
    """Shared stochastic mask draw: 1 iff top-24 uniform bits >= thr."""
    bits = pltpu.prng_random_bits((tile_h, w))
    u24 = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
    )
    return (u24 >= jnp.uint32(thr)).astype(jnp.float32)


def stencil_folded_w1(w1, c: int) -> jnp.ndarray:
    """Fold the fixed perception stencils into the first dense layer.

    z1 = W1^T [x | Sx*x | Sy*x | L*x | cond] == W_eff^T [x(di,dj) taps | cond]
    with W_eff[(di*3+dj)*C + ch] = 1{di==dj==1} W1[ch] + Sx[di,dj] W1[C+ch]
    + Sy[di,dj] W1[2C+ch] + L[di,dj] W1[3C+ch] — the stencil arithmetic
    moves onto the MXU (K grows 4C+cc -> 9C+cc but stays under the 128-wide
    systolic tile, so the matmul latency is unchanged) and the VPU only
    stacks shifted views."""
    w1 = jnp.asarray(w1)
    cc = w1.shape[0] - 4 * c
    blocks = []
    for di in range(3):
        for dj in range(3):
            acc = (
                float(SOBEL_X[di][dj]) * w1[c : 2 * c]
                + float(SOBEL_Y[di][dj]) * w1[2 * c : 3 * c]
                + float(LAPLACIAN[di][dj]) * w1[3 * c : 4 * c]
            )
            if di == 1 and dj == 1:
                acc = acc + w1[0:c]
            blocks.append(acc)
    if cc:
        blocks.append(w1[4 * c :])
    return jnp.concatenate(blocks, axis=0)


def _make_kernel_roll(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    tile_h: int,
    has_cond: bool,
    update_rate: float,
    compute_dtype=jnp.float32,
    mat_stencil: bool = False,
):
    """Double-buffered Jacobi kernel: no padded scratch, no whole-state
    copies. Per tile, a (tile_h + 2)-row band of the source buffer is lane-
    rolled ±1 for the W neighbors (wrap == circular; replicate/zeros fix the
    two edge columns with a select); H halos come from static row slices
    with first/last-tile wrap handling. Steps alternate A→B / B→A via a
    parity branch in the fori_loop. ~25% faster than the padded-snapshot
    variant at 256² (no misaligned whole-state write per step)."""
    c = cfg.c_in
    cc = cfg.c_cond if has_cond else 0
    p_dim = (9 * c if mat_stencil else 4 * c) + cc
    f = cfg.fc_dim
    thr = _uniform_threshold(update_rate)
    n_tiles = h // tile_h
    pad_mode = cfg.padding_mode

    def kernel(seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, *rest):
        if has_cond:
            cond_ref, out_ref, alt_ref, dma_sem = rest
        else:
            out_ref, alt_ref, dma_sem = rest
            cond_ref = None

        bidx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + bidx)

        load = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[0], dma_sem)
        load.start()
        load.wait()

        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)

        def band_rows(src, r0):
            """Source rows r0-1 .. r0+tile_h (+1) with boundary handling."""
            lo, hi = r0 - 1, r0 + tile_h + 1
            if lo >= 0 and hi <= h:
                return src[0, :, lo:hi, :]
            parts = []
            if lo < 0:
                if pad_mode == "circular":
                    parts.append(src[0, :, h - 1 : h, :])
                elif pad_mode == "replicate":
                    parts.append(src[0, :, 0:1, :])
                else:
                    parts.append(jnp.zeros_like(src[0, :, 0:1, :]))
                lo = 0
            mid = src[0, :, lo : min(hi, h), :]
            parts.append(mid)
            if hi > h:
                if pad_mode == "circular":
                    parts.append(src[0, :, 0:1, :])
                elif pad_mode == "replicate":
                    parts.append(src[0, :, h - 1 : h, :])
                else:
                    parts.append(jnp.zeros_like(src[0, :, 0:1, :]))
            return jnp.concatenate(parts, axis=1)

        def fix_cols(rolled, band, side):
            """Correct the wrapped edge column for replicate/zeros modes."""
            if pad_mode == "circular":
                return rolled
            if side == "left":  # rolled right by 1: col 0 wrapped from W-1
                mask = col == 0
                fix = band[:, :, 0:1] if pad_mode == "replicate" else 0.0
            else:  # rolled left by 1: col W-1 wrapped from 0
                mask = col == w - 1
                fix = band[:, :, w - 1 : w] if pad_mode == "replicate" else 0.0
            return jnp.where(mask, fix, rolled)

        def run_step(src, dst):
            for t in range(n_tiles):
                r0 = t * tile_h
                band = band_rows(src, r0)  # [C, tile_h+2, W]
                # pltpu.roll requires non-negative shifts: -1 == w - 1
                left = fix_cols(pltpu.roll(band, 1, axis=2), band, "left")
                right = fix_cols(pltpu.roll(band, w - 1, axis=2), band, "right")

                def nb(di, dj):
                    arr = (left, band, right)[dj]
                    return arr[:, di : di + tile_h, :]

                center = band[:, 1 : 1 + tile_h, :]
                if mat_stencil:
                    # stencils folded into w1 (stencil_folded_w1): stack the
                    # raw 3x3 taps; the MXU applies the filters.
                    parts = [nb(di, dj) for di in range(3) for dj in range(3)]
                else:
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

        def one_step(i, carry):
            @pl.when(i % 2 == 0)
            def _():
                run_step(out_ref, alt_ref)

            @pl.when(i % 2 == 1)
            def _():
                run_step(alt_ref, out_ref)

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)

        # Ensure the result lands in out_ref when n_steps is odd.
        if n_steps % 2 == 1:
            out_ref[:] = alt_ref[:]

    return kernel


def _make_kernel_roll_ms(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    tile_h: int,
    has_cond: bool,
    update_rate: float,
    compute_dtype=jnp.float32,
):
    """Multiscale (perception_scales == (0, 1)) variant of the roll kernel.

    The scale-1 branch downsamples the state 2x, perceives at half
    resolution (same padding mode), upsamples the 4C percept back, and
    averages with the scale-0 percept — exactly ``perceive_multiscale``
    (ConditioneDyNCA/models/dynca.py:75-115). All resampling is expressed
    as MXU matmuls with the clamped bilinear matrices from
    ``ops.grid_sample.resize_matrix`` (bitwise-equal to
    jax.image.resize(antialias=False)): the half state is built once per
    step (D_h @ state @ D_w^T per channel into a scratch buffer); per row
    tile, only the needed half-percept band is computed and upsampled, so
    no full-resolution half-percept is ever materialized.
    """
    from vsnca_tpu.ops.grid_sample import resize_matrix

    c = cfg.c_in
    cc = cfg.c_cond if has_cond else 0
    p4 = 4 * c
    p_dim = p4 + cc
    f = cfg.fc_dim
    thr = _uniform_threshold(update_rate)
    n_tiles = h // tile_h
    pad_mode = cfg.padding_mode
    h2, w2 = h // 2, w // 2

    u_h = resize_matrix(h, h2)  # [H, H/2]
    # Static per-tile half-row support: nonzero columns of U_h rows.
    tile_src = []
    for t in range(n_tiles):
        rows = u_h[t * tile_h : (t + 1) * tile_h]
        cols = np.nonzero(rows.any(axis=0))[0]
        tile_src.append((int(cols.min()), int(cols.max()) + 1))

    def kernel(seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
               dh_ref, dwt_ref, uh_ref, uwt_ref, *rest):
        if has_cond:
            cond_ref, out_ref, alt_ref, half_ref, dma_sem = rest
        else:
            out_ref, alt_ref, half_ref, dma_sem = rest
            cond_ref = None

        bidx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + bidx)

        load = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[0], dma_sem)
        load.start()
        load.wait()

        col_full = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        col_half = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w2), 2)

        def band_rows(src, lo, hi, rows_total, src_rank4=True):
            """Rows lo-1 .. hi (+1 halo each side) with boundary handling."""
            a, b2_ = lo - 1, hi + 1
            sl = (lambda s, e: src[0, :, s:e, :]) if src_rank4 else (
                lambda s, e: src[:, s:e, :]
            )
            if a >= 0 and b2_ <= rows_total:
                return sl(a, b2_)
            parts = []
            if a < 0:
                if pad_mode == "circular":
                    parts.append(sl(rows_total - 1, rows_total))
                elif pad_mode == "replicate":
                    parts.append(sl(0, 1))
                else:
                    parts.append(jnp.zeros_like(sl(0, 1)))
                a = 0
            parts.append(sl(a, min(b2_, rows_total)))
            if b2_ > rows_total:
                if pad_mode == "circular":
                    parts.append(sl(0, 1))
                elif pad_mode == "replicate":
                    parts.append(sl(rows_total - 1, rows_total))
                else:
                    parts.append(jnp.zeros_like(sl(0, 1)))
            return jnp.concatenate(parts, axis=1)

        def fix_cols(rolled, band, side, width, col_iota):
            if pad_mode == "circular":
                return rolled
            if side == "left":
                mask = col_iota == 0
                fix = band[:, :, 0:1] if pad_mode == "replicate" else 0.0
            else:
                mask = col_iota == width - 1
                fix = (
                    band[:, :, width - 1 : width]
                    if pad_mode == "replicate"
                    else 0.0
                )
            return jnp.where(mask, fix, rolled)

        def stencils(band, width, col_iota):
            left = fix_cols(
                pltpu.roll(band, 1, axis=2), band, "left", width, col_iota
            )
            right = fix_cols(
                pltpu.roll(band, width - 1, axis=2), band, "right", width,
                col_iota,
            )
            nrows = band.shape[1] - 2

            def nb(di, dj):
                arr = (left, band, right)[dj]
                return arr[:, di : di + nrows, :]

            center = band[:, 1 : 1 + nrows, :]
            return (
                center,
                _stencil_from(nb, SOBEL_X),
                _stencil_from(nb, SOBEL_Y),
                _stencil_from(nb, LAPLACIAN),
            )

        def run_step(src, dst):
            # ---- half-res state once per step: D_h @ state @ D_w^T ----
            for ch in range(c):
                tmp = jnp.dot(
                    dh_ref[:], src[0, ch], preferred_element_type=jnp.float32
                )
                half_ref[ch] = jnp.dot(
                    tmp, dwt_ref[:], preferred_element_type=jnp.float32
                )

            for t in range(n_tiles):
                r0 = t * tile_h
                s_lo, s_hi = tile_src[t]

                # scale 0
                band = band_rows(src, r0, r0 + tile_h, h)
                cen, sx, sy, lap = stencils(band, w, col_full)
                p_full = jnp.concatenate([cen, sx, sy, lap], axis=0)

                # scale 1: half-res percept band, upsampled
                hband = band_rows(half_ref, s_lo, s_hi, h2, src_rank4=False)
                hc, hsx, hsy, hlap = stencils(hband, w2, col_half)
                ph = jnp.concatenate([hc, hsx, hsy, hlap], axis=0)
                # W-up: [P4, ns, W/2] x [W/2, W] -> [P4, ns, W]
                ph_w = jax.lax.dot_general(
                    ph, uwt_ref[:],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # H-up: contract the ns dim with U_h rows of this tile
                u_slice = uh_ref[r0 : r0 + tile_h, s_lo:s_hi]  # [th, ns]
                p_half = jnp.einsum(
                    "ts,psw->ptw", u_slice, ph_w,
                    preferred_element_type=jnp.float32,
                )

                parts = [(p_full + p_half) * 0.5]
                if cond_ref is not None:
                    parts.append(cond_ref[0, :, r0 : r0 + tile_h, :])
                percept = jnp.concatenate(parts, axis=0)
                percept = percept.reshape(p_dim, tile_h * w).astype(compute_dtype)

                dx = _mlp_dx(percept, w1t_ref, b1_ref, w2t_ref, b2_ref,
                             c, f, tile_h, w, compute_dtype)
                mask = _draw_mask(tile_h, w, thr)
                dst[0, :, r0 : r0 + tile_h, :] = cen + dx * mask[None]

        def one_step(i, carry):
            @pl.when(i % 2 == 0)
            def _():
                run_step(out_ref, alt_ref)

            @pl.when(i % 2 == 1)
            def _():
                run_step(alt_ref, out_ref)

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)
        if n_steps % 2 == 1:
            out_ref[:] = alt_ref[:]

    return kernel


def _make_kernel(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    tile_h: int,
    has_cond: bool,
    update_rate: float,
    compute_dtype=jnp.float32,
    state_dtype=jnp.float32,
):
    c = cfg.c_in
    cc = cfg.c_cond if has_cond else 0
    p_dim = 4 * c + cc
    f = cfg.fc_dim
    thr = _uniform_threshold(update_rate)
    n_tiles = h // tile_h
    pad_mode = cfg.padding_mode

    def kernel(seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, *rest):
        if has_cond:
            cond_ref, out_ref, padded_ref, dma_sem = rest
        else:
            out_ref, padded_ref, dma_sem = rest
            cond_ref = None

        bidx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + bidx)

        # State lives in out_ref for the whole rollout; x stays in HBM and
        # is DMA'd in once (saves a second whole-state VMEM block).
        load = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[0], dma_sem)
        load.start()
        load.wait()

        if pad_mode == "zeros":
            padded_ref[:] = jnp.zeros_like(padded_ref)

        def one_step(_, carry):
            state = out_ref[0]  # [C, H, W]

            # ---- build padded snapshot [C, H+2, W+2] ----
            padded_ref[0, :, 1 : h + 1, 1 : w + 1] = state
            if pad_mode == "circular":
                padded_ref[0, :, 0, 1 : w + 1] = state[:, h - 1, :]
                padded_ref[0, :, h + 1, 1 : w + 1] = state[:, 0, :]
                padded_ref[0, :, :, 0] = padded_ref[0, :, :, w]
                padded_ref[0, :, :, w + 1] = padded_ref[0, :, :, 1]
            elif pad_mode == "replicate":
                padded_ref[0, :, 0, 1 : w + 1] = state[:, 0, :]
                padded_ref[0, :, h + 1, 1 : w + 1] = state[:, h - 1, :]
                padded_ref[0, :, :, 0] = padded_ref[0, :, :, 1]
                padded_ref[0, :, :, w + 1] = padded_ref[0, :, :, w]
            # zeros: halo stays zero; center rewritten every step.

            # ---- per row-tile: stencil -> MLP -> mask -> residual ----
            for t in range(n_tiles):
                r0 = t * tile_h

                def nb(di, dj):
                    return padded_ref[0, :, r0 + di : r0 + di + tile_h, dj : dj + w]

                center = out_ref[0, :, r0 : r0 + tile_h, :]
                sx = _stencil_from(nb, SOBEL_X)
                sy = _stencil_from(nb, SOBEL_Y)
                lap = _stencil_from(nb, LAPLACIAN)

                parts = [center, sx, sy, lap]
                if cond_ref is not None:
                    parts.append(cond_ref[0, :, r0 : r0 + tile_h, :])
                percept = jnp.concatenate(parts, axis=0)  # [P, tile_h, W]
                percept = percept.reshape(p_dim, tile_h * w).astype(compute_dtype)

                dx = _mlp_dx(percept, w1t_ref, b1_ref, w2t_ref, b2_ref,
                             c, f, tile_h, w, compute_dtype)
                mask = _draw_mask(tile_h, w, thr)
                new_tile = center.astype(jnp.float32) + dx * mask[None]
                out_ref[0, :, r0 : r0 + tile_h, :] = new_tile.astype(state_dtype)
            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_steps", "update_rate", "interpret", "compute_dtype",
        "state_dtype", "algo",
    ),
)
def fused_rollout_chw(
    params: dict,
    x: jnp.ndarray,
    seed: jnp.ndarray,
    cfg: NCAConfig,
    n_steps: int,
    cond: Optional[jnp.ndarray] = None,
    update_rate: Optional[float] = None,
    interpret: bool = False,
    compute_dtype: str = "float32",
    state_dtype: str = "float32",
    algo: str = "roll",
) -> jnp.ndarray:
    """Run n_steps fused NCA steps on CHW state.

    x: [B, C, H, W] float32; cond: optional [B, c_cond, H, W]; seed: int32
    scalar. Returns the new state [B, C, H, W] in ``state_dtype``. Supports
    perception_scales (0,) and (0, 1); the whole grid must fit in VMEM.
    ``fused_rollout_supported`` gates AUTO-selection (it returns False for
    multiscale — measured break-even with XLA on v5e); calling this
    function directly with scales (0, 1) is allowed and exact.

    ``compute_dtype='bfloat16'`` runs the MXU matmuls in bf16 with f32
    accumulation (state stays f32) — the deployment fast path (the
    reference's own WebGL runtime runs uint8-quantized weights, so bf16 is
    strictly tighter; residual adds still accumulate in f32).

    ``state_dtype='bfloat16'`` halves the resident buffers but is measured
    ~200x SLOWER on v5e: the step's off-by-one padded-buffer writes become
    misaligned bf16 (16,128)-tile relayouts. Kept for completeness/testing;
    use the default f32 state. Grids past the VMEM budget (512^2+) should
    use the XLA scan path, which still clears the 30 fps target by ~7x.
    """
    scales = tuple(cfg.perception_scales)
    assert scales in ((0,), (0, 1)), (
        "fused kernel supports perception_scales (0,) or (0, 1)"
    )
    b, c, h, w = x.shape
    assert c == cfg.c_in
    assert w % _LANE == 0, (
        f"fused kernel needs W % {_LANE} == 0 (lane-aligned percept flatten); "
        f"got W={w} — use the XLA rollout path"
    )
    rate = cfg.update_rate if update_rate is None else update_rate
    sdt = jnp.dtype(state_dtype)
    # multiscale tiles are smaller: the per-tile half-percept/upsample
    # temporaries share the VMEM budget
    tile_h = _pick_tile_h(h, w, 2048 if tuple(cfg.perception_scales) == (0, 1) else 4096)
    assert h % tile_h == 0, (
        f"H={h} has no row-tile divisor; trailing rows would be skipped — "
        f"use the XLA rollout path"
    )
    has_cond = cond is not None
    cdt = jnp.dtype(compute_dtype)
    assert algo in ("roll", "mat", "padded"), f"unknown kernel algo {algo!r}"

    # 'roll' = double-buffered Jacobi with per-tile lane rolls (default,
    # fastest); 'mat' = roll with the stencils folded into the first matmul
    # (stencil_folded_w1); 'padded' = padded-snapshot variant (required for
    # bf16 state).
    multiscale = scales == (0, 1)
    use_roll = (algo in ("roll", "mat") and sdt == jnp.float32) or multiscale
    mat_stencil = algo == "mat" and not multiscale
    assert not (mat_stencil and not use_roll), (
        "algo='mat' requires float32 state (the padded bf16-state kernel "
        "has no folded-stencil variant)"
    )
    if multiscale:
        assert sdt == jnp.float32 and h % 2 == 0 and w % 2 == 0
        assert tile_h * w <= 4096, (
            f"multiscale tile {tile_h}x{w} exceeds the VMEM-safe budget "
            "(Mosaic stack OOM) — use the XLA rollout path for this size"
        )
        kernel = _make_kernel_roll_ms(
            cfg, h, w, n_steps, tile_h, has_cond, rate, cdt
        )
    elif use_roll:
        kernel = _make_kernel_roll(
            cfg, h, w, n_steps, tile_h, has_cond, rate, cdt,
            mat_stencil=mat_stencil,
        )
    else:
        kernel = _make_kernel(
            cfg, h, w, n_steps, tile_h, has_cond, rate, cdt, sdt
        )
    x = x.astype(sdt)

    # Weights pre-transposed for the [F, K] x [K, N] orientation.
    w1 = params["w1"]
    if mat_stencil:
        w1 = stencil_folded_w1(w1, c)
    w1t = w1.T.astype(cdt)  # [F, P]
    b1 = params["b1"].astype(jnp.float32)
    w2t = params["w2"].T.astype(cdt)  # [C, F]
    b2 = params["b2"].astype(jnp.float32)

    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # x stays in HBM, DMA'd in-kernel
        rep(w1t.shape),
        rep(b1.shape),
        rep(w2t.shape),
        rep(b2.shape),
    ]
    args = [jnp.asarray(seed, jnp.int32).reshape(1), x, w1t, b1, w2t, b2]
    if multiscale:
        from vsnca_tpu.ops.grid_sample import resize_matrix

        d_h = jnp.asarray(resize_matrix(h // 2, h))  # [H/2, H]
        d_wt = jnp.asarray(resize_matrix(w // 2, w).T)  # [W, W/2]
        u_h = jnp.asarray(resize_matrix(h, h // 2))  # [H, H/2]
        u_wt = jnp.asarray(resize_matrix(w, w // 2).T)  # [W/2, W]
        for m in (d_h, d_wt, u_h, u_wt):
            in_specs.append(rep(m.shape))
            args.append(m)
    if has_cond:
        in_specs.append(block(cond.shape[1:]))
        args.append(cond.astype(sdt))

    cc_actual = cfg.c_cond if has_cond else 0
    flops_step = (
        2 * (4 * c + cc_actual) * cfg.fc_dim * h * w
        + 2 * cfg.fc_dim * c * h * w
    )
    if multiscale:
        # D/U resampling matmuls: downsample state + upsample 4C percept
        flops_step += 2 * c * (h // 2) * w * (h + w // 2)
        flops_step += 2 * 4 * c * h * w * (w // 2 + h // 2) // 2
    # Kernel matmuls are validated at DEFAULT matmul precision; a global
    # 'highest' setting would expand them into multi-pass sequences whose
    # temporaries blow Mosaic's 16 MB scoped-vmem stack (measured: the
    # 128px flat backward needs 21.7 MB under 'highest'). Pin it here.
    with jax.default_matmul_precision("default"):
        out = pl.pallas_call(
            kernel,
            grid=(b,),
            out_shape=jax.ShapeDtypeStruct((b, c, h, w), sdt),
            in_specs=in_specs,
            out_specs=block((c, h, w)),
            scratch_shapes=(
                [
                    pltpu.VMEM(
                        (1, c, h, w) if use_roll else (1, c, h + 2, w + 2), sdt
                    )
                ]
                + ([pltpu.VMEM((c, h // 2, w // 2), jnp.float32)] if multiscale else [])
                + [pltpu.SemaphoreType.DMA(())]
            ),
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * flops_step,
                bytes_accessed=2 * b * c * h * w * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    return out


def fused_rollout_supported(
    cfg: NCAConfig, h: int, w: int, state_dtype: str = "float32"
) -> bool:
    """True when the whole-grid-in-VMEM kernel applies."""
    scales = tuple(cfg.perception_scales)
    if scales not in ((0,), (0, 1)):
        return False
    if w % _LANE != 0:
        # W maps to lanes; the [P, tile_h, W] -> [P, tile_h*W] flatten needs
        # lane-aligned rows (Mosaic rejects the relayout otherwise).
        return False
    if scales == (0, 1):
        # The multiscale kernel exists and is exact (test_pallas.py), but on
        # v5e it measures break-even with the XLA path (107 fps at
        # 192x256xc16 vs a proportional ~107 fps XLA): the resampling
        # matmuls + small tiles offset the VMEM-residency win, and Mosaic's
        # stack allocator overflows 16 MB at 256^2xc16 (18.1 MB measured).
        # Auto-selection therefore stays off; call fused_rollout_chw
        # directly to use it.
        return False
    tile_h = _pick_tile_h(h, w)
    if h % tile_h != 0:
        return False
    sbytes = jnp.dtype(state_dtype).itemsize
    est = vmem_bytes_estimate(cfg.c_in, h, w, cfg.fc_dim, tile_h, sbytes)
    return est < 13 * 2**20


def fused_rollout(
    params: dict,
    x_nhwc: jnp.ndarray,
    seed,
    cfg: NCAConfig,
    n_steps: int,
    cond_nhwc: Optional[jnp.ndarray] = None,
    update_rate: Optional[float] = None,
    compute_dtype: str = "float32",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC wrapper: returns (state, rgb) like ``dynca_rollout``, using the
    fastest supported fused kernel for the shape (``select_rollout_kernel``;
    falls back to the CHW roll kernel, which also covers multiscale)."""
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    cond = (
        jnp.transpose(cond_nhwc, (0, 3, 1, 2)) if cond_nhwc is not None else None
    )
    h, w = x.shape[2], x.shape[3]
    kernel = select_rollout_kernel(cfg, h, w)
    if kernel is None:
        # None means "use the XLA scan" (multiscale past the roll kernel's
        # VMEM cap, replicate padding at streaming sizes, odd widths).
        # Dispatching the roll kernel anyway would fail the scoped-VMEM
        # compile, so degrade gracefully to the lax.scan rollout instead.
        from vsnca_tpu.models.dynca import dynca_rollout

        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32))
        return dynca_rollout(
            params, x_nhwc, key, cfg, n_steps, cond=cond_nhwc,
            remat="none", update_rate=update_rate,
        )
    out = ROLLOUT_KERNELS[kernel](
        params, x, seed, cfg, n_steps, cond, update_rate,
        compute_dtype=compute_dtype,
    )
    state = jnp.transpose(out, (0, 2, 3, 1))
    return state, state[..., : cfg.c_out] * 2.0


# ------------------------------------------------------------------------
# HBM-streaming row-band kernel: grids past the whole-state-in-VMEM cap
# (512^2+). Per step, row bands stream HBM->VMEM with double-buffered DMA
# (band b+1 loads while band b computes), the fused step runs on sub-tiles
# in VMEM, and results stream back to the alternate HBM buffer. HBM traffic
# is exactly one state read + one state write per step — the XLA scan path
# additionally materializes the 4C percept and FC hidden tensors to HBM
# every step, which is the bandwidth this kernel removes.
# ------------------------------------------------------------------------


def _pick_band_h(h: int, w: int, c: int, budget_bytes: int = 8 * 2**20) -> int:
    """Largest divisor of H (at most H/2: the kernel needs >= 2 bands so a
    band's two halos never both wrap) whose double-buffered buffers fit."""
    best = 8
    row_bytes = c * _round_up(w, _LANE) * 4
    for bh in range(8, h // 2 + 1, 8):
        if h % bh == 0 and (4 * bh + 32) * row_bytes <= budget_bytes:
            best = bh
    return best


def _make_kernel_stream(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    band_h: int,
    tile_h: int,
    has_cond: bool,
    update_rate: float,
    compute_dtype=jnp.float32,
):
    """One whole-rollout kernel; state ping-pongs between two HBM buffers.

    Circular padding only: the W wrap is lane rolls; the H wrap rows ride
    in the same banded DMAs (boundary bands issue one extra 1-row DMA)."""
    c = cfg.c_in
    cc = cfg.c_cond if has_cond else 0
    p_dim = 4 * c + cc
    f = cfg.fc_dim
    thr = _uniform_threshold(update_rate)
    n_bands = h // band_h
    n_tiles = band_h // tile_h
    assert cfg.padding_mode == "circular"

    def kernel(seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, *rest):
        if has_cond:
            (cond_ref, out_ref, tmp_ref, band_in, band_out,
             load_sem, store_sem, copy_sem) = rest
        else:
            (out_ref, tmp_ref, band_in, band_out,
             load_sem, store_sem, copy_sem) = rest
            cond_ref = None

        bidx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + bidx)

        init = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[bidx], copy_sem)
        init.start()
        init.wait()

        def start_load(src, b, slot):
            """DMA band b's rows + 8-row halo blocks into band_in[slot];
            returns the started descriptors (waits must use the SAME
            descriptors — DMA semaphores count bytes, so a mismatched dummy
            deadlocks). All row offsets/counts are multiples of 8: 1-row HBM
            memref slices crash the Mosaic compile helper.

            band_in rows: [8-row top block | band | 8-row bottom block]; the
            compute window is rows [7, band_h + 9)."""
            r0 = b * band_h
            dmas = []
            if 0 < b < n_bands - 1:
                dmas.append(pltpu.make_async_copy(
                    src.at[:, pl.ds(r0 - 8, band_h + 16), :],
                    band_in.at[slot], load_sem.at[slot],
                ))
            elif b == 0:  # top block wraps to rows [h-8, h)
                dmas.append(pltpu.make_async_copy(
                    src.at[:, pl.ds(h - 8, 8), :],
                    band_in.at[slot, :, 0:8, :], load_sem.at[slot],
                ))
                dmas.append(pltpu.make_async_copy(
                    src.at[:, pl.ds(0, band_h + 8), :],
                    band_in.at[slot, :, 8 : band_h + 16, :], load_sem.at[slot],
                ))
            else:  # last band: bottom block wraps to rows [0, 8)
                dmas.append(pltpu.make_async_copy(
                    src.at[:, pl.ds(r0 - 8, band_h + 8), :],
                    band_in.at[slot, :, 0 : band_h + 8, :], load_sem.at[slot],
                ))
                dmas.append(pltpu.make_async_copy(
                    src.at[:, pl.ds(0, 8), :],
                    band_in.at[slot, :, band_h + 8 : band_h + 16, :],
                    load_sem.at[slot],
                ))
            for d in dmas:
                d.start()
            return dmas

        def compute_band(b, slot):
            """band_in[slot] window rows [7, band_h+9) -> band_out[slot]."""
            r0 = b * band_h
            band_full = band_in[slot, :, 7 : band_h + 9, :]
            left = pltpu.roll(band_full, 1, axis=2)
            right = pltpu.roll(band_full, w - 1, axis=2)
            for t in range(n_tiles):
                t0 = t * tile_h  # row offset within the band (halo at 0)

                def nb(di, dj):
                    arr = (left, band_full, right)[dj]
                    return arr[:, t0 + di : t0 + di + tile_h, :]

                center = band_full[:, t0 + 1 : t0 + 1 + tile_h, :]
                sx = _stencil_from(nb, SOBEL_X)
                sy = _stencil_from(nb, SOBEL_Y)
                lap = _stencil_from(nb, LAPLACIAN)
                parts = [center, sx, sy, lap]
                if cond_ref is not None:
                    parts.append(
                        cond_ref[0, :, r0 + t0 : r0 + t0 + tile_h, :]
                    )
                percept = jnp.concatenate(parts, axis=0)
                percept = percept.reshape(p_dim, tile_h * w).astype(compute_dtype)
                dx = _mlp_dx(percept, w1t_ref, b1_ref, w2t_ref, b2_ref,
                             c, f, tile_h, w, compute_dtype)
                mask = _draw_mask(tile_h, w, thr)
                band_out[slot, :, t0 : t0 + tile_h, :] = center + dx * mask[None]

        def store_band(dst, b, slot):
            dma = pltpu.make_async_copy(
                band_out.at[slot],
                dst.at[:, pl.ds(b * band_h, band_h), :],
                store_sem.at[slot],
            )
            dma.start()
            return dma

        def run_step(src, dst):
            loads = [None, None]
            stores = [None, None]
            loads[0] = start_load(src, 0, 0)
            for b in range(n_bands):
                slot = b % 2
                if b + 1 < n_bands:
                    loads[1 - slot] = start_load(src, b + 1, 1 - slot)
                for d in loads[slot]:
                    d.wait()
                if stores[slot] is not None:
                    stores[slot].wait()  # band_out[slot] free to overwrite
                compute_band(b, slot)
                stores[slot] = store_band(dst, b, slot)
            # all outstanding stores must land before the next step reads dst
            for st in stores:
                if st is not None:
                    st.wait()

        def one_step(i, carry):
            @pl.when(i % 2 == 0)
            def _():
                run_step(out_ref.at[bidx], tmp_ref.at[0])

            @pl.when(i % 2 == 1)
            def _():
                run_step(tmp_ref.at[0], out_ref.at[bidx])

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)
        if n_steps % 2 == 1:
            fin = pltpu.make_async_copy(
                tmp_ref.at[0], out_ref.at[bidx], copy_sem
            )
            fin.start()
            fin.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "update_rate", "interpret",
                     "compute_dtype"),
)
def fused_rollout_stream_chw(
    params: dict,
    x: jnp.ndarray,
    seed: jnp.ndarray,
    cfg: NCAConfig,
    n_steps: int,
    cond: Optional[jnp.ndarray] = None,
    update_rate: Optional[float] = None,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """HBM-streaming fused rollout for grids past the VMEM-resident cap.

    x: [B, C, H, W] f32, circular padding, perception_scales (0,). The
    state ping-pongs between the output buffer and an HBM scratch; only row
    bands (+1-row halos) ever live in VMEM."""
    assert tuple(cfg.perception_scales) == (0,)
    assert cfg.padding_mode == "circular", "streaming kernel is circular-only"
    b, c, h, w = x.shape
    assert c == cfg.c_in and w % _LANE == 0
    rate = cfg.update_rate if update_rate is None else update_rate
    cdt = jnp.dtype(compute_dtype)
    band_h = _pick_band_h(h, w, c)
    tile_h = _pick_tile_h(band_h, w, 2048)
    assert h % band_h == 0 and band_h % tile_h == 0
    assert h // band_h >= 2, "streaming kernel needs >= 2 bands"

    w1t = params["w1"].T.astype(cdt)
    b1 = params["b1"].astype(jnp.float32)
    w2t = params["w2"].T.astype(cdt)
    b2 = params["b2"].astype(jnp.float32)

    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        rep(w1t.shape), rep(b1.shape), rep(w2t.shape), rep(b2.shape),
    ]
    args = [jnp.asarray(seed, jnp.int32).reshape(1), x, w1t, b1, w2t, b2]
    if cond is not None:
        in_specs.append(block(cond.shape[1:]))
        args.append(cond.astype(jnp.float32))

    cc = cfg.c_cond if cond is not None else 0
    flops_step = 2 * h * w * ((4 * c + cc) * cfg.fc_dim + cfg.fc_dim * c)
    # The ping-pong partner is a second ANY-space OUTPUT (Mosaic does not
    # allow HBM scratch allocations); it is discarded by the wrapper.
    # Kernel matmuls are validated at DEFAULT matmul precision; a global
    # 'highest' setting would expand them into multi-pass sequences whose
    # temporaries blow Mosaic's 16 MB scoped-vmem stack (measured: the
    # 128px flat backward needs 21.7 MB under 'highest'). Pin it here.
    with jax.default_matmul_precision("default"):
        out, _ = pl.pallas_call(
            _make_kernel_stream(
                cfg, h, w, n_steps, band_h, tile_h, cond is not None, rate, cdt
            ),
            grid=(b,),
            out_shape=(
                jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
                jax.ShapeDtypeStruct((1, c, h, w), jnp.float32),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, c, band_h + 16, w), jnp.float32),  # band + 8-row halo blocks
                pltpu.VMEM((2, c, band_h, w), jnp.float32),      # band out
                pltpu.SemaphoreType.DMA((2,)),                   # loads
                pltpu.SemaphoreType.DMA((2,)),                   # stores
                pltpu.SemaphoreType.DMA(()),                     # whole-state copies
            ],
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * flops_step,
                bytes_accessed=2 * b * n_steps * c * h * w * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    return out


# ------------------------------------------------------------------------
# Flat-layout kernel: state as [C_pad, H*W] with ALL pixels on the lane
# axis. Rationale (layout analysis of the 'roll' kernel):
#   - the [C, tile_h, W] -> [4C+cc, tile_h*W] percept flatten is a
#     sublane->lane relayout Mosaic must materialize every tile, every step;
#   - the H-neighbor taps band[:, di:di+th, :] are sublane-MISALIGNED views
#     (di = 0..2) that each force a shifted relayout.
# In flat layout both disappear: H-neighbor taps become lane-tile-aligned
# views (row offsets are multiples of W, and W % 128 == 0), the percept is
# BORN flat and sublane-aligned (C padded to a multiple of 8), and the only
# lane shuffles left are the two +/-1 W-neighbor rolls plus two ALIGNED
# correction rolls for the row-boundary columns. Channels pad C -> ceil8(C)
# (zero rows/cols in w1/w2 keep pad channels exactly zero).
# ------------------------------------------------------------------------


def _pick_tile_rows(h: int, w: int, target_n: int = 4096) -> int:
    """Largest divisor of H whose row-tile pixel count fits the MXU-friendly
    flat-tile budget. No sublane alignment needed: rows live on lanes."""
    best = 1
    for tr in range(1, h + 1):
        if h % tr == 0 and tr * w <= target_n:
            best = tr
    return best


def _draw_mask_flat(n: int, thr: int):
    bits = pltpu.prng_random_bits((1, n))
    u24 = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
    )
    return (u24 >= jnp.uint32(thr)).astype(jnp.float32)


def _flat_neighbors(band, n, w, pad_mode, is_col0, is_colw1):
    """(left, band, right) lane-rolled views of a flat band [*, n + 2w].

    W-neighbors are +/-1 lane rolls; the row-boundary columns get ALIGNED
    correction rolls (offsets are multiples of W, and W % 128 == 0)."""
    band_len = n + 2 * w
    left = pltpu.roll(band, 1, axis=1)
    right = pltpu.roll(band, band_len - 1, axis=1)
    if pad_mode == "circular":
        lfix = pltpu.roll(left, band_len - w, axis=1)
        rfix = pltpu.roll(right, w, axis=1)
    elif pad_mode == "replicate":
        lfix = band
        rfix = band
    else:
        lfix = jnp.zeros_like(band)
        rfix = lfix
    left = jnp.where(is_col0, lfix, left)
    right = jnp.where(is_colw1, rfix, right)
    return left, band, right


def _flat_percept(band, cond_tile, n, w, pad_mode, compute_dtype,
                  is_col0, is_colw1):
    """(center [cp, n], percept [P, n]) from a flat band [cp, n + 2w].

    All H-neighbor taps are lane-tile-aligned views (row offsets are
    multiples of W) and the percept is born flat and sublane-aligned — no
    relayouts anywhere."""
    left, band, right = _flat_neighbors(band, n, w, pad_mode, is_col0,
                                        is_colw1)

    def nb(di, dj):
        arr = (left, band, right)[dj]
        return arr[:, di * w : di * w + n]

    center = band[:, w : w + n]
    parts = [
        center,
        _stencil_from(nb, SOBEL_X),
        _stencil_from(nb, SOBEL_Y),
        _stencil_from(nb, LAPLACIAN),
    ]
    if cond_tile is not None:
        parts.append(cond_tile)
    percept = jnp.concatenate(parts, axis=0).astype(compute_dtype)
    return center, percept


_MS_HALO = 6  # state rows of halo each side for the scale-(0,1) pipeline
#             (the percept/adjoint reach is 5 rows; the 6th gives every
#              framed VIEW below in-bounds slack, checked by trace-time
#              asserts)


def _ms_masks_base(n: int, w: int, h: int, hb: int = _MS_HALO):
    """Tile-INVARIANT part of the ms mask bundle on a [*, n + 2*hb*w] band:
    column predicates, row parity (valid for EVEN tile offsets — the ms
    planner enforces even tile_rows), and the modular row-index iota the
    per-tile masks compare against. Computed once per kernel invocation
    and closed over by the tile loops (the full bundle costs ~10 vector
    ops; rebuilding it per tile per step measurably taxed the 64-tile
    256^2 kernels)."""
    nb = n + 2 * hb * w
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) % w
    rowi = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) // w
    scol = jax.lax.broadcasted_iota(jnp.int32, (1, n + 2 * w), 1) % w
    f1i = jax.lax.broadcasted_iota(jnp.int32, (1, n + 4 * w), 1)
    return {
        "col0": col == 0,
        "colw1": col == w - 1,
        "col_lt2": col < 2,
        "col_gew2": col >= w - 2,
        "even_col": col % 2 == 0,
        "even_row": (rowi - hb) % 2 == 0,  # == global-row parity, t0 even
        "rowi_mod_h": rowi % h,
        "sub_col0": scol == 0,
        "sub_colw1": scol == w - 1,
        # support window of the view-based ms adjoint's U^T frame
        # (pallas_train._flat_percept_ms_adj): lanes past n+3w of the
        # [4w, n+8w) frame are support-free and re-zeroed after the U_W^T
        # lane rolls wrap leading lanes into them.
        "f1_supp": f1i < n + 3 * w,
    }


def _ms_masks_tile(base: dict, t0, h: int):
    """Complete the bundle for the tile whose first interior row is GLOBAL
    row ``t0`` (may be traced; must be EVEN): two vector compares against
    the precomputed modular row iota."""
    rm = base["rowi_mod_h"]
    hb = _MS_HALO
    return dict(
        base,
        grow0=rm == jnp.mod(hb - t0, h),
        growlast=rm == jnp.mod(hb - t0 + h - 1, h),
    )


def _ms_masks(n: int, w: int, t0, h: int, hb: int = _MS_HALO):
    """One-shot bundle (base + tile) — convenience for single-tile callers
    and tests; kernels hoist ``_ms_masks_base`` out of their loops.
    ``t0`` may be traced but must be EVEN (even tile_rows)."""
    return _ms_masks_tile(_ms_masks_base(n, w, h, hb), t0, h)


def _flat_percept_ms(band, cond_tile, n, w, compute_dtype, msk,
                     wide_up: bool = True):
    """(center [cp, n], percept [P, n]) for perception_scales == (0, 1)
    from a flat band [cp, n + 2*_MS_HALO*w] (circular padding).

    Scale 1 == resize_bilinear 2x down -> perceive -> resize_bilinear 2x up
    (ops/perception.py::perceive_multiscale, reference
    ConditioneDyNCA/models/dynca.py:98-115) computed WITHOUT materializing
    the half grid: all values live at 'anchor' positions (even global
    row & col) of the full-res flat band:
      * the 2x half-pixel-center downsample at integer factor 2 is the
        exact 2x2 cell average, evaluated at anchors;
      * the half-res 3x3 stencils read anchors +-2 rows/lanes under
        circular wrap (W-wrap corrections masked at the row-boundary
        columns);
      * the 2x upsample is the 0.75/0.25 two-tap interpolation with edge
        CLAMP at global rows/cols 0 and last (align_corners=False).
    Non-anchor lanes carry garbage through the chain; the upsample only
    ever reads anchors, so it never surfaces.

    PERF SHAPE (the v5e finding that forced this form, docs/ROUND3.md):
    pltpu.roll costs are LATENCY-bound (~us each), so every row-multiple
    shift here is a framed VIEW (an aligned slice, fused into its consumer
    for free) and only the irreducible +-1/+-2 LANE shifts are rolls — 6
    per call in wide mode (bp1, dm2, dp2, and 3 in the 4-block-wide
    upsample) vs ~34 in the naive one-roll-per-tap form. Frame bounds are
    asserted at trace time. ``wide_up=False`` runs the upsample per cp
    block (12 narrow rolls) for callers tight on scoped VMEM; wide and
    narrow are elementwise-identical (same per-row expression trees), so
    forward/recompute replay stays bit-exact across the choice."""
    cp = band.shape[0]
    hb = _MS_HALO
    nb = band.shape[-1]
    assert nb == n + 2 * hb * w

    def sh(x, k):
        """out[p] = x[p + k] (circular lane shift on x's own frame)."""
        L = x.shape[-1]
        return pltpu.roll(x, (L - k) % L, axis=1)

    def fv(x, x_off, off, L):
        """View of frame-(x_off) array x at band positions [off, off+L)."""
        s = off - x_off
        assert 0 <= s and s + L <= x.shape[-1], (s, L, x.shape)
        return x[:, s : s + L]

    def mv(name, off, L):
        return fv(msk[name], 0, off, L)

    # ---- scale 0: the 1-row-halo percept on the inner sub-band ----
    sub = fv(band, 0, (hb - 1) * w, n + 2 * w)
    center, p0 = _flat_percept(
        sub, None, n, w, "circular", jnp.float32,
        msk["sub_col0"], msk["sub_colw1"],
    )

    # ---- scale 1 ----
    # D: 2x2 cell average at anchors. Frame off 0, len n+11w.
    Ld = nb - w
    bp1 = sh(band, 1)
    d = 0.25 * (fv(band, 0, 0, Ld) + fv(bp1, 0, 0, Ld)
                + fv(band, 0, w, Ld) + fv(bp1, 0, w, Ld))
    # Lane-shifted tap classes with the half-res W-wrap corrections folded
    # in (masks are column predicates, so they commute with row offsets).
    dm2 = sh(d, -2)  # dm2[i] = d[i-2]
    dp2 = sh(d, 2)   # dp2[i] = d[i+2]
    LM = Ld - w      # n+10w
    # M0[p] = lt2[p] ? d[p+w-2] : d[p-2]   (frame off 0)
    m0 = jnp.where(mv("col_lt2", 0, LM),
                   fv(dm2, 0, w, LM), fv(dm2, 0, 0, LM))
    # M2[p] = gew2[p] ? d[p+2-w] : d[p+2]  (frame off w)
    m2 = jnp.where(mv("col_gew2", w, LM),
                   fv(dp2, 0, 0, LM), fv(dp2, 0, w, LM))

    # S: half-res 3x3 stencils as pure framed views of the tap classes:
    # tap(di,dj)[p] = class_dj[p + 2(di-1)w]. s1 frame off 3w, len n+5w.
    Ls = n + 5 * w
    classes = ((m0, 0), (d, 0), (m2, w))

    def stencil(K):
        acc = None
        for di in range(3):
            for dj in range(3):
                co = K[di][dj]
                if not co:
                    continue
                arr, aoff = classes[dj]
                v = float(co) * fv(arr, aoff, 3 * w + 2 * (di - 1) * w, Ls)
                acc = v if acc is None else acc + v
        return acc

    raw = fv(d, 0, 3 * w, Ls)
    blocks = [raw, stencil(SOBEL_X), stencil(SOBEL_Y), stencil(LAPLACIAN)]

    def up(s):
        """2x upsample of anchor-valued [*, Ls] (frame off 3w) -> [*, n]
        (frame off 6w = the tile interior).
        U over W: even col p -> 0.75 s[p] + 0.25 s[p-2] (clamp at col 0);
        odd col p -> 0.75 s[p-1] + 0.25 s[p+1] (clamp at col w-1).
        U over H: even global row -> 0.75 u[r] + 0.25 u[r-2] (clamp at
        global row 0); odd -> 0.75 u[r-1] + 0.25 u[r+1] (clamp at h-1) —
        all row taps are framed views."""
        sm2 = jnp.where(mv("col0", 3 * w, Ls), s, sh(s, -2))
        sm1 = sh(s, -1)
        sp1 = jnp.where(mv("colw1", 3 * w, Ls), sm1, sh(s, 1))
        uw = jnp.where(mv("even_col", 3 * w, Ls),
                       0.75 * s + 0.25 * sm2, 0.75 * sm1 + 0.25 * sp1)
        u0 = fv(uw, 3 * w, 6 * w, n)
        um1 = fv(uw, 3 * w, 5 * w, n)
        um2 = jnp.where(mv("grow0", 6 * w, n), u0, fv(uw, 3 * w, 4 * w, n))
        up1 = jnp.where(mv("growlast", 6 * w, n), um1,
                        fv(uw, 3 * w, 7 * w, n))
        return jnp.where(mv("even_row", 6 * w, n),
                         0.75 * u0 + 0.25 * um2, 0.75 * um1 + 0.25 * up1)

    if wide_up:
        p1 = up(jnp.concatenate(blocks, axis=0))
        percept = 0.5 * (p0 + p1)
    else:
        percept = jnp.concatenate(
            [0.5 * (p0[k * cp : (k + 1) * cp] + up(b))
             for k, b in enumerate(blocks)],
            axis=0,
        )
    if cond_tile is not None:
        percept = jnp.concatenate([percept, cond_tile], axis=0)
    return center, percept.astype(compute_dtype)


def _flat_tile_update(
    band, cond_tile, w1t_ref, b1_ref, w2t_ref, b2_ref,
    cp, f, n, w, thr, pad_mode, compute_dtype, is_col0, is_colw1,
):
    """One fused NCA step on a flat band [cp, n + 2w] (1-row halos): taps ->
    stencils -> MLP -> stochastic residual. Returns the new center [cp, n]."""
    center, percept = _flat_percept(
        band, cond_tile, n, w, pad_mode, compute_dtype, is_col0, is_colw1
    )
    hid = jnp.maximum(
        jnp.dot(w1t_ref[:], percept, preferred_element_type=jnp.float32)
        + b1_ref[:].reshape(f, 1),
        0.0,
    ).astype(compute_dtype)
    dx = (
        jnp.dot(w2t_ref[:], hid, preferred_element_type=jnp.float32)
        + b2_ref[:].reshape(cp, 1)
    )
    mask = _draw_mask_flat(n, thr)
    return center + dx * mask


def _flat_tile_update_ms(
    band, cond_tile, w1t_ref, b1_ref, w2t_ref, b2_ref,
    cp, f, n, w, thr, compute_dtype, msk,
):
    """One fused NCA step on a flat band [cp, n + 2*_MS_HALO*w] with
    perception_scales (0, 1): ms percept -> MLP -> stochastic residual.
    ``msk`` = _ms_masks(n, w, t0, h). Returns the new center [cp, n]."""
    center, percept = _flat_percept_ms(
        band, cond_tile, n, w, compute_dtype, msk
    )
    hid = jnp.maximum(
        jnp.dot(w1t_ref[:], percept, preferred_element_type=jnp.float32)
        + b1_ref[:].reshape(f, 1),
        0.0,
    ).astype(compute_dtype)
    dx = (
        jnp.dot(w2t_ref[:], hid, preferred_element_type=jnp.float32)
        + b2_ref[:].reshape(cp, 1)
    )
    mask = _draw_mask_flat(n, thr)
    return center + dx * mask


def _make_kernel_flat(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    tile_rows: int,
    cp: int,
    ccp: int,
    update_rate: float,
    compute_dtype=jnp.float32,
):
    f = cfg.fc_dim
    thr = _uniform_threshold(update_rate)
    n_tiles = h // tile_rows
    n = tile_rows * w  # flat tile length
    band_len = n + 2 * w
    hw = h * w
    pad_mode = cfg.padding_mode
    has_cond = ccp > 0

    def kernel(seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, *rest):
        if has_cond:
            cond_ref, out_ref, alt_ref, dma_sem = rest
        else:
            out_ref, alt_ref, dma_sem = rest
            cond_ref = None

        bidx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + bidx)

        load = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[0], dma_sem)
        load.start()
        load.wait()

        # Row-boundary column masks, constant across tiles/steps.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, band_len), 1) % w
        is_col0 = col == 0
        is_colw1 = col == w - 1

        def band_of(src, t):
            """[cp, band_len] = rows [t*tr - 1, (t+1)*tr + 1) flat, with the
            H boundary rows resolved by the padding mode. Interior tiles are
            pure aligned views."""
            o = t * n
            parts = []
            if t == 0:
                if pad_mode == "circular":
                    parts.append(src[0, :, hw - w : hw])
                elif pad_mode == "replicate":
                    parts.append(src[0, :, 0:w])
                else:
                    parts.append(jnp.zeros((cp, w), src.dtype))
                lo = 0
            else:
                lo = o - w
            hi = o + n + w
            if t == n_tiles - 1:
                parts.append(src[0, :, lo:hw])
                if pad_mode == "circular":
                    parts.append(src[0, :, 0:w])
                elif pad_mode == "replicate":
                    parts.append(src[0, :, hw - w : hw])
                else:
                    parts.append(jnp.zeros((cp, w), src.dtype))
            else:
                parts.append(src[0, :, lo:hi])
            if len(parts) == 1:
                return parts[0]
            return jnp.concatenate(parts, axis=1)

        def run_step(src, dst):
            for t in range(n_tiles):
                o = t * n
                band = band_of(src, t)
                cond_tile = (
                    cond_ref[0, :, o : o + n] if cond_ref is not None else None
                )
                dst[0, :, o : o + n] = _flat_tile_update(
                    band, cond_tile, w1t_ref, b1_ref, w2t_ref, b2_ref,
                    cp, f, n, w, thr, pad_mode, compute_dtype,
                    is_col0, is_colw1,
                )

        def one_step(i, carry):
            @pl.when(i % 2 == 0)
            def _():
                run_step(out_ref, alt_ref)

            @pl.when(i % 2 == 1)
            def _():
                run_step(alt_ref, out_ref)

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)
        if n_steps % 2 == 1:
            out_ref[:] = alt_ref[:]

    return kernel


def _round8(x: int) -> int:
    return _round_up(x, 8)


def _flat_pad_weights(params: dict, c: int, cp: int, cc: int, ccp: int,
                      compute_dtype):
    """(w1t [F, P], b1, w2t [cp, F], b2) with the filter blocks of w1 padded
    C -> cp (and cond cc -> ccp) by zero rows, w2/b2 padded by zero columns —
    pad channels stay exactly zero through the update."""
    cdt = jnp.dtype(compute_dtype)
    w1 = params["w1"]
    blocks = [
        jnp.pad(w1[k * c : (k + 1) * c], ((0, cp - c), (0, 0)))
        for k in range(4)
    ]
    if cc:
        blocks.append(jnp.pad(w1[4 * c :], ((0, ccp - cc), (0, 0))))
    w1t = jnp.concatenate(blocks, axis=0).T.astype(cdt)
    b1 = params["b1"].astype(jnp.float32)
    w2t = jnp.pad(params["w2"], ((0, 0), (0, cp - c))).T.astype(cdt)
    b2 = jnp.pad(params["b2"], (0, cp - c)).astype(jnp.float32)
    return w1t, b1, w2t, b2


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "update_rate", "interpret",
                     "compute_dtype"),
)
def fused_rollout_flat_chw(
    params: dict,
    x: jnp.ndarray,
    seed: jnp.ndarray,
    cfg: NCAConfig,
    n_steps: int,
    cond: Optional[jnp.ndarray] = None,
    update_rate: Optional[float] = None,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Flat-layout fused rollout: same contract as ``fused_rollout_chw``
    (x [B, C, H, W] f32 -> [B, C, H, W]), perception_scales (0,) only.
    The state lives in VMEM as [ceil8(C), H*W] for the whole rollout."""
    assert tuple(cfg.perception_scales) == (0,)
    b, c, h, w = x.shape
    assert c == cfg.c_in and w % _LANE == 0
    rate = cfg.update_rate if update_rate is None else update_rate
    cdt = jnp.dtype(compute_dtype)
    cp = _round8(c)
    cc = cfg.c_cond if cond is not None else 0
    ccp = _round8(cc) if cc else 0
    p_dim = 4 * cp + ccp
    hw = h * w
    # Tile-size sweep at 256^2: 2048-px tiles are 45% slower; 4096 and
    # larger are equivalent for f32 — but bf16 compute DEGRADES 2x at
    # quarter-grid tiles (the [P, 16384] bf16 percept conversion hits a
    # slow Mosaic path), so stay at the 4096-px default.
    tile_rows = _pick_tile_rows(h, w)
    n = tile_rows * w

    xf = jnp.pad(x, ((0, 0), (0, cp - c), (0, 0), (0, 0))).reshape(b, cp, hw)
    w1t, b1, w2t, b2 = _flat_pad_weights(params, c, cp, cc, ccp, cdt)

    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        rep(w1t.shape), rep(b1.shape), rep(w2t.shape), rep(b2.shape),
    ]
    args = [jnp.asarray(seed, jnp.int32).reshape(1), xf, w1t, b1, w2t, b2]
    if cc:
        cf = jnp.pad(cond, ((0, 0), (0, ccp - cc), (0, 0), (0, 0))).reshape(
            b, ccp, hw
        )
        in_specs.append(
            pl.BlockSpec((1, ccp, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(cf.astype(jnp.float32))

    flops_step = 2 * hw * (p_dim * cfg.fc_dim + cfg.fc_dim * cp)
    # Kernel matmuls are validated at DEFAULT matmul precision; a global
    # 'highest' setting would expand them into multi-pass sequences whose
    # temporaries blow Mosaic's 16 MB scoped-vmem stack (measured: the
    # 128px flat backward needs 21.7 MB under 'highest'). Pin it here.
    with jax.default_matmul_precision("default"):
        out = pl.pallas_call(
            _make_kernel_flat(cfg, h, w, n_steps, tile_rows, cp, ccp, rate, cdt),
            grid=(b,),
            out_shape=jax.ShapeDtypeStruct((b, cp, hw), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, cp, hw), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, cp, hw), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * flops_step,
                bytes_accessed=2 * b * cp * hw * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    return out.reshape(b, cp, h, w)[:, :c]


def _make_kernel_stream_flat(
    cfg: NCAConfig,
    h: int,
    w: int,
    n_steps: int,
    band_h: int,
    tile_rows: int,
    cp: int,
    ccp: int,
    update_rate: float,
    compute_dtype=jnp.float32,
):
    """HBM-streaming flat-layout rollout: bands of ``band_h`` rows stream
    through VMEM as [cp, (band_h + 2) * W] lane ranges with double-buffered
    DMA, the flat tile update runs per ``tile_rows`` sub-tile, and the state
    ping-pongs between two HBM buffers.

    The band walk is a PAIR-UNROLLED ``fori_loop`` (bands 2k/2k+1 per body
    with STATIC buffer slots 0/1): program size is one body instead of
    n_bands unrolled iterations — the 2048^2 grid compiled for ~15 minutes
    through the remote Mosaic compiler as 256 unrolled bands
    (docs/ROUND2.md), seconds as a loop. The state ping-pong buffers live
    in HBM as [n_bands, cp, band_h*w]: the traced band index rides the
    LEADING dim (the validated Mosaic dynamic-indexing pattern) and every
    halo slice is a STATIC lane range — traced LANE-dim offsets are NOT
    lowerable (tpu.memref_slice rejects dynamic lane offsets on both HBM
    and VMEM memrefs; found the hard way, docs/ROUND3.md). Loads are a
    UNIFORM 3-DMA form (top halo / body / bottom halo, modular leading
    index) so every band — boundary or interior — is the same code path;
    waits re-make the exact descriptor (same traced indices => same byte
    count). Circular padding only. Requires an EVEN number of bands.
    The conditioning grid streams from HBM with its own double-buffered
    band DMA (it no longer occupies a whole-grid VMEM block)."""
    f = cfg.fc_dim
    thr = _uniform_threshold(update_rate)
    n_bands = h // band_h
    n_tiles = band_h // tile_rows
    n = tile_rows * w
    hw = h * w
    bw = band_h * w
    assert cfg.padding_mode == "circular"
    assert n_bands % 2 == 0, "streaming kernel needs an even band count"
    has_cond = ccp > 0

    def kernel(seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, *rest):
        if has_cond:
            (cond_ref, out_ref, tmp_ref, band_in, band_out, cond_in,
             load_sem, store_sem, copy_sem) = rest
        else:
            (out_ref, tmp_ref, band_in, band_out,
             load_sem, store_sem, copy_sem) = rest
            cond_ref = cond_in = None

        bidx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + bidx)

        init = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[bidx], copy_sem)
        init.start()
        init.wait()

        col = jax.lax.broadcasted_iota(jnp.int32, (1, n + 2 * w), 1) % w
        is_col0 = col == 0
        is_colw1 = col == w - 1

        def load_dmas(src, b, slot):
            """Uniform modular band load: top halo / body / bottom halo
            (+ the cond band). b may be traced (leading-dim index only);
            identical descriptors are re-made at wait time (DMA semaphores
            count bytes)."""
            bp = (b - 1) % n_bands
            bn = (b + 1) % n_bands
            dmas = [
                pltpu.make_async_copy(
                    src.at[bp, :, bw - w :],
                    band_in.at[slot, :, 0:w], load_sem.at[slot],
                ),
                pltpu.make_async_copy(
                    src.at[b],
                    band_in.at[slot, :, w : bw + w], load_sem.at[slot],
                ),
                pltpu.make_async_copy(
                    src.at[bn, :, :w],
                    band_in.at[slot, :, bw + w : bw + 2 * w],
                    load_sem.at[slot],
                ),
            ]
            if cond_ref is not None:
                dmas.append(pltpu.make_async_copy(
                    cond_ref.at[bidx, b],
                    cond_in.at[slot], load_sem.at[slot],
                ))
            return dmas

        def start_load(src, b, slot):
            for d in load_dmas(src, b, slot):
                d.start()

        def wait_load(src, b, slot):
            for d in load_dmas(src, b, slot):
                d.wait()

        def store_dma(dst, b, slot):
            return pltpu.make_async_copy(
                band_out.at[slot], dst.at[b],
                store_sem.at[slot],
            )

        def compute_band(slot):
            for t in range(n_tiles):
                t0 = t * n
                band = band_in[slot, :, t0 : t0 + n + 2 * w]
                cond_tile = (
                    cond_in[slot, :, t0 : t0 + n]
                    if cond_in is not None else None
                )
                band_out[slot, :, t0 : t0 + n] = _flat_tile_update(
                    band, cond_tile, w1t_ref, b1_ref, w2t_ref, b2_ref,
                    cp, f, n, w, thr, "circular", compute_dtype,
                    is_col0, is_colw1,
                )

        def run_step(src, dst):
            start_load(src, 0, 0)

            def pair_body(k, carry):
                b0 = 2 * k
                b1 = b0 + 1
                # slot 0: band b0
                start_load(src, b1, 1)
                wait_load(src, b0, 0)

                @pl.when(k > 0)
                def _():
                    store_dma(dst, b0 - 2, 0).wait()

                compute_band(0)
                store_dma(dst, b0, 0).start()

                # slot 1: band b1 (prefetch next pair's b0 first)
                @pl.when(b1 + 1 < n_bands)
                def _():
                    start_load(src, b1 + 1, 0)

                wait_load(src, b1, 1)

                @pl.when(k > 0)
                def _():
                    store_dma(dst, b1 - 2, 1).wait()

                compute_band(1)
                store_dma(dst, b1, 1).start()
                return carry

            jax.lax.fori_loop(0, n_bands // 2, pair_body, 0)
            store_dma(dst, n_bands - 2, 0).wait()
            store_dma(dst, n_bands - 1, 1).wait()

        def one_step(i, carry):
            @pl.when(i % 2 == 0)
            def _():
                run_step(out_ref.at[bidx], tmp_ref.at[0])

            @pl.when(i % 2 == 1)
            def _():
                run_step(tmp_ref.at[0], out_ref.at[bidx])

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)
        if n_steps % 2 == 1:
            fin = pltpu.make_async_copy(
                tmp_ref.at[0], out_ref.at[bidx], copy_sem
            )
            fin.start()
            fin.wait()

    return kernel


def _pick_band_rows_flat(h: int, w: int, cp: int,
                         budget_bytes: int = 8 * 2**20) -> int:
    """Largest divisor of H giving an EVEN band count (the pair-unrolled
    fori band walk processes bands two at a time) whose double-buffered
    flat band buffers fit the budget."""
    best = 1
    row_bytes = cp * w * 4
    for bh in range(1, h // 2 + 1):
        if (h % bh == 0 and (h // bh) % 2 == 0
                and (4 * bh + 4) * row_bytes <= budget_bytes):
            best = bh
    return best


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "update_rate", "interpret",
                     "compute_dtype"),
)
def fused_rollout_stream_flat_chw(
    params: dict,
    x: jnp.ndarray,
    seed: jnp.ndarray,
    cfg: NCAConfig,
    n_steps: int,
    cond: Optional[jnp.ndarray] = None,
    update_rate: Optional[float] = None,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Flat-layout HBM-streaming fused rollout for grids past the
    VMEM-resident cap (512^2+). Same contract as ``fused_rollout_chw``;
    circular padding + perception_scales (0,) only."""
    assert tuple(cfg.perception_scales) == (0,)
    assert cfg.padding_mode == "circular", "streaming kernel is circular-only"
    b, c, h, w = x.shape
    assert c == cfg.c_in and w % _LANE == 0
    rate = cfg.update_rate if update_rate is None else update_rate
    cdt = jnp.dtype(compute_dtype)
    cp = _round8(c)
    cc = cfg.c_cond if cond is not None else 0
    ccp = _round8(cc) if cc else 0
    p_dim = 4 * cp + ccp
    hw = h * w
    band_h = _pick_band_rows_flat(h, w, cp)
    tile_rows = _pick_tile_rows(band_h, w)
    assert h % band_h == 0 and band_h % tile_rows == 0
    assert h // band_h >= 2, "streaming kernel needs >= 2 bands"

    n_bands = h // band_h
    bw = band_h * w
    # Banded HBM layout [n_bands, cp, bw]: traced band indices ride the
    # LEADING dim (traced lane offsets don't lower — see the kernel doc).
    xf = (
        jnp.pad(x, ((0, 0), (0, cp - c), (0, 0), (0, 0)))
        .reshape(b, cp, n_bands, bw).transpose(0, 2, 1, 3)
    )
    w1t, b1, w2t, b2 = _flat_pad_weights(params, c, cp, cc, ccp, cdt)

    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        rep(w1t.shape), rep(b1.shape), rep(w2t.shape), rep(b2.shape),
    ]
    args = [jnp.asarray(seed, jnp.int32).reshape(1), xf, w1t, b1, w2t, b2]
    if cc:
        cf = (
            jnp.pad(cond, ((0, 0), (0, ccp - cc), (0, 0), (0, 0)))
            .reshape(b, ccp, n_bands, bw).transpose(0, 2, 1, 3)
        )
        # cond streams from HBM band-by-band (no whole-grid VMEM block)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        args.append(cf.astype(jnp.float32))

    flops_step = 2 * hw * (p_dim * cfg.fc_dim + cfg.fc_dim * cp)
    # The ping-pong partner is a second ANY-space OUTPUT (no HBM scratch in
    # Mosaic); discarded by the wrapper.
    # Kernel matmuls are validated at DEFAULT matmul precision; a global
    # 'highest' setting would expand them into multi-pass sequences whose
    # temporaries blow Mosaic's 16 MB scoped-vmem stack (measured: the
    # 128px flat backward needs 21.7 MB under 'highest'). Pin it here.
    with jax.default_matmul_precision("default"):
        out, _ = pl.pallas_call(
            _make_kernel_stream_flat(
                cfg, h, w, n_steps, band_h, tile_rows, cp, ccp, rate, cdt
            ),
            grid=(b,),
            out_shape=(
                jax.ShapeDtypeStruct((b, n_bands, cp, bw), jnp.float32),
                jax.ShapeDtypeStruct((1, n_bands, cp, bw), jnp.float32),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ),
            scratch_shapes=(
                [
                    pltpu.VMEM((2, cp, (band_h + 2) * w), jnp.float32),
                    pltpu.VMEM((2, cp, band_h * w), jnp.float32),
                ]
                + ([pltpu.VMEM((2, ccp, band_h * w), jnp.float32)]
                   if cc else [])
                + [
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA(()),
                ]
            ),
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * flops_step,
                bytes_accessed=2 * b * n_steps * cp * hw * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)
    out = out.transpose(0, 2, 1, 3).reshape(b, cp, h, w)
    return out[:, :c]


def fused_stream_flat_supported(cfg: NCAConfig, h: int, w: int) -> bool:
    """True when the flat-layout streaming kernel applies (big circular
    grids, single-scale perception). The conditioning grid streams from
    HBM band-by-band, so only its double-buffered band counts against the
    VMEM budget — 1024²+ edge-conditioned stylizers now stream instead of
    falling back to XLA."""
    if tuple(cfg.perception_scales) != (0,):
        return False
    if cfg.padding_mode != "circular" or w % _LANE != 0:
        return False
    cp = _round8(cfg.c_in)
    band_h = _pick_band_rows_flat(h, w, cp)
    if h % band_h != 0 or h <= band_h or (h // band_h) % 2 != 0:
        return False
    ccp = _round8(cfg.c_cond) if cfg.conditioning is not None else 0
    band_bytes = (2 * (band_h + 2) + 2 * band_h) * cp * w * 4
    cond_bytes = 2 * ccp * band_h * w * 4
    return band_bytes + cond_bytes < 14 * 2**20


def fused_flat_supported(cfg: NCAConfig, h: int, w: int) -> bool:
    """True when the flat-layout VMEM-resident kernel applies. The
    conditioning grid (one whole-size VMEM block for conditioned configs)
    counts against the budget; the 15 MB bound is calibrated to the
    measured-working 256² edge-conditioned stylizer."""
    if tuple(cfg.perception_scales) != (0,):
        return False
    if w % _LANE != 0:
        return False
    cp = _round8(cfg.c_in)
    hw = h * w
    tile_rows = _pick_tile_rows(h, w)
    n = tile_rows * w
    est = (
        2 * cp * hw * 4  # double-buffered state
        + (4 * cp + 8) * n * 4 * 2  # percept (+ band temporaries headroom)
        + cfg.fc_dim * n * 4  # hidden
    )
    if cfg.conditioning is not None:
        est += _round8(cfg.c_cond) * hw * 4
    return h % tile_rows == 0 and est < 15 * 2**20


def fused_stream_supported(cfg: NCAConfig, h: int, w: int) -> bool:
    """True when the HBM-streaming kernel applies (big circular grids)."""
    if tuple(cfg.perception_scales) != (0,):
        return False
    if cfg.padding_mode != "circular" or w % _LANE != 0:
        return False
    band_h = _pick_band_h(h, w, cfg.c_in)
    return h % band_h == 0 and band_h >= 8 and h > band_h


def select_rollout_kernel(cfg: NCAConfig, h: int, w: int) -> Optional[str]:
    """Auto-selection policy for the inference rollout, by measured speed
    (v5e, c12/fc96; see docs/ROUND2.md):

    - 'flat' (VMEM-resident flat layout): 0.0457 ms/step @256^2 — 1.67x the
      roll kernel, 1.57x XLA.
    - 'stream_flat' (flat HBM-streaming) for grids past the VMEM cap, where
      it beats the XLA scan (the [C, H, W] streaming kernel measured dead
      even and stays off).
    - None: XLA scan path (multiscale, non-lane-aligned widths, or whenever
      no kernel wins).
    Returns the kernel name or None.
    """
    if fused_flat_supported(cfg, h, w):
        return "flat"
    if fused_rollout_supported(cfg, h, w):
        return "roll"
    if fused_stream_flat_supported(cfg, h, w):
        return "stream_flat"
    return None


ROLLOUT_KERNELS = {
    "flat": lambda *a, **k: fused_rollout_flat_chw(*a, **k),
    "roll": lambda *a, **k: fused_rollout_chw(*a, **k),
    "stream_flat": lambda *a, **k: fused_rollout_stream_flat_chw(*a, **k),
}
