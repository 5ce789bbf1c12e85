"""Fused ConditionedNCA rollout kernel (EncoderConditioning variant).

The last un-TPU-ified model family (VERDICT r2 weak #6): one Pallas program
rolls the goal-guided NCA (models/conditioned_nca.py, reference
EncoderConditioning/nca.py:176-209) N steps with the state VMEM-resident —
small grids (the reference trains and grows at 64^2) are DISPATCH-bound in
the XLA path (one device program per step via scan is fine for training,
but the interactive grower pays per-chunk latency), so the whole rollout
fuses into a single kernel.

Design notes:
- Whole grid = ONE flat tile [cp, h*w]: at 64^2 the state is 4096 lanes;
  W-neighbor taps are +-1 lane rolls, H-neighbor taps are +-w lane rolls
  (w < 128 means these are not tile-aligned — acceptable at this size),
  zero padding via precomputed edge masks.
- The LEARNABLE depthwise 3x3 perception (groups=C, 3 filters/channel)
  folds into 27 per-channel column weights [cp, 1] broadcast-multiplied
  against the 9 shared neighborhood taps — perception costs 27 madds and
  no matmul; the slot-major percept row order is matched by PERMUTING the
  first UpdateNet matrix's rows in the wrapper (torch grouped-conv order
  c*3+s -> s*cp+c), generalizing the fixed-filter stencil_folded_w1 trick
  (ops/pallas_step.py:148).
- alive gating: maxpool3x3(alpha) > thr with ZERO edge fill — valid
  because the threshold is positive, so 0-vs-(-inf) padding cannot change
  the comparison (asserted).
- One Bernoulli(fire_rate) mask PER PIXEL (not per channel), drawn from
  the on-core PRNG; life gate = pre & post alive; clamp +-clamp_value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsnca_tpu.config import ConditionedNCAConfig
from vsnca_tpu.ops.pallas_step import (
    _draw_mask_flat,
    _round8,
    _uniform_threshold,
)


def _make_cnca_kernel(cfg: ConditionedNCAConfig, h: int, w: int,
                      n_steps: int, cp: int, compute_dtype=jnp.float32):
    d = cfg.update_hidden_dim
    hw = h * w
    thr_fire = _uniform_threshold(cfg.cell_fire_rate)
    a0 = cfg.alive_channel
    athr = cfg.alpha_living_threshold
    clamp = cfg.clamp_value
    use_life = cfg.use_living_channel
    assert athr > 0.0, "zero-fill maxpool needs a positive threshold"

    def kernel(seed_ref, x_ref, goal_ref, wcol_ref, w1t_ref, b1_ref,
               w2t_ref, b2_ref, w3t_ref, out_ref, alt_ref, dma_sem):
        bidx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + bidx)

        load = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[0], dma_sem)
        load.start()
        load.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
        col = lane % w
        row = lane // w
        col0 = col == 0
        colw1 = col == w - 1
        row0 = row == 0
        rowlast = row == h - 1
        goal = goal_ref[0]

        def sh(x, k):
            return pltpu.roll(x, (hw - k) % hw, axis=1)

        def zwhere(m, x):
            return jnp.where(m, 0.0, x)

        def alive_from(a):
            """3x3 maxpool of the [1, hw] alpha row, zero edge fill,
            compared against the living threshold -> bool [1, hw]."""
            m1 = jnp.maximum(
                a,
                jnp.maximum(zwhere(col0, sh(a, -1)),
                            zwhere(colw1, sh(a, 1))),
            )
            m = jnp.maximum(
                m1,
                jnp.maximum(zwhere(row0, sh(m1, -w)),
                            zwhere(rowlast, sh(m1, w))),
            )
            return m > athr

        def step(src_ref, dst_ref):
            src = src_ref[0]
            if use_life:
                pre = alive_from(src[a0 : a0 + 1])
                xg = src + goal * pre.astype(src.dtype)
            else:
                pre = None
                xg = src + goal

            # 9 shared neighborhood taps, zero-padded: 3 column variants
            # x {-w, 0, +w} row shifts with edge masks.
            xl = zwhere(col0, sh(xg, -1))
            xr = zwhere(colw1, sh(xg, 1))
            cols = (xl, xg, xr)
            taps = {}
            for dj in range(3):
                base = cols[dj]
                taps[(0, dj)] = zwhere(row0, sh(base, -w))
                taps[(1, dj)] = base
                taps[(2, dj)] = zwhere(rowlast, sh(base, w))

            # slot-major percept: percept[s*cp + c] =
            #   sum_{di,dj} perception_w[c, s, di, dj] * tap(di,dj)[c]
            parts = []
            for s in range(3):
                acc = None
                for di in range(3):
                    for dj in range(3):
                        k = s * 9 + di * 3 + dj
                        v = wcol_ref[:, k : k + 1] * taps[(di, dj)]
                        acc = v if acc is None else acc + v
                parts.append(acc)
            percept = jnp.concatenate(parts, axis=0).astype(compute_dtype)

            h1 = jnp.maximum(
                jnp.dot(w1t_ref[:], percept,
                        preferred_element_type=jnp.float32)
                + b1_ref[:].reshape(d, 1),
                0.0,
            ).astype(compute_dtype)
            h2 = jnp.maximum(
                jnp.dot(w2t_ref[:], h1, preferred_element_type=jnp.float32)
                + b2_ref[:].reshape(d, 1),
                0.0,
            ).astype(compute_dtype)
            dx = jnp.dot(w3t_ref[:], h2, preferred_element_type=jnp.float32)

            mask = _draw_mask_flat(hw, thr_fire)  # one mask per PIXEL
            xn = src + dx * mask
            if use_life:
                post = alive_from(xn[a0 : a0 + 1])
                life = (pre & post).astype(xn.dtype)
                xn = xn * life
            dst_ref[0] = jnp.clip(xn, -clamp, clamp)

        def one_step(i, carry):
            @pl.when(i % 2 == 0)
            def _():
                step(out_ref, alt_ref)

            @pl.when(i % 2 == 1)
            def _():
                step(alt_ref, out_ref)

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)
        if n_steps % 2 == 1:
            out_ref[:] = alt_ref[:]

    return kernel


def fused_cnca_supported(cfg: ConditionedNCAConfig, h: int, w: int) -> bool:
    """Whole-grid single-tile scope: the reference's 64^2-class grids.
    The ~12-deep live set of [cp, hw] temporaries must sit well inside the
    scoped-vmem stack; 8k pixels (90^2-class) is the cap."""
    cp = _round8(cfg.num_channels)
    if h * w > 8192 or w < 8:
        return False
    if cfg.use_living_channel and cfg.alpha_living_threshold <= 0:
        return False
    # buffers: 2 state + goal + ~14 live temps + 3cp percept
    return (3 + 14 + 3) * cp * h * w * 4 < 13 * 2**20


def _fold_weights(params: dict, cfg: ConditionedNCAConfig, cp: int,
                  compute_dtype):
    """(wcol [cp, 27], w1t [d, 3cp], b1, w2t [d, d], b2, w3t [cp, d]) with
    the torch grouped-conv channel-major w1 rows PERMUTED to the kernel's
    slot-major percept order and channels zero-padded c -> cp."""
    c = cfg.num_channels
    d = cfg.update_hidden_dim
    cdt = jnp.dtype(compute_dtype)
    pw = params["perception_w"]  # [c, 3, 3, 3]
    wcol = jnp.pad(pw.reshape(c, 27), ((0, cp - c), (0, 0))).astype(
        jnp.float32
    )
    w1 = params["update1"]["w"][0, 0]  # [c*3, d], rows ordered c*3 + s
    rows = [
        jnp.pad(w1[s::3], ((0, cp - c), (0, 0))) for s in range(3)
    ]
    w1t = jnp.concatenate(rows, axis=0).T.astype(cdt)  # [d, 3cp]
    b1 = params["update1"]["b"].astype(jnp.float32)
    w2t = params["update2"]["w"][0, 0].T.astype(cdt)
    b2 = params["update2"]["b"].astype(jnp.float32)
    w3t = jnp.pad(params["update3"]["w"][0, 0], ((0, 0), (0, cp - c))).T
    return wcol, w1t, b1, w2t, b2, w3t.astype(cdt)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "interpret", "compute_dtype"),
)
def fused_cnca_rollout(
    params: dict,
    x: jnp.ndarray,
    goal_encoding: jnp.ndarray,
    seed: jnp.ndarray,
    cfg: ConditionedNCAConfig,
    n_steps: int,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """N fused ConditionedNCA steps on NHWC state [B, H, W, C] with a
    precomputed goal encoding [B, H, W, C] (encode_goal). Inference path —
    gradients do not flow through (use conditioned_nca_grow for training).
    Matches conditioned_nca_step semantics; stochasticity comes from the
    on-core PRNG (distributional parity, bit-parity at fire_rate=1)."""
    b, h, w, c = x.shape
    assert c == cfg.num_channels
    cp = _round8(c)
    hw = h * w
    cdt = jnp.dtype(compute_dtype)

    def to_flat(a):
        return jnp.pad(
            jnp.transpose(a, (0, 3, 1, 2)), ((0, 0), (0, cp - c), (0, 0), (0, 0))
        ).reshape(b, cp, hw)

    xf = to_flat(x)
    gf = to_flat(goal_encoding).astype(jnp.float32)
    wcol, w1t, b1, w2t, b2, w3t = _fold_weights(params, cfg, cp, cdt)

    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    d = cfg.update_hidden_dim
    with jax.default_matmul_precision("default"):
        out = pl.pallas_call(
            _make_cnca_kernel(cfg, h, w, n_steps, cp, cdt),
            grid=(b,),
            out_shape=jax.ShapeDtypeStruct((b, cp, hw), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                block((cp, hw)),
                rep(wcol.shape), rep(w1t.shape), rep(b1.shape),
                rep(w2t.shape), rep(b2.shape), rep(w3t.shape),
            ],
            out_specs=block((cp, hw)),
            scratch_shapes=[
                pltpu.VMEM((1, cp, hw), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * 2 * hw * (3 * cp * d + d * d + d * cp),
                bytes_accessed=2 * b * cp * hw * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(jnp.asarray(seed, jnp.int32).reshape(1), xf, gf, wcol, w1t, b1,
          w2t, b2, w3t)
    out = out.reshape(b, cp, h, w)[:, :c]
    return jnp.transpose(out, (0, 2, 3, 1))


# ==========================================================================
# Custom-VJP train pair: the differentiable whole-rollout kernel for the
# EncoderConditioning trainer (conditioned_trainer.py:123-153 trains through
# a 48-96 step grow; the XLA scan costs 272 us/step b8 at 64^2 vs this
# kernel's 56.6 us forward — docs/hw_r5/cnca_timing.log).
#
# Scheme: the grids are small (<= 8k pixels, fused_cnca_supported), so the
# FORWARD DMAs every step's INPUT state to an HBM trace ([n_steps, cp, hw]
# = 25 MB at 64^2 x 64 steps) and the BACKWARD is pure adjoint: one
# descending loop that DMAs the step's input back, recomputes the step's
# internals (percept/h1/h2/mask — masks re-derived from per-step seeds),
# and applies the transposed ops. No segment remat is needed at this size
# (unlike the DyNCA flat pair, whose states don't fit HBM-per-step at
# 256^2 x batch).
#
# Gradient semantics match the XLA path (models/conditioned_nca.py):
# masks and alive/life gates are non-differentiable constants; clip passes
# gradient inside [-clamp, clamp] inclusive; goal-encoding cotangent is
# accumulated over steps (it feeds the ImageEncoder through encode_goal's
# XLA autodiff in the wrapper's caller).
# ==========================================================================

from vsnca_tpu.ops.pallas_train import _step_seed


def _cnca_step_parts(cfg, h, w, cp, compute_dtype):
    """Shared step math on flat [cp, hw] rows: edge masks + helpers used by
    both the fwd kernel and the bwd recompute/adjoint."""
    hw = h * w
    a0 = cfg.alive_channel
    athr = cfg.alpha_living_threshold

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
    col = lane % w
    row = lane // w
    masks = dict(col0=col == 0, colw1=col == w - 1, row0=row == 0,
                 rowlast=row == h - 1)

    def sh(x, k):
        return pltpu.roll(x, (hw - k) % hw, axis=1)

    def zwhere(m, x):
        return jnp.where(m, 0.0, x)

    def alive_from(a):
        m1 = jnp.maximum(
            a,
            jnp.maximum(zwhere(masks["col0"], sh(a, -1)),
                        zwhere(masks["colw1"], sh(a, 1))),
        )
        m = jnp.maximum(
            m1,
            jnp.maximum(zwhere(masks["row0"], sh(m1, -w)),
                        zwhere(masks["rowlast"], sh(m1, w))),
        )
        return m > athr

    def cols_of(xg):
        return (zwhere(masks["col0"], sh(xg, -1)), xg,
                zwhere(masks["colw1"], sh(xg, 1)))

    def row_tap(base, di):
        if di == 0:
            return zwhere(masks["row0"], sh(base, -w))
        if di == 1:
            return base
        return zwhere(masks["rowlast"], sh(base, w))

    return dict(sh=sh, zwhere=zwhere, alive_from=alive_from,
                cols_of=cols_of, row_tap=row_tap, masks=masks, a0=a0)


def _make_cnca_fwd_train_kernel(cfg, h, w, n_steps, cp, compute_dtype):
    d = cfg.update_hidden_dim
    hw = h * w
    thr_fire = _uniform_threshold(cfg.cell_fire_rate)
    clamp = cfg.clamp_value
    use_life = cfg.use_living_channel
    a0 = cfg.alive_channel
    assert (not use_life) or cfg.alpha_living_threshold > 0.0

    def kernel(seed_ref, x_ref, goal_ref, wcol_ref, w1t_ref, b1_ref,
               w2t_ref, b2_ref, w3t_ref, out_ref, trace_ref, alt_ref,
               dma_sem, trace_sem):
        bidx = pl.program_id(0)
        p = _cnca_step_parts(cfg, h, w, cp, compute_dtype)
        goal = goal_ref[0]

        load = pltpu.make_async_copy(x_ref.at[bidx], out_ref.at[0], dma_sem)
        load.start()
        load.wait()

        def step(src_ref, dst_ref, i):
            src = src_ref[0]
            # record the step INPUT for the backward
            save = pltpu.make_async_copy(
                src_ref.at[0], trace_ref.at[bidx, i], trace_sem
            )
            save.start()
            if use_life:
                pre = p["alive_from"](src[a0 : a0 + 1])
                xg = src + goal * pre.astype(src.dtype)
            else:
                xg = src + goal
            cols = p["cols_of"](xg)
            parts = []
            for s in range(3):
                acc = None
                for di in range(3):
                    for dj in range(3):
                        k = s * 9 + di * 3 + dj
                        v = wcol_ref[:, k : k + 1] * p["row_tap"](cols[dj], di)
                        acc = v if acc is None else acc + v
                parts.append(acc)
            percept = jnp.concatenate(parts, axis=0).astype(compute_dtype)
            h1 = jnp.maximum(
                jnp.dot(w1t_ref[:], percept,
                        preferred_element_type=jnp.float32)
                + b1_ref[:].reshape(d, 1),
                0.0,
            ).astype(compute_dtype)
            h2 = jnp.maximum(
                jnp.dot(w2t_ref[:], h1, preferred_element_type=jnp.float32)
                + b2_ref[:].reshape(d, 1),
                0.0,
            ).astype(compute_dtype)
            dx = jnp.dot(w3t_ref[:], h2, preferred_element_type=jnp.float32)
            mask = _draw_mask_flat(hw, thr_fire)
            xn = src + dx * mask
            if use_life:
                post = p["alive_from"](xn[a0 : a0 + 1])
                life = (pre & post).astype(xn.dtype)
                xn = xn * life
            dst_ref[0] = jnp.clip(xn, -clamp, clamp)
            save.wait()

        def one_step(i, carry):
            pltpu.prng_seed(_step_seed(seed_ref[0], bidx, i))

            @pl.when(i % 2 == 0)
            def _():
                step(out_ref, alt_ref, i)

            @pl.when(i % 2 == 1)
            def _():
                step(alt_ref, out_ref, i)

            return carry

        jax.lax.fori_loop(0, n_steps, one_step, 0)
        if n_steps % 2 == 1:
            out_ref[:] = alt_ref[:]

    return kernel


def _make_cnca_bwd_train_kernel(cfg, h, w, n_steps, cp, compute_dtype):
    d = cfg.update_hidden_dim
    hw = h * w
    thr_fire = _uniform_threshold(cfg.cell_fire_rate)
    clamp = cfg.clamp_value
    use_life = cfg.use_living_channel
    a0 = cfg.alive_channel

    def kernel(seed_ref, trace_ref, gy_ref, goal_ref, wcol_ref, w1t_ref,
               b1_ref, w2t_ref, b2_ref, w3t_ref, w1tt_ref, w2tt_ref,
               w3tt_ref,
               dx0_ref, dgoal_ref, dwcol_ref, dw1t_ref, db1_ref, dw2t_ref,
               db2_ref, dw3t_ref,
               src_scr, g_scr, dma_sem):
        bidx = pl.program_id(0)
        p = _cnca_step_parts(cfg, h, w, cp, compute_dtype)
        goal = goal_ref[0]

        dwcol_ref[:] = jnp.zeros_like(dwcol_ref)
        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw3t_ref[:] = jnp.zeros_like(dw3t_ref)
        dgoal_ref[:] = jnp.zeros_like(dgoal_ref)
        g_scr[0] = gy_ref[0]

        def adjoint(t, carry):
            i = n_steps - 1 - t
            load = pltpu.make_async_copy(
                trace_ref.at[bidx, i], src_scr.at[0], dma_sem
            )
            load.start()
            load.wait()
            src = src_scr[0]
            pltpu.prng_seed(_step_seed(seed_ref[0], bidx, i))

            # ---- recompute the step internals ----
            if use_life:
                pre = p["alive_from"](src[a0 : a0 + 1])
                pre_f = pre.astype(src.dtype)
                xg = src + goal * pre_f
            else:
                pre_f = None
                xg = src + goal
            cols = p["cols_of"](xg)
            parts = []
            for s in range(3):
                acc = None
                for di in range(3):
                    for dj in range(3):
                        k = s * 9 + di * 3 + dj
                        v = wcol_ref[:, k : k + 1] * p["row_tap"](cols[dj], di)
                        acc = v if acc is None else acc + v
                parts.append(acc)
            percept = jnp.concatenate(parts, axis=0).astype(compute_dtype)
            h1 = jnp.maximum(
                jnp.dot(w1t_ref[:], percept,
                        preferred_element_type=jnp.float32)
                + b1_ref[:].reshape(d, 1),
                0.0,
            )
            h2 = jnp.maximum(
                jnp.dot(w2t_ref[:], h1.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
                + b2_ref[:].reshape(d, 1),
                0.0,
            )
            dx = jnp.dot(w3t_ref[:], h2.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
            mask = _draw_mask_flat(hw, thr_fire)
            xn = src + dx * mask
            if use_life:
                post = p["alive_from"](xn[a0 : a0 + 1])
                life = (pre & post).astype(xn.dtype)
                xl = xn * life
            else:
                life = None
                xl = xn

            # ---- adjoint ----
            g = g_scr[0]
            in_range = ((xl >= -clamp) & (xl <= clamp)).astype(jnp.float32)
            g_xn = g * in_range
            if use_life:
                g_xn = g_xn * life
            g_dx = (g_xn * mask).astype(compute_dtype)

            g_h2 = jnp.dot(w3tt_ref[:], g_dx,
                           preferred_element_type=jnp.float32)
            dw3t_ref[0] += jax.lax.dot_general(
                g_dx, h2.astype(compute_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g_h2 = (g_h2 * (h2 > 0.0)).astype(compute_dtype)
            g_h1 = jnp.dot(w2tt_ref[:], g_h2,
                           preferred_element_type=jnp.float32)
            dw2t_ref[0] += jax.lax.dot_general(
                g_h2, h1.astype(compute_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db2_ref[0] += jnp.sum(g_h2, axis=1).reshape(1, d)
            g_h1 = (g_h1 * (h1 > 0.0)).astype(compute_dtype)
            g_p = jnp.dot(w1tt_ref[:], g_h1,
                          preferred_element_type=jnp.float32)
            dw1t_ref[0] += jax.lax.dot_general(
                g_h1, percept, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db1_ref[0] += jnp.sum(g_h1, axis=1).reshape(1, d)

            g_base = [None, None, None]
            for s in range(3):
                gp_s = g_p[s * cp : (s + 1) * cp].astype(src.dtype)
                for di in range(3):
                    for dj in range(3):
                        k = s * 9 + di * 3 + dj
                        tap = p["row_tap"](cols[dj], di)
                        dwcol_ref[0, :, k : k + 1] += jnp.sum(
                            tap * gp_s, axis=1, keepdims=True
                        )
                        gt = wcol_ref[:, k : k + 1] * gp_s
                        if di == 0:
                            gt = p["sh"](p["zwhere"](p["masks"]["row0"], gt), w)
                        elif di == 2:
                            gt = p["sh"](
                                p["zwhere"](p["masks"]["rowlast"], gt), -w
                            )
                        g_base[dj] = gt if g_base[dj] is None else g_base[dj] + gt
            g_xg = (
                g_base[1]
                + p["sh"](p["zwhere"](p["masks"]["col0"], g_base[0]), 1)
                + p["sh"](p["zwhere"](p["masks"]["colw1"], g_base[2]), -1)
            )
            if use_life:
                dgoal_ref[0] += g_xg * pre_f
            else:
                dgoal_ref[0] += g_xg
            g_scr[0] = g_xn + g_xg
            return carry

        jax.lax.fori_loop(0, n_steps, adjoint, 0)
        dx0_ref[0] = g_scr[0]

    return kernel


def fused_cnca_train_supported(cfg: ConditionedNCAConfig, h: int, w: int) -> bool:
    """The bwd adjoint holds ~2x the fwd's live [cp, hw] rows (plus the
    [d, hw] h1/h2/g_h* set); bound the grid by the Mosaic scoped-vmem
    budget. Sized to admit the reference's 64^2 c20 d64 training shape
    (validated on hardware — docs/hw_r5/); tighten if a new shape OOMs."""
    cp = _round8(cfg.num_channels)
    if not fused_cnca_supported(cfg, h, w):
        return False
    d = cfg.update_hidden_dim
    live = 22 * cp * h * w * 4 + 6 * d * h * w * 4
    return live < 15 * 2**20


def _cnca_train_fwd_call(folded, xf, gf, seed_i32, cfg, h, w, n_steps,
                         interpret, compute_dtype):
    b, cp, hw = xf.shape
    cdt = jnp.dtype(compute_dtype)
    wcol, w1t, b1, w2t, b2, w3t = folded
    d = cfg.update_hidden_dim
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    with jax.default_matmul_precision("default"):
        y, trace = pl.pallas_call(
            _make_cnca_fwd_train_kernel(cfg, h, w, n_steps, cp, cdt),
            grid=(b,),
            out_shape=(
                jax.ShapeDtypeStruct((b, cp, hw), jnp.float32),
                jax.ShapeDtypeStruct((b, n_steps, cp, hw), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                block((cp, hw)),
                rep(wcol.shape), rep(w1t.shape), rep(b1.shape),
                rep(w2t.shape), rep(b2.shape), rep(w3t.shape),
            ],
            out_specs=(
                block((cp, hw)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, cp, hw), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * 2 * hw * (3 * cp * d + d * d + d * cp),
                bytes_accessed=(2 + n_steps) * b * cp * hw * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(seed_i32.reshape(1), xf, gf, wcol, w1t, b1, w2t, b2, w3t)
    return y, trace


def _cnca_train_bwd_call(folded, trace, gf, seed_i32, gyf, cfg, h, w,
                         n_steps, interpret, compute_dtype):
    b, _, cp, hw = trace.shape
    cdt = jnp.dtype(compute_dtype)
    wcol, w1t, b1, w2t, b2, w3t = folded
    d = cfg.update_hidden_dim
    w1tt = w1t.T.astype(cdt)   # [3cp, d]
    w2tt = w2t.T.astype(cdt)   # [d, d]
    w3tt = w3t.T.astype(cdt)   # [d, cp]
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    block = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, cp, hw), jnp.float32),   # dx0
        jax.ShapeDtypeStruct((b, cp, hw), jnp.float32),   # dgoal
        jax.ShapeDtypeStruct((b, cp, 27), jnp.float32),   # dwcol
        jax.ShapeDtypeStruct((b, d, 3 * cp), jnp.float32),  # dw1t
        jax.ShapeDtypeStruct((b, 1, d), jnp.float32),     # db1
        jax.ShapeDtypeStruct((b, d, d), jnp.float32),     # dw2t
        jax.ShapeDtypeStruct((b, 1, d), jnp.float32),     # db2
        jax.ShapeDtypeStruct((b, cp, d), jnp.float32),    # dw3t
    )
    out_specs = (
        block((cp, hw)), block((cp, hw)), block((cp, 27)),
        block((d, 3 * cp)), block((1, d)), block((d, d)), block((1, d)),
        block((cp, d)),
    )
    with jax.default_matmul_precision("default"):
        outs = pl.pallas_call(
            _make_cnca_bwd_train_kernel(cfg, h, w, n_steps, cp, cdt),
            grid=(b,),
            out_shape=out_shape,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # trace
                block((cp, hw)),                                   # gy
                block((cp, hw)),                                   # goal
                rep(wcol.shape), rep(w1t.shape), rep(b1.shape),
                rep(w2t.shape), rep(b2.shape), rep(w3t.shape),
                rep(w1tt.shape), rep(w2tt.shape), rep(w3tt.shape),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((1, cp, hw), jnp.float32),  # src
                pltpu.VMEM((1, cp, hw), jnp.float32),  # g carry
                pltpu.SemaphoreType.DMA(()),
            ],
            cost_estimate=pl.CostEstimate(
                flops=b * n_steps * 6 * hw * (3 * cp * d + d * d + d * cp),
                bytes_accessed=2 * n_steps * b * cp * hw * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(seed_i32.reshape(1), trace, gyf, gf, wcol, w1t, b1, w2t, b2,
          w3t, w1tt, w2tt, w3tt)
    return outs


def _unfold_weight_grads(outs, params, cfg, cp):
    """Per-batch kernel grads -> param-space pytree (reverse _fold_weights);
    leaves the kernel doesn't touch (the ImageEncoder) get zeros — their
    real cotangents arrive through encode_goal's XLA autodiff."""
    c = cfg.num_channels
    d = cfg.update_hidden_dim
    _, _, dwcol, dw1t, db1, dw2t, db2, dw3t = outs
    dpw = jnp.sum(dwcol, axis=0)[:c].reshape(c, 3, 3, 3)
    dW = jnp.sum(dw1t, axis=0).T.reshape(3, cp, d)[:, :c]  # [3, c, d]
    dw1 = jnp.transpose(dW, (1, 0, 2)).reshape(1, 1, c * 3, d)
    dparams = {
        "perception_w": dpw.astype(params["perception_w"].dtype),
        "update1": {
            "w": dw1.astype(params["update1"]["w"].dtype),
            "b": jnp.sum(db1, axis=(0, 1)).astype(params["update1"]["b"].dtype),
        },
        "update2": {
            "w": jnp.sum(dw2t, axis=0).T.reshape(1, 1, d, d).astype(
                params["update2"]["w"].dtype
            ),
            "b": jnp.sum(db2, axis=(0, 1)).astype(params["update2"]["b"].dtype),
        },
        "update3": {
            "w": jnp.sum(dw3t, axis=0).T[:, :c].reshape(1, 1, d, c).astype(
                params["update3"]["w"].dtype
            ),
        },
        "encoder": jax.tree_util.tree_map(
            jnp.zeros_like, params["encoder"]
        ),
    }
    return dparams


def _to_flat_cnca(a, cp):
    b = a.shape[0]
    c = a.shape[-1]
    hw = a.shape[1] * a.shape[2]
    return jnp.pad(
        jnp.transpose(a, (0, 3, 1, 2)), ((0, 0), (0, cp - c), (0, 0), (0, 0))
    ).reshape(b, cp, hw)


def _from_flat_cnca(a, h, w, c):
    b, cp, hw = a.shape
    return jnp.transpose(a.reshape(b, cp, h, w)[:, :c], (0, 2, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_cnca_train(
    params: dict,
    x: jnp.ndarray,
    goal_encoding: jnp.ndarray,
    seed_f: jnp.ndarray,
    cfg: ConditionedNCAConfig,
    n_steps: int,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Differentiable fused ConditionedNCA rollout on NHWC state.

    x, goal_encoding: [B, H, W, C]; seed_f: float32 scalar PRNG seed (float
    so custom_vjp has a well-typed zero cotangent). Returns the grown state
    [B, H, W, C]. Gradients flow to params (incl. zeros for the encoder —
    its cotangent arrives via goal_encoding), x, and goal_encoding; masks
    and alive/life gates are non-differentiable constants (XLA-path
    semantics). Masks come from per-step on-core PRNG seeds (_step_seed),
    so the stream differs from conditioned_nca_grow's jax.random stream —
    distributional parity; bit-exact at cell_fire_rate=1.0.
    """
    b, h, w, c = x.shape
    cp = _round8(cfg.num_channels)
    folded = _fold_weights(params, cfg, cp, jnp.dtype(compute_dtype))
    y, _ = _cnca_train_fwd_call(
        folded, _to_flat_cnca(x, cp),
        _to_flat_cnca(goal_encoding, cp).astype(jnp.float32),
        seed_f.astype(jnp.int32), cfg, h, w, n_steps, interpret,
        compute_dtype,
    )
    return _from_flat_cnca(y, h, w, c)


def _cnca_train_vjp_fwd(params, x, goal_encoding, seed_f, cfg, n_steps,
                        interpret, compute_dtype):
    b, h, w, c = x.shape
    cp = _round8(cfg.num_channels)
    folded = _fold_weights(params, cfg, cp, jnp.dtype(compute_dtype))
    seed_i32 = seed_f.astype(jnp.int32)
    gf = _to_flat_cnca(goal_encoding, cp).astype(jnp.float32)
    y, trace = _cnca_train_fwd_call(
        folded, _to_flat_cnca(x, cp), gf, seed_i32, cfg, h, w, n_steps,
        interpret, compute_dtype,
    )
    return (
        _from_flat_cnca(y, h, w, c),
        (params, trace, gf, seed_i32, (h, w, c)),
    )


def _cnca_train_vjp_bwd(cfg, n_steps, interpret, compute_dtype, res, gy):
    params, trace, gf, seed_i32, (h, w, c) = res
    cp = trace.shape[2]
    folded = _fold_weights(params, cfg, cp, jnp.dtype(compute_dtype))
    outs = _cnca_train_bwd_call(
        folded, trace, gf, seed_i32, _to_flat_cnca(gy, cp), cfg, h, w,
        n_steps, interpret, compute_dtype,
    )
    dparams = _unfold_weight_grads(outs, params, cfg, cp)
    dx0 = _from_flat_cnca(outs[0], h, w, c)
    dgoal = _from_flat_cnca(outs[1], h, w, c)
    return dparams, dx0, dgoal, jnp.zeros((), jnp.float32)


fused_cnca_train.defvjp(_cnca_train_vjp_fwd, _cnca_train_vjp_bwd)
