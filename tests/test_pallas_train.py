"""Custom-VJP fused rollout (ops/pallas_train.py) vs the XLA scan rollout.

Runs under the TPU interpreter on CPU with update_rate=1.0 so the stochastic
mask is deterministic and forward/backward must match jax.grad through the
scan. (Interpret-mode pltpu.prng_random_bits returns zeros, so rate<1 masks
are degenerate on CPU — the stochastic path is validated on real TPU by the
finite-difference check in scripts/ and by training itself.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.models.dynca import dynca_init, dynca_rollout, make_conditioning
from vsnca_tpu.ops.pallas_train import (
    fused_rollout_train,
    fused_train_supported,
    pick_segment,
)


def _grads_match(gf, gs, rtol=1e-4):
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gs)):
        scale = float(jnp.abs(b).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=rtol, atol=rtol
        )


def test_fused_train_forward_matches_scan():
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 128, 8)) - 0.5
    with pltpu.force_tpu_interpret_mode():
        ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 8,
                               remat="none")
        got, _ = fused_rollout_train(params, x, 3.0, cfg, 8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_fused_train_grads_match_scan_multisegment_cond():
    """24 steps → 3 segments of 8: exercises the reverse segment walk,
    checkpoint reload, in-kernel recompute, adjoint stencil, and the
    conditioning cotangent."""
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                    conditioning="pos_emb", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 128, 8)) - 0.5
    cond = make_conditioning(cfg, (16, 128), batch=1)
    assert pick_segment(cfg, 16, 128, 24) == 8

    def lf(p, x, c):
        s, rgb = fused_rollout_train(p, x, 5.0, cfg, 24, cond_nhwc=c,
                                     interpret=True)
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    def ls(p, x, c):
        s, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 24, cond=c,
                               remat="none")
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(lf, argnums=(0, 1, 2))(params, x, cond)
        gs = jax.grad(ls, argnums=(0, 1, 2))(params, x, cond)
    _grads_match(gf, gs)


def test_fused_train_grads_batch():
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 8, 128, 8)) - 0.5

    def lf(p):
        _, rgb = fused_rollout_train(p, x, 11.0, cfg, 8, interpret=True)
        return jnp.mean(rgb ** 2)

    def ls(p):
        _, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 8,
                               remat="none")
        return jnp.mean(rgb ** 2)

    with pltpu.force_tpu_interpret_mode():
        _grads_match(jax.grad(lf)(params), jax.grad(ls)(params))


def test_fused_train_supported_predicate():
    cfg = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular")
    assert fused_train_supported(cfg, 128, 128, 64)
    assert not fused_train_supported(
        NCAConfig(c_in=12, fc_dim=96, padding_mode="replicate"), 128, 128, 64
    )
    assert not fused_train_supported(cfg, 128, 100, 64)  # W not lane-aligned
    assert not fused_train_supported(
        NCAConfig(c_in=12, fc_dim=96, padding_mode="circular",
                  perception_scales=(0, 1)), 128, 128, 64
    )
    # odd step count with no K in {16,8,4,2} dividing it
    assert not fused_train_supported(cfg, 128, 128, 63)


def test_fused_train_inside_value_and_grad_trainer_shape():
    """The integration shape used by make_train_step: value_and_grad over an
    objective that calls the fused rollout."""
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 128, 8)) - 0.5
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 128, 3))

    def objective(p):
        state, rgb = fused_rollout_train(p, x, 9.0, cfg, 8, interpret=True)
        return jnp.mean((rgb - tgt) ** 2), state

    with pltpu.force_tpu_interpret_mode():
        (loss, state), grads = jax.value_and_grad(objective, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(
        np.isfinite(np.asarray(g)).all()
        for g in jax.tree_util.tree_leaves(grads)
    )
    assert state.shape == x.shape


# ---------------------------------------------------------------- flat pair


def test_fused_train_flat_forward_matches_scan():
    from vsnca_tpu.ops.pallas_train import fused_rollout_train_flat

    cfg = NCAConfig(c_in=12, fc_dim=16, padding_mode="circular",
                    update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 128, 12)) - 0.5
    with pltpu.force_tpu_interpret_mode():
        ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 8,
                               remat="none")
        got, _ = fused_rollout_train_flat(params, x, 3.0, cfg, 8,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_fused_train_flat_grads_match_scan_multisegment_cond():
    """Flat-layout VJP pair, 8 steps, multi-segment: reverse segment
    walk, checkpoint reload, in-kernel
    recompute with regenerated masks, flat adjoint stencil, conditioning
    cotangent, and padded-weight-gradient un-padding."""
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat,
        fused_train_flat_supported,
        pick_segment_flat,
    )

    cfg = NCAConfig(c_in=12, fc_dim=16, padding_mode="circular",
                    conditioning="pos_emb", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 128, 12)) - 0.5
    cond = make_conditioning(cfg, (8, 128), batch=1)
    assert fused_train_flat_supported(cfg, 8, 128, 8)
    assert pick_segment_flat(cfg, 8, 128, 8) in (1, 2, 4, 8)

    def lf(p, x, c):
        s, rgb = fused_rollout_train_flat(p, x, 5.0, cfg, 8, cond_nhwc=c,
                                          interpret=True)
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    def ls(p, x, c):
        s, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 8, cond=c,
                               remat="none")
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(lf, argnums=(0, 1, 2))(params, x, cond)
        gs = jax.grad(ls, argnums=(0, 1, 2))(params, x, cond)
    _grads_match(gf, gs)


def test_fused_train_flat_grads_batch_edges():
    """Edge conditioning (ccp pad 3 -> 8) + batch > 1."""
    from vsnca_tpu.ops.pallas_train import fused_rollout_train_flat

    cfg = NCAConfig(c_in=12, fc_dim=16, padding_mode="circular",
                    conditioning="edges", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 128, 12)) - 0.5
    gray = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 128, 1))
    cond = make_conditioning(cfg, (8, 128), cond_img=gray, batch=2)

    def lf(p):
        _, rgb = fused_rollout_train_flat(p, x, 11.0, cfg, 4, cond_nhwc=cond,
                                          interpret=True)
        return jnp.mean(rgb ** 2)

    def ls(p):
        _, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 4,
                               cond=cond, remat="none")
        return jnp.mean(rgb ** 2)

    with pltpu.force_tpu_interpret_mode():
        _grads_match(jax.grad(lf)(params), jax.grad(ls)(params))


@pytest.mark.parametrize("conditioning", [None, "pos_emb"])
def test_fused_train_flat_scatter_grads_match_scan(conditioning):
    """The SCATTER backward (no whole-grid gp buffer — the 256px-class
    path) vs jax.grad through the scan: 3 row tiles exercise first/interior/
    last-tile scatter splits, the delayed-scatter ordering, and the deferred
    top-wrap chunk; 8 steps -> multi-segment reverse walk."""
    from vsnca_tpu.ops.pallas_train import fused_rollout_train_flat

    cfg = NCAConfig(c_in=12, fc_dim=16, padding_mode="circular",
                    conditioning=conditioning, update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 128, 12)) - 0.5
    cond = make_conditioning(cfg, (48, 128), batch=1)

    def lf(p, x, c):
        s, rgb = fused_rollout_train_flat(p, x, 5.0, cfg, 8, cond_nhwc=c,
                                          interpret=True,
                                          force_mode="scatter")
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    def ls(p, x, c):
        s, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 8, cond=c,
                               remat="none")
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    with pltpu.force_tpu_interpret_mode():
        if conditioning is None:
            gf = jax.grad(lf, argnums=(0, 1))(params, x, None)
            gs = jax.grad(ls, argnums=(0, 1))(params, x, None)
        else:
            gf = jax.grad(lf, argnums=(0, 1, 2))(params, x, cond)
            gs = jax.grad(ls, argnums=(0, 1, 2))(params, x, cond)
    _grads_match(gf, gs)


def test_plan_flat_train_selection():
    """128px stays on the gather backward; mid-size grids past the gather
    gp budget get the scatter backward; 256² (past the unrolled backwards'
    Mosaic stack wall, ~330 B/grid-pixel) gets the fori-over-tiles 'tiled'
    backward — the flagship-preset path (BASELINE configs 2-4)."""
    from vsnca_tpu.ops.pallas_train import plan_flat_train

    c12 = NCAConfig(c_in=12, fc_dim=96, conditioning="pos_emb",
                    padding_mode="circular")
    plan = plan_flat_train(c12, 128, 128, 64, need_dcond=False)
    assert plan is not None and plan[1] == "gather"
    # mid-size grid: gather's whole-grid gp no longer fits -> scatter
    plan = plan_flat_train(c12, 192, 128, 64, need_dcond=False)
    assert plan is not None and plan[1] == "scatter"
    # 256²: unrolled backwards blow the scoped-vmem stack -> tiled fori
    c13 = NCAConfig(c_in=13, seed_channels=12, fc_dim=96,
                    padding_mode="circular")
    plan = plan_flat_train(c13, 256, 256, 64, need_dcond=False)
    assert plan is not None and plan[1] == "tiled"
    # video-motion channel count at 256² also plans (multiscale gating is
    # fused_train_flat_supported's job, not the VMEM planner's)
    c16 = NCAConfig(c_in=16, fc_dim=128, padding_mode="circular")
    plan = plan_flat_train(c16, 256, 256, 64, need_dcond=False)
    assert plan is not None and plan[1] == "tiled"


@pytest.mark.parametrize("conditioning", [None, "pos_emb"])
def test_fused_train_flat_tiled_grads_match_scan(conditioning):
    """The TILED fori-over-tiles backward (the 256²-class path) vs jax.grad
    through the scan: >= 3 row tiles exercise the modular band reads, the
    delayed-scatter ordering under dynamic tile indices, the parked
    top-wrap chunk, and the per-tile checkpoint/gy retiling DMAs; 8 steps
    with segment from the plan exercise the reverse segment walk."""
    from vsnca_tpu.ops.pallas_train import fused_rollout_train_flat

    cfg = NCAConfig(c_in=12, fc_dim=16, padding_mode="circular",
                    conditioning=conditioning, update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 48, 128, 12)) - 0.5
    cond = make_conditioning(cfg, (48, 128), batch=2)

    def lf(p, x, c):
        s, rgb = fused_rollout_train_flat(p, x, 5.0, cfg, 8, cond_nhwc=c,
                                          interpret=True, force_mode="tiled")
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    def ls(p, x, c):
        s, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 8, cond=c,
                               remat="none")
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    with pltpu.force_tpu_interpret_mode():
        if conditioning is None:
            gf = jax.grad(lf, argnums=(0, 1))(params, x, None)
            gs = jax.grad(ls, argnums=(0, 1))(params, x, None)
        else:
            gf = jax.grad(lf, argnums=(0, 1, 2))(params, x, cond)
            gs = jax.grad(ls, argnums=(0, 1, 2))(params, x, cond)
    _grads_match(gf, gs)


def test_fused_train_flat_tiled_multisegment():
    """Tiled backward with segment > 1: the in-kernel tiled recompute
    (fori over k and t with dynamic states indexing) must replay the
    forward bit-exactly before the reverse walk."""
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat,
        plan_flat_train,
    )

    cfg = NCAConfig(c_in=12, fc_dim=16, padding_mode="circular",
                    update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 128, 12)) - 0.5
    plan = plan_flat_train(cfg, 32, 128, 12, force_mode="tiled")
    assert plan is not None and plan[1] == "tiled"

    def lf(p):
        _, rgb = fused_rollout_train_flat(p, x, 7.0, cfg, 12,
                                          interpret=True, force_mode="tiled",
                                          force_segment=4)
        return jnp.mean(rgb ** 2)

    def ls(p):
        _, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 12,
                               remat="none")
        return jnp.mean(rgb ** 2)

    with pltpu.force_tpu_interpret_mode():
        _grads_match(jax.grad(lf)(params), jax.grad(ls)(params))


def test_fused_train_flat_cond_no_grad_param_grads_identical():
    """cond_no_grad=True (the trainer's mode — conditioning carries no
    gradient) must leave param/state grads identical; only the cond
    cotangent becomes zeros."""
    from vsnca_tpu.ops.pallas_train import fused_rollout_train_flat

    cfg = NCAConfig(c_in=12, fc_dim=16, padding_mode="circular",
                    conditioning="pos_emb", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 128, 12)) - 0.5
    cond = make_conditioning(cfg, (8, 128), batch=1)

    def loss(p, x, flag):
        _, rgb = fused_rollout_train_flat(p, x, 5.0, cfg, 4, cond_nhwc=cond,
                                          interpret=True, cond_no_grad=flag)
        return jnp.mean(rgb ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss, argnums=(0, 1))(params, x, False)
        g2 = jax.grad(loss, argnums=(0, 1))(params, x, True)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


# ------------------------------------------------- multiscale (0,1) tiled pair


@pytest.mark.parametrize("conditioning", [None, "pos_emb"])
def test_fused_train_flat_tiled_ms_grads_match_scan(conditioning):
    """perception_scales (0,1) through the tiled pair (the video-motion
    preset's percept, fit_video_motion.py:129-130 / models/dynca.py:98-111)
    vs jax.grad through the XLA scan: exercises the anchor-lane ms percept
    inside recompute/pass-1 and the transposed down/stencil/up adjoint with
    4-row scatter edges. Forward is bitwise (same masks, same order)."""
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat,
        plan_flat_train,
    )

    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                    perception_scales=(0, 1), conditioning=conditioning,
                    update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 128, 8)) - 0.5
    cond = make_conditioning(cfg, (16, 128), batch=2)
    plan = plan_flat_train(cfg, 16, 128, 6)
    assert plan is not None and plan[1] == "tiled"

    def lf(p, x, c):
        s, rgb = fused_rollout_train_flat(p, x, 5.0, cfg, 6, cond_nhwc=c,
                                          interpret=True)
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    def ls(p, x, c):
        s, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 6, cond=c,
                               remat="none")
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    with pltpu.force_tpu_interpret_mode():
        if conditioning is None:
            gf = jax.grad(lf, argnums=(0, 1))(params, x, None)
            gs = jax.grad(ls, argnums=(0, 1))(params, x, None)
        else:
            gf = jax.grad(lf, argnums=(0, 1, 2))(params, x, cond)
            gs = jax.grad(ls, argnums=(0, 1, 2))(params, x, cond)
    _grads_match(gf, gs)


def test_fused_train_flat_tiled_ms_multisegment():
    """ms + segment>1: the tiled in-kernel recompute must replay the ms
    percept bit-exactly before the reverse walk (4 tiles, 2 segments)."""
    from vsnca_tpu.ops.pallas_train import fused_rollout_train_flat

    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                    perception_scales=(0, 1), update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 128, 8)) - 0.5

    def lf(p):
        _, rgb = fused_rollout_train_flat(p, x, 7.0, cfg, 8,
                                          interpret=True, force_segment=4)
        return jnp.mean(rgb ** 2)

    def ls(p):
        _, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 8,
                               remat="none")
        return jnp.mean(rgb ** 2)

    with pltpu.force_tpu_interpret_mode():
        _grads_match(jax.grad(lf)(params), jax.grad(ls)(params))


def test_fused_train_flat_tiled_ms_tr4_multitile_bands():
    """tile_rows=4 < _MS_HALO: the 5-row percept halo spans TWO neighbor
    tiles per side (_tiled_band's multi-tile path) and the 4-row adjoint
    reach covers a FULL neighbor tile — the 256^2 ms plan's geometry."""
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat,
        plan_flat_train,
    )

    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                    perception_scales=(0, 1), update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 128, 8)) - 0.5
    assert plan_flat_train(cfg, 8, 128, 4) == (1, "tiled", 4)

    def lf(p):
        _, rgb = fused_rollout_train_flat(p, x, 5.0, cfg, 4, interpret=True)
        return jnp.mean(rgb ** 2)

    def ls(p):
        _, rgb = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 4,
                               remat="none")
        return jnp.mean(rgb ** 2)

    with pltpu.force_tpu_interpret_mode():
        _grads_match(jax.grad(lf)(params), jax.grad(ls)(params))


def test_plan_flat_train_ms_gating():
    """ms restricts the plan to the tiled pair with tile_rows >= _MS_HALO;
    odd grids are rejected; scale-0 planning is unchanged."""
    from vsnca_tpu.ops.pallas_train import plan_flat_train

    ms16 = NCAConfig(c_in=16, fc_dim=128, padding_mode="circular",
                     perception_scales=(0, 1))
    plan = plan_flat_train(ms16, 128, 128, 64, need_dcond=False)
    assert plan is not None and plan[1] == "tiled" and plan[2] >= 5
    assert plan_flat_train(ms16, 129, 128, 64) is None  # odd H


def test_trainer_chunked_tap_fused_matches_xla_taps():
    """The trainer's tapped (video-motion) rollout as n_motion_frames
    fused chunks == the XLA two-level tap scan, end-to-end through
    make_train_step at update_rate=1.0: identical loss and updated params
    (the chunked path is how the 256^2 video-motion preset trains on
    TPU — reference hot loop fit_video_motion.py:229-235)."""
    import optax

    from vsnca_tpu.losses.orchestrator import LossState
    from vsnca_tpu.config import LossConfig
    from vsnca_tpu.train.trainer import make_train_step

    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                    conditioning="pos_emb", update_rate=1.0)
    loss_state = LossState(cfg=LossConfig(overflow_weight=1.0))
    opt = optax.adam(1e-3)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    opt_state = opt.init(params)
    states = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 128, 8)) - 0.5
    key = jax.random.PRNGKey(2)

    outs = {}
    with pltpu.force_tpu_interpret_mode():
        for rp in ("fused", "xla"):
            step = make_train_step(cfg, loss_state, opt, rollout_path=rp)
            p2, _, new_states, loss, _ = step(
                params, opt_state, states, key, {},
                step_n=8, n_motion_frames=2, tap_every=4,
            )
            outs[rp] = (p2, new_states, float(loss))

    assert outs["fused"][2] == pytest.approx(outs["xla"][2], rel=1e-5)
    _grads_match(outs["fused"][0], outs["xla"][0], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(outs["fused"][1]), np.asarray(outs["xla"][1]),
        rtol=1e-4, atol=1e-5,
    )
