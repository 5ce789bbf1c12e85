"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsnca_tpu.config import LossConfig, NCAConfig
from vsnca_tpu.losses.orchestrator import LossState
from vsnca_tpu.models.dynca import dynca_init, dynca_rollout, dynca_seed
from vsnca_tpu.models.vgg import vgg16_random_init
from vsnca_tpu.parallel.mesh import make_mesh, shard_along
from vsnca_tpu.parallel.spatial import spatial_rollout
from vsnca_tpu.parallel.train_dp import make_dp_train_step
from vsnca_tpu.train.optim import make_optimizer
from vsnca_tpu.train.trainer import make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 virtual devices"
)


def test_make_mesh_axes():
    mesh = make_mesh({"data": 2, "space": 2}, jax.devices()[:4])
    assert mesh.shape == {"data": 2, "space": 2}


def test_spatial_rollout_matches_dense_with_deterministic_mask():
    """With update_rate=1.0 the mask is all-ones, so the sharded rollout
    must match the dense rollout exactly (circular padding = ring halo)."""
    n = 4
    mesh = make_mesh({"space": n}, jax.devices()[:n])
    cfg = NCAConfig(c_in=6, fc_dim=16, padding_mode="circular", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 12, 6)) - 0.5

    s_sharded, rgb_sharded = spatial_rollout(
        params, x, jax.random.PRNGKey(2), cfg, 5, mesh
    )
    s_dense, rgb_dense = dynca_rollout(
        params, x, jax.random.PRNGKey(2), cfg, 5, remat="none"
    )
    np.testing.assert_allclose(
        np.asarray(s_sharded), np.asarray(s_dense), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("pad_mode", ["replicate", "zeros"])
def test_spatial_rollout_edge_padding_modes(pad_mode):
    n = 4
    mesh = make_mesh({"space": n}, jax.devices()[:n])
    cfg = NCAConfig(c_in=4, fc_dim=8, padding_mode=pad_mode, update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 8, 4)) - 0.5
    s_sharded, _ = spatial_rollout(params, x, jax.random.PRNGKey(2), cfg, 3, mesh)
    s_dense, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 3, remat="none")
    np.testing.assert_allclose(
        np.asarray(s_sharded), np.asarray(s_dense), rtol=1e-4, atol=1e-5
    )


def test_dp_train_step_runs_sharded():
    n = 4
    mesh = make_mesh({"data": n}, jax.devices()[:n])
    nca_cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb")
    loss_cfg = LossConfig(overflow_weight=100.0, appearance_weight=1.0,
                          appearance_loss_type="Gram")
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    loss_state = LossState(cfg=loss_cfg, vgg_params=vgg)
    optimizer = make_optimizer(1e-3)
    step = make_train_step(nca_cfg, loss_state, optimizer)
    dp_step = make_dp_train_step(step, mesh)

    params = dynca_init(jax.random.PRNGKey(1), nca_cfg)
    opt_state = optimizer.init(params)
    states = dynca_seed(nca_cfg, n, 16)
    style = jnp.asarray(
        np.random.RandomState(0).rand(n, 16, 16, 3).astype(np.float32) * 2 - 1
    )
    new_params, _, new_states, loss, logs = dp_step(
        params, opt_state, states, jax.random.PRNGKey(2),
        {"target_style": style}, step_n=4,
    )
    assert np.isfinite(float(loss))
    assert new_states.shape == states.shape
    # params must have changed (an update was applied)
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(new_params), jax.tree_util.tree_leaves(params)
        )
    )
    assert diff > 0


def test_dp_matches_single_device():
    """The sharded step must compute the same update as the unsharded one
    (same inputs, same key)."""
    n = 2
    mesh = make_mesh({"data": n}, jax.devices()[:n])
    nca_cfg = NCAConfig(c_in=4, fc_dim=8, conditioning=None, update_rate=1.0)
    loss_cfg = LossConfig(overflow_weight=100.0)
    loss_state = LossState(cfg=loss_cfg)
    optimizer = make_optimizer(1e-3)
    step = make_train_step(nca_cfg, loss_state, optimizer)
    dp_step = make_dp_train_step(step, mesh)

    params = dynca_init(jax.random.PRNGKey(1), nca_cfg)
    opt_state = optimizer.init(params)
    states = jax.random.uniform(jax.random.PRNGKey(3), (n, 8, 8, 4)) - 0.5
    key = jax.random.PRNGKey(2)

    p1, _, s1, l1, _ = step(params, opt_state, states, key, {}, step_n=3)
    p2, _, s2, l2, _ = dp_step(params, opt_state, states, key, {}, step_n=3)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_trainer_dp_mesh_matches_single_device():
    """DyNCATrainer(mesh=...) — the integrated data-parallel path — must
    track the single-device trainer exactly (same seeds → same RNG stream →
    same pool indices/keys; only the reduction order differs)."""
    from vsnca_tpu.config import TrainConfig
    from vsnca_tpu.train.trainer import DyNCATrainer

    n = 4
    mesh = make_mesh({"data": n}, jax.devices()[:n])
    nca_cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb")
    loss_cfg = LossConfig(overflow_weight=100.0, appearance_weight=1.0,
                          appearance_loss_type="Gram")
    train_cfg = TrainConfig(img_size=(16, 16), batch_size=n, pool_size=8,
                            step_range=(3, 4), step_buckets=(3,),
                            max_iterations=3, remat="none",
                            inject_seed_every=1,  # ONE jit program/trainer
                            rollout_path="xla")
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    style = jnp.asarray(
        np.random.RandomState(1).rand(n, 16, 16, 3).astype(np.float32) * 2 - 1
    )

    t_ref = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg, seed=7)
    t_dp = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg, seed=7,
                        mesh=mesh)

    for _ in range(3):
        l_ref = t_ref.train_iteration({"target_style": style})
        l_dp = t_dp.train_iteration({"target_style": style})
        np.testing.assert_allclose(l_ref.loss, l_dp.loss, rtol=1e-5)

    for a, b in zip(
        jax.tree_util.tree_leaves(t_ref.params),
        jax.tree_util.tree_leaves(t_dp.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # pool write-backs must land identically through the sharded scatter
    np.testing.assert_allclose(
        np.asarray(t_ref.pool.states), np.asarray(t_dp.pool.states),
        rtol=1e-4, atol=1e-6,
    )


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)


def test_trainer_dp_mesh_tap_schedule_matches_single_device():
    """The reference tap schedule (tap_chunks + frameless tail) under a
    data-parallel mesh must track the single-device trainer exactly — the
    chunked XLA rollout + per-frame loss list all partition over the batch
    axis with no resharding surprises."""
    from vsnca_tpu.config import TrainConfig
    from vsnca_tpu.train.trainer import DyNCATrainer

    n = 4
    mesh = make_mesh({"data": n}, jax.devices()[:n])
    nca_cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb")
    loss_cfg = LossConfig(overflow_weight=100.0, appearance_weight=1.0,
                          appearance_loss_type="Gram",
                          video_motion_weight=5.0,
                          video_motion_loss_type="MotionGram",
                          motion_img_size=(16, 16))
    train_cfg = TrainConfig(img_size=(16, 16), batch_size=n, pool_size=8,
                            step_range=(9, 10), step_buckets=(9,),
                            max_iterations=2, remat="none",
                            inject_seed_every=1,  # ONE jit program/trainer
                            rollout_path="xla")
    from vsnca_tpu.models.dynca import tap_schedule
    from vsnca_tpu.models.msoe import msoe_random_init

    chunks, tail = tap_schedule(9, 4)  # frames after steps 1, 5, 9; tail 0
    assert chunks == (1, 4, 4) and tail == 0
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    msoe = msoe_random_init(jax.random.PRNGKey(1))
    style = jnp.asarray(
        np.random.RandomState(1).rand(n, 16, 16, 3).astype(np.float32) * 2 - 1
    )
    tgt_motion = jnp.stack([style * (0.9 - 0.1 * k) for k in range(3)])
    inputs = {"target_style": style, "target_motion_frames": tgt_motion}

    t_ref = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg,
                         msoe_params=msoe, seed=7)
    t_dp = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg,
                        msoe_params=msoe, seed=7, mesh=mesh)

    for _ in range(2):
        l_ref = t_ref.train_iteration(dict(inputs), step_n=9,
                                      tap_chunks=chunks, tail_steps=tail)
        l_dp = t_dp.train_iteration(dict(inputs), step_n=9,
                                    tap_chunks=chunks, tail_steps=tail)
        np.testing.assert_allclose(l_ref.loss, l_dp.loss, rtol=1e-5)

    for a, b in zip(
        jax.tree_util.tree_leaves(t_ref.params),
        jax.tree_util.tree_leaves(t_dp.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_fused_dp_shard_map_matches_single_device_fused():
    """The shard_map'd flat custom-VJP pair (parallel/fused_dp.py) must
    equal the single-device fused call exactly at update_rate=1.0 —
    forward state, rgb, AND param grads (shard_map's transpose inserts
    the psum for the replicated params)."""
    from jax.experimental.pallas import tpu as pltpu

    from vsnca_tpu.models.dynca import make_conditioning
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat,
        fused_train_flat_supported,
    )
    from vsnca_tpu.parallel.fused_dp import fused_rollout_train_flat_dp

    n = 4
    mesh = make_mesh({"data": n}, jax.devices()[:n])
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                    conditioning="pos_emb", update_rate=1.0)
    assert fused_train_flat_supported(cfg, 16, 128, 6, need_dcond=False)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 16, 128, 8)) - 0.5
    cond = make_conditioning(cfg, (16, 128), batch=n)
    seed_f = jnp.float32(12345.0)

    with pltpu.force_tpu_interpret_mode():
        def loss_single(p):
            s, rgb = fused_rollout_train_flat(
                p, x, seed_f, cfg, 6, cond_nhwc=cond, cond_no_grad=True
            )
            return jnp.sum(s ** 2) + jnp.sum(rgb ** 2)

        def loss_dp(p):
            s, rgb = fused_rollout_train_flat_dp(
                mesh, "data", p, x, seed_f, cfg, 6,
                cond_nhwc=cond, cond_no_grad=True,
            )
            return jnp.sum(s ** 2) + jnp.sum(rgb ** 2)

        (v1, g1) = jax.value_and_grad(loss_single)(params)
        (v2, g2) = jax.value_and_grad(loss_dp)(params)

    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_fused_dp_taps_matches_single_device():
    """In-kernel tap frames under shard_map == single-device taps."""
    from jax.experimental.pallas import tpu as pltpu

    from vsnca_tpu.models.dynca import make_conditioning
    from vsnca_tpu.ops.pallas_train import fused_rollout_train_flat
    from vsnca_tpu.parallel.fused_dp import fused_rollout_train_flat_dp

    n = 2
    mesh = make_mesh({"data": n}, jax.devices()[:n])
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                    conditioning="pos_emb", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 16, 128, 8)) - 0.5
    cond = make_conditioning(cfg, (16, 128), batch=n)
    seed_f = jnp.float32(7.0)

    with pltpu.force_tpu_interpret_mode():
        s1, r1, taps1 = fused_rollout_train_flat(
            params, x, seed_f, cfg, 6, cond_nhwc=cond, cond_no_grad=True,
            tap_steps=(1, 4),
        )
        s2, r2, taps2 = fused_rollout_train_flat_dp(
            mesh, "data", params, x, seed_f, cfg, 6,
            cond_nhwc=cond, cond_no_grad=True, tap_steps=(1, 4),
        )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(taps1, taps2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_trainer_dp_mesh_fused_matches_single_device():
    """DyNCATrainer(mesh=..., rollout_path='fused') — the composed
    scale-out + flagship path (the r3 downgrade is gone) — must track the
    single-device fused trainer exactly at update_rate=1.0."""
    from jax.experimental.pallas import tpu as pltpu

    from vsnca_tpu.config import TrainConfig
    from vsnca_tpu.train.trainer import DyNCATrainer

    n = 4
    mesh = make_mesh({"data": n}, jax.devices()[:n])
    nca_cfg = NCAConfig(c_in=8, fc_dim=16, conditioning="pos_emb",
                        padding_mode="circular", update_rate=1.0)
    loss_cfg = LossConfig(overflow_weight=100.0, appearance_weight=1.0,
                          appearance_loss_type="Gram")
    train_cfg = TrainConfig(img_size=(16, 128), batch_size=n, pool_size=8,
                            step_range=(4, 5), step_buckets=(4,),
                            max_iterations=2, remat="none",
                            inject_seed_every=1,  # ONE jit program/trainer
                            rollout_path="fused")
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    style = jnp.asarray(
        np.random.RandomState(1).rand(n, 16, 128, 3).astype(np.float32) * 2 - 1
    )

    with pltpu.force_tpu_interpret_mode():
        t_ref = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg,
                             seed=7)
        t_dp = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg,
                            seed=7, mesh=mesh)
        for _ in range(2):
            l_ref = t_ref.train_iteration({"target_style": style}, step_n=4)
            l_dp = t_dp.train_iteration({"target_style": style}, step_n=4)
            np.testing.assert_allclose(l_ref.loss, l_dp.loss, rtol=1e-5)

    for a, b in zip(
        jax.tree_util.tree_leaves(t_ref.params),
        jax.tree_util.tree_leaves(t_dp.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(t_ref.pool.states), np.asarray(t_dp.pool.states),
        rtol=1e-4, atol=1e-6,
    )


def test_spatial_rollout_multiscale_matches_dense():
    """scales (0,1) + circular: the 6-row-halo sharded rollout must equal
    the dense perceive_multiscale rollout exactly at update_rate=1.0 —
    the config-3 (video-motion) percept is now spatially shardable."""
    n = 4
    mesh = make_mesh({"space": n}, jax.devices()[:n])
    cfg = NCAConfig(c_in=6, fc_dim=16, padding_mode="circular",
                    update_rate=1.0, perception_scales=(0, 1))
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    # H=32 -> 8-row slabs (even, >= 6-row halo); W=12 stays unsharded
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 12, 6)) - 0.5

    s_sharded, _ = spatial_rollout(
        params, x, jax.random.PRNGKey(2), cfg, 5, mesh
    )
    s_dense, _ = dynca_rollout(
        params, x, jax.random.PRNGKey(2), cfg, 5, remat="none"
    )
    np.testing.assert_allclose(
        np.asarray(s_sharded), np.asarray(s_dense), rtol=1e-4, atol=1e-5
    )


def test_spatial_rollout_multiscale_with_conditioning():
    """ms sharding with a sharded conditioning tensor (pos_emb slabs)."""
    n = 2
    mesh = make_mesh({"space": n}, jax.devices()[:n])
    cfg = NCAConfig(c_in=6, fc_dim=16, padding_mode="circular",
                    update_rate=1.0, perception_scales=(0, 1),
                    conditioning="pos_emb")
    from vsnca_tpu.models.dynca import make_conditioning

    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 12, 6)) - 0.5
    cond = make_conditioning(cfg, (16, 12), batch=1)

    s_sharded, _ = spatial_rollout(
        params, x, jax.random.PRNGKey(2), cfg, 3, mesh, cond=cond
    )
    s_dense, _ = dynca_rollout(
        params, x, jax.random.PRNGKey(2), cfg, 3, cond=cond, remat="none"
    )
    np.testing.assert_allclose(
        np.asarray(s_sharded), np.asarray(s_dense), rtol=1e-4, atol=1e-5
    )
