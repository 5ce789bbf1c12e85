"""Fleet training (train/multi.py): M independent models in one program.

Equality bar: model m of a MultiStyleTrainer must track an independent
DyNCATrainer(seed=seeds[m]) exactly (same key/RNG sequences by construction;
float tolerance only for batched-vs-unbatched conv reassociation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsnca_tpu.config import LossConfig, NCAConfig, TrainConfig
from vsnca_tpu.models.vgg import vgg16_random_init
from vsnca_tpu.parallel.mesh import make_mesh
from vsnca_tpu.train.multi import MultiStyleTrainer
from vsnca_tpu.train.trainer import DyNCATrainer


SEEDS = (3, 11)


def _cfgs():
    nca_cfg = NCAConfig(c_in=6, fc_dim=16, padding_mode="circular")
    loss_cfg = LossConfig(
        overflow_weight=100.0, appearance_weight=1.0,
        appearance_loss_type="Gram",
    )
    train_cfg = TrainConfig(
        img_size=(24, 24), batch_size=2, pool_size=8, step_range=(4, 5),
        step_buckets=(4,), max_iterations=3, remat="none",
        inject_seed_every=2, rollout_path="xla",
    )
    return nca_cfg, loss_cfg, train_cfg


def _styles(train_cfg, n):
    rng = np.random.RandomState(0)
    h, w = train_cfg.img_size
    return [
        jnp.asarray(
            rng.rand(train_cfg.batch_size, h, w, 3).astype(np.float32) * 2 - 1
        )
        for _ in range(n)
    ]


def _run_single_trainers(nca_cfg, loss_cfg, train_cfg, vgg, styles, iters=3):
    outs = []
    for m, s in enumerate(SEEDS):
        t = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg, seed=s)
        losses = [
            t.train_iteration({"target_style": styles[m]}, step_n=4).loss
            for _ in range(iters)
        ]
        outs.append((t, losses))
    return outs


def _assert_fleet_matches(multi, singles, iters_losses_rtol=1e-5):
    for m, (t_ref, ref_losses) in enumerate(singles):
        got = [float(log.losses[m]) for log in multi.history]
        np.testing.assert_allclose(got, ref_losses, rtol=iters_losses_rtol)
        for a, b in zip(
            jax.tree_util.tree_leaves(multi.model_params(m)),
            jax.tree_util.tree_leaves(t_ref.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )
        np.testing.assert_allclose(
            np.asarray(multi.pools[m]), np.asarray(t_ref.pool.states),
            rtol=1e-4, atol=1e-6,
        )


def test_multi_vmap_matches_independent_trainers():
    nca_cfg, loss_cfg, train_cfg = _cfgs()
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    styles = _styles(train_cfg, len(SEEDS))

    multi = MultiStyleTrainer(
        nca_cfg, loss_cfg, train_cfg, seeds=SEEDS, vgg_params=vgg
    )
    stacked = {"target_style": jnp.stack(styles)}
    for _ in range(3):
        multi.train_iteration(stacked, step_n=4)

    singles = _run_single_trainers(nca_cfg, loss_cfg, train_cfg, vgg, styles)
    _assert_fleet_matches(multi, singles)


def test_multi_mesh_matches_independent_trainers():
    if jax.device_count() < len(SEEDS):
        pytest.skip("needs one device per model")
    nca_cfg, loss_cfg, train_cfg = _cfgs()
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    styles = _styles(train_cfg, len(SEEDS))

    mesh = make_mesh({"model": len(SEEDS)}, jax.devices()[: len(SEEDS)])
    multi = MultiStyleTrainer(
        nca_cfg, loss_cfg, train_cfg, seeds=SEEDS, vgg_params=vgg, mesh=mesh
    )
    stacked = {"target_style": jnp.stack(styles)}
    for _ in range(3):
        multi.train_iteration(stacked, step_n=4)

    singles = _run_single_trainers(nca_cfg, loss_cfg, train_cfg, vgg, styles)
    _assert_fleet_matches(multi, singles)


def test_multi_mesh_multiple_models_per_device():
    """M > n_devices: the local shard body is vmapped (m_loc=2 path)."""
    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    nca_cfg, loss_cfg, train_cfg = _cfgs()
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    seeds = (3, 11, 17, 23)
    rng = np.random.RandomState(0)
    h, w = train_cfg.img_size
    styles = jnp.asarray(
        rng.rand(len(seeds), train_cfg.batch_size, h, w, 3).astype(np.float32)
        * 2 - 1
    )

    mesh = make_mesh({"model": 2}, jax.devices()[:2])
    multi = MultiStyleTrainer(
        nca_cfg, loss_cfg, train_cfg, seeds=seeds, vgg_params=vgg, mesh=mesh
    )
    vmap_multi = MultiStyleTrainer(
        nca_cfg, loss_cfg, train_cfg, seeds=seeds, vgg_params=vgg
    )
    for _ in range(2):
        lm = multi.train_iteration({"target_style": styles}, step_n=4)
        lv = vmap_multi.train_iteration({"target_style": styles}, step_n=4)
        np.testing.assert_allclose(lm.losses, lv.losses, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(multi.params),
        jax.tree_util.tree_leaves(vmap_multi.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_multi_nan_guard_names_model():
    nca_cfg, loss_cfg, train_cfg = _cfgs()
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    multi = MultiStyleTrainer(
        nca_cfg, loss_cfg, train_cfg, seeds=SEEDS, vgg_params=vgg
    )
    h, w = train_cfg.img_size
    bad = np.full((train_cfg.batch_size, h, w, 3), np.nan, np.float32)
    good = np.zeros((train_cfg.batch_size, h, w, 3), np.float32)
    stacked = {"target_style": jnp.asarray(np.stack([good, bad]))}
    with pytest.raises(FloatingPointError, match=r"models \[1\]"):
        multi.train_iteration(stacked, step_n=4)
