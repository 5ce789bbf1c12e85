"""Trainer, pool, and end-to-end training smoke tests (small shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsnca_tpu.config import LossConfig, NCAConfig, TrainConfig
from vsnca_tpu.models.dynca import dynca_seed
from vsnca_tpu.models.vgg import vgg16_random_init
from vsnca_tpu.pool.sample_pool import DevicePool, ListPool, inject_seed_into_batch
from vsnca_tpu.train.optim import make_optimizer, multistep_lr, normalize_grads
from vsnca_tpu.train.trainer import DyNCATrainer


def small_setup(**loss_kw):
    nca = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb")
    loss = LossConfig(overflow_weight=100.0, appearance_weight=1.0,
                      appearance_loss_type="Gram", **loss_kw)
    train = TrainConfig(img_size=(24, 24), batch_size=2, pool_size=8,
                        step_range=(4, 9), step_buckets=(4, 8),
                        inject_seed_every=2, lr=1e-3,
                        lr_decay_steps=(100,), max_iterations=4)
    return nca, loss, train


def test_normalize_grads():
    g = {"a": jnp.ones((3, 3)) * 2.0, "b": jnp.zeros((2,))}
    n = normalize_grads(g)
    np.testing.assert_allclose(float(jnp.linalg.norm(n["a"].reshape(-1))), 1.0, rtol=1e-5)
    assert np.isfinite(np.asarray(n["b"])).all()  # zero grad stays finite


def test_multistep_lr_schedule():
    sched = multistep_lr(1e-3, (10, 20), 0.5)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(10)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(25)), 2.5e-4, rtol=1e-5)


def test_device_pool_roundtrip():
    cfg = NCAConfig(c_in=4)
    pool = DevicePool(dynca_seed(cfg, 8, 6))
    rng = np.random.RandomState(0)
    idx = pool.sample_indices(rng, 3)
    assert len(set(idx.tolist())) == 3  # without replacement
    batch = pool.gather(idx)
    batch = batch + 1.0
    pool.scatter(idx, batch)
    np.testing.assert_allclose(np.asarray(pool.gather(idx)), np.asarray(batch))

    # keep_channels strip
    wide = jnp.concatenate([batch, jnp.ones(batch.shape[:3] + (1,))], -1)
    pool.scatter(idx, wide, keep_channels=4)
    assert pool.states.shape[-1] == 4


def test_inject_seed_into_batch():
    batch = jnp.ones((3, 4, 4, 2))
    seed = jnp.zeros((1, 4, 4, 2))
    out = inject_seed_into_batch(batch, seed, 1)
    assert float(out[0].sum()) == 0.0 and float(out[1].sum()) == 32.0


def test_list_pool_reseeds_none_and_dead():
    pool = ListPool(4)
    reseeds = []

    def reseed(n):
        reseeds.append(n)
        return np.zeros((n, 2, 2, 3), np.float32)

    out = pool.get([0, 1], reseed)
    assert out.shape == (2, 2, 2, 3) and len(reseeds) == 2
    pool.set([0], np.ones((1, 2, 2, 3), np.float32))
    out2 = pool.get([0], reseed, is_dead_fn=lambda e: e.max() > 0.5)
    assert float(out2.sum()) == 0.0  # "alive but dead" entry was reseeded


def test_trainer_runs_and_loss_decreases():
    nca, loss, train = small_setup()
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    trainer = DyNCATrainer(nca, loss, train, vgg_params=vgg)
    style = jnp.asarray(
        np.random.RandomState(0).rand(2, 24, 24, 3).astype(np.float32) * 2 - 1
    )
    losses = []
    for _ in range(6):
        log = trainer.train_iteration({"target_style": style}, step_n=4)
        losses.append(log.loss)
    assert all(np.isfinite(losses))
    assert trainer.iteration == 6
    assert "overflow" in trainer.history[0].logs
    # stochastic but should trend down over a few iterations on a fixed target
    assert min(losses[3:]) <= losses[0] * 1.5


def test_trainer_step_bucket_snapping():
    nca, loss, train = small_setup()
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    trainer = DyNCATrainer(nca, loss, train, vgg_params=vgg)
    for _ in range(20):
        assert trainer.sample_step_n() in train.step_buckets


def test_trainer_extra_channel_variant():
    """ExtraChannels: seed 5ch, cell 6ch, grayscale appended, pool stripped."""
    nca = NCAConfig(c_in=6, seed_channels=5, fc_dim=16, conditioning=None)
    loss = LossConfig(overflow_weight=100.0, appearance_weight=1.0,
                      appearance_loss_type="Gram")
    train = TrainConfig(img_size=(16, 16), batch_size=2, pool_size=4,
                        step_buckets=(4,), step_range=(4, 5),
                        inject_seed_every=2, max_iterations=2)
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    trainer = DyNCATrainer(nca, loss, train, vgg_params=vgg)
    assert trainer.pool.states.shape[-1] == 5
    rng = np.random.RandomState(1)
    style = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1)
    gs = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    log = trainer.train_iteration(
        {"target_style": style, "aux_gs": gs}, step_n=4
    )
    assert np.isfinite(log.loss)
    assert trainer.pool.states.shape[-1] == 5  # strip happened


def test_trainer_nan_abort(monkeypatch):
    nca, loss, train = small_setup()
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    trainer = DyNCATrainer(nca, loss, train, vgg_params=vgg)
    bad = jnp.full((2, 24, 24, 3), jnp.nan)
    with pytest.raises(FloatingPointError):
        trainer.train_iteration({"target_style": bad}, step_n=4)


def test_trainer_reseed_pool_slots():
    nca, loss, train = small_setup()
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    trainer = DyNCATrainer(nca, loss, train, vgg_params=vgg)
    trainer.pool.scatter(np.asarray([0, 1]), jnp.full((2, 24, 24, 6), 9.0))
    trainer.reseed_pool_slots(np.asarray([0, 1]))
    assert float(jnp.abs(trainer.pool.gather(np.asarray([0, 1]))).max()) <= 0.5


def test_trainer_style_consistency_wired_and_zero_grad():
    """style_consistency_weight != 0 must run (the trainer supplies
    nca_params — reference style_consistency_loss.py:15-37) and, being
    computed under stop_gradient like the reference's no_grad, must leave
    the parameter update identical to the weight=0 run."""
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    style = jnp.asarray(
        np.random.RandomState(0).rand(2, 24, 24, 3).astype(np.float32) * 2 - 1
    )
    runs = {}
    for w in (0.0, 5.0):
        nca, loss, train = small_setup(style_consistency_weight=w)
        trainer = DyNCATrainer(nca, loss, train, vgg_params=vgg)
        log = trainer.train_iteration({"target_style": style}, step_n=4)
        assert np.isfinite(log.loss)
        if w != 0:
            assert "style_consistency" in log.logs
            assert np.isfinite(log.logs["style_consistency"])
        runs[w] = trainer.params
    for a, b in zip(
        jax.tree_util.tree_leaves(runs[0.0]), jax.tree_util.tree_leaves(runs[5.0])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
