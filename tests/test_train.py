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


def test_tap_schedule_reference_rule():
    """tap_schedule == the reference's middle_feature_list[::interval]
    slicing (fit_video_motion.py:230-235): frames after steps 1, 1+k, ...
    <= step_n, tail to step_n, total exactly step_n."""
    from vsnca_tpu.models.dynca import tap_schedule

    for step_n in (1, 2, 63, 64, 65, 80, 96, 128, 129, 143, 144):
        chunks, tail = tap_schedule(step_n, 64)
        # reference frame positions: entry k of the middle list is the RGB
        # after step k+1; [::64] keeps entries 0, 64, 128, ...
        want_frames = [k + 1 for k in range(step_n) if k % 64 == 0]
        got_frames = list(np.cumsum(chunks))
        assert got_frames == want_frames, (step_n, chunks)
        assert sum(chunks) + tail == step_n
        assert tail >= 0
    # 2 frames for the default range's typical draw, 3 past 129
    assert len(tap_schedule(112, 64)[0]) == 2
    assert len(tap_schedule(140, 64)[0]) == 3


def test_trainer_tap_schedule_matches_plain_rollout():
    """With update_rate=1.0 (deterministic masks), the scheduled tapped
    rollout must produce the same final state as one plain step_n-step
    rollout, and its frames must equal the RGB after steps 1 and 1+k —
    i.e. the trainer rolls step_n TOTAL steps (reference semantics), not
    n_frames*tap_every."""
    import optax

    from vsnca_tpu.losses.orchestrator import LossState
    from vsnca_tpu.models.dynca import dynca_init, dynca_rollout
    from vsnca_tpu.train.trainer import make_train_step

    cfg = NCAConfig(c_in=6, fc_dim=16, padding_mode="circular",
                    conditioning="pos_emb", update_rate=1.0)
    loss_state = LossState(cfg=LossConfig(overflow_weight=1.0))
    opt = optax.sgd(0.0)  # keep params fixed; we inspect states
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    opt_state = opt.init(params)
    states = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 6)) - 0.5
    key = jax.random.PRNGKey(2)

    step_n, tap = 11, 4  # frames after steps 1, 5, 9; tail 2
    from vsnca_tpu.models.dynca import tap_schedule

    chunks, tail = tap_schedule(step_n, tap)
    assert chunks == (1, 4, 4) and tail == 2

    step = make_train_step(cfg, loss_state, opt, rollout_path="xla")
    _, _, new_states, loss, _ = step(
        params, opt_state, states, key, {},
        step_n=step_n, tap_chunks=chunks, tail_steps=tail,
    )

    from vsnca_tpu.models.dynca import make_conditioning

    cond = make_conditioning(cfg, (16, 16), batch=1)
    ref_state, _ = dynca_rollout(
        params, states, jax.random.PRNGKey(9), cfg, step_n, cond=cond,
        remat="none",
    )
    np.testing.assert_allclose(
        np.asarray(new_states), np.asarray(ref_state), rtol=1e-5, atol=1e-5
    )


def test_trainer_tap_schedule_fused_matches_xla():
    """The mixed fused/XLA scheduled path == the all-XLA scheduled path
    end-to-end through make_train_step at update_rate=1.0 (the 1-step
    chunk always rides XLA; 4-step chunks + the tail ride the flat pair)."""
    import optax

    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    from vsnca_tpu.losses.orchestrator import LossState
    from vsnca_tpu.models.dynca import dynca_init
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
                step_n=11, tap_chunks=(1, 4, 4), tail_steps=2,
            )
            outs[rp] = (p2, new_states, float(loss))

    assert outs["fused"][2] == pytest.approx(outs["xla"][2], rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs["fused"][1]), np.asarray(outs["xla"][1]),
        rtol=1e-4, atol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(outs["fused"][0]),
        jax.tree_util.tree_leaves(outs["xla"][0]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_trainer_degenerate_single_chunk_schedule():
    """tap_chunks=(k,) with tail_steps=0 has its only frame AT the final
    state — no interior taps. The fused path must fall through to the
    chunked kernel instead of calling the taps variant with tap_steps=()
    (which returns a 2-tuple and used to raise at trace time)."""
    import optax

    from jax.experimental.pallas import tpu as pltpu

    from vsnca_tpu.losses.orchestrator import LossState
    from vsnca_tpu.models.dynca import dynca_init
    from vsnca_tpu.train.trainer import make_train_step

    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                    conditioning="pos_emb", update_rate=1.0)
    loss_state = LossState(cfg=LossConfig(overflow_weight=1.0))
    opt = optax.adam(1e-3)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    opt_state = opt.init(params)
    states = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 128, 8)) - 0.5
    key = jax.random.PRNGKey(2)

    outs = {}
    with pltpu.force_tpu_interpret_mode():
        for rp in ("fused", "xla"):
            step = make_train_step(cfg, loss_state, opt, rollout_path=rp)
            _, _, new_states, loss, _ = step(
                params, opt_state, states, key, {},
                step_n=4, tap_chunks=(4,), tail_steps=0,
            )
            outs[rp] = (new_states, float(loss))

    assert outs["fused"][1] == pytest.approx(outs["xla"][1], rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs["fused"][0]), np.asarray(outs["xla"][0]),
        rtol=1e-4, atol=1e-5,
    )
