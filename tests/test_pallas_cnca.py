"""Fused ConditionedNCA rollout kernel (ops/pallas_cnca.py) vs the XLA
step under the TPU interpreter, fire_rate=1.0 (deterministic — interpret
prng bits are zeros, so rate<1 masks are degenerate on CPU; the stochastic
path is hardware-checked in tests/test_tpu_hardware.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vsnca_tpu.config import ConditionedNCAConfig
from vsnca_tpu.models.conditioned_nca import (
    conditioned_nca_grow,
    conditioned_nca_init,
    conditioned_nca_seed,
    encode_goal,
)
from vsnca_tpu.ops.pallas_cnca import (
    fused_cnca_rollout,
    fused_cnca_supported,
)


@pytest.mark.parametrize("size", [64, 32])
def test_fused_cnca_matches_xla(size):
    """Whole-rollout kernel == the scan of conditioned_nca_step: learnable
    depthwise percept folded to per-channel columns + permuted w1, zero
    padding via edge masks, alive pre&post life gate, per-pixel mask,
    clamp (reference EncoderConditioning/nca.py:176-209)."""
    cfg = ConditionedNCAConfig(cell_fire_rate=1.0, image_size=size)
    assert fused_cnca_supported(cfg, size, size)
    params = conditioned_nca_init(jax.random.PRNGKey(0), cfg)
    x = conditioned_nca_seed(cfg, 2, size)
    x = x + 0.3 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    goal = jax.random.uniform(jax.random.PRNGKey(2), (2, size, size, 3))
    genc = encode_goal(params, cfg, goal)

    ref = conditioned_nca_grow(params, x, goal, jax.random.PRNGKey(3), cfg, 6)
    with pltpu.force_tpu_interpret_mode():
        got = fused_cnca_rollout(params, x, genc, 7, cfg, 6, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_cnca_no_living_channel():
    """use_living_channel=False: no alive gating, goal added unmasked."""
    cfg = ConditionedNCAConfig(cell_fire_rate=1.0, image_size=32,
                               use_living_channel=False)
    params = conditioned_nca_init(jax.random.PRNGKey(0), cfg)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32,
                                                        cfg.num_channels))
    goal = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    genc = encode_goal(params, cfg, goal)
    ref = conditioned_nca_grow(params, x, goal, jax.random.PRNGKey(3), cfg, 4)
    with pltpu.force_tpu_interpret_mode():
        got = fused_cnca_rollout(params, x, genc, 5, cfg, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_cnca_supported_gate():
    cfg = ConditionedNCAConfig()
    assert fused_cnca_supported(cfg, 64, 64)
    assert not fused_cnca_supported(cfg, 128, 128)  # past the 8k-px cap


# ---------------------- custom-VJP train pair ----------------------

def test_fused_cnca_train_matches_xla_grads():
    """fused_cnca_train fwd + ALL gradients (params incl. the encoder via
    the goal-encoding cotangent, x) vs the XLA scan at cell_fire_rate=1."""
    from vsnca_tpu.models.conditioned_nca import conditioned_nca_step
    from vsnca_tpu.ops.pallas_cnca import (
        fused_cnca_train,
        fused_cnca_train_supported,
    )

    cfg = ConditionedNCAConfig(image_size=16, cell_fire_rate=1.0)
    assert fused_cnca_train_supported(cfg, 16, 16)
    params = conditioned_nca_init(jax.random.PRNGKey(0), cfg)
    b, n = 2, 5  # odd n: exercises the buffer-parity final copy
    x = conditioned_nca_seed(cfg, b, 16) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (b, 16, 16, cfg.num_channels)
    )
    goal_img = jax.random.uniform(jax.random.PRNGKey(2), (b, 16, 16, 3))

    def loss_xla(p, xx):
        genc = encode_goal(p, cfg, goal_img)

        def body(carry, k):
            return conditioned_nca_step(p, carry, genc, k, cfg), None

        y, _ = jax.lax.scan(
            body, xx, jax.random.split(jax.random.PRNGKey(3), n)
        )
        return jnp.sum(y**2), y

    def loss_fused(p, xx):
        genc = encode_goal(p, cfg, goal_img)
        y = fused_cnca_train(p, xx, genc, jnp.float32(7.0), cfg, n)
        return jnp.sum(y**2), y

    (lx, yx), gx = jax.value_and_grad(loss_xla, argnums=(0, 1),
                                      has_aux=True)(params, x)
    with pltpu.force_tpu_interpret_mode():
        (lf, yf), gf = jax.value_and_grad(loss_fused, argnums=(0, 1),
                                          has_aux=True)(params, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yx),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-6)
    for a, bb in zip(jax.tree_util.tree_leaves(gx),
                     jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_encoder_trainer_fused_rollout_matches_xla():
    """ConditionedNCATrainer(rollout_path='fused') tracks the XLA trainer
    exactly at cell_fire_rate=1 (same keys; only the rollout lowering
    differs)."""
    from vsnca_tpu.data.dataset import ConditioningDataset
    from vsnca_tpu.models.vgg import vgg16_random_init
    from vsnca_tpu.train.encoder_trainer import ConditionedNCATrainer

    cfg = ConditionedNCAConfig(
        image_size=32, num_hidden_channels=4, update_hidden_dim=16,
        cell_fire_rate=1.0,
    )
    imgs = np.random.RandomState(0).rand(5, 32, 32, 3).astype(np.float32)
    style = jnp.asarray(
        np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    )
    vgg = vgg16_random_init(jax.random.PRNGKey(0))

    def make(rp):
        return ConditionedNCATrainer(
            cfg, ConditioningDataset(imgs), style, vgg,
            nca_steps=(4, 8), step_buckets=(4,), pool_size=16,
            appearance_loss_type="Gram", rollout_path=rp,
        )

    t_xla = make("xla")
    t_fused = make("fused")
    with pltpu.force_tpu_interpret_mode():
        for _ in range(2):
            lx, _ = t_xla.train_iteration(batch_size=4, num_steps=4)
            lf, _ = t_fused.train_iteration(batch_size=4, num_steps=4)
            np.testing.assert_allclose(lf, lx, rtol=1e-5)
    for a, bb in zip(jax.tree_util.tree_leaves(t_xla.params),
                     jax.tree_util.tree_leaves(t_fused.params)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
