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
