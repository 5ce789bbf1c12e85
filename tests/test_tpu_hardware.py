"""Hardware-only validation tests — the pytest form of the checks the
validation scripts run on the real chip (scripts/bench_flat_kernel.py,
scripts/bench_flat_train.py, scripts/validate_fused_tpu.py).

Skipped in the normal (CPU-forced) suite; run on hardware with:

    VSNCA_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

Covers the properties interpret mode CANNOT check (CLAUDE.md: interpret
prng_random_bits returns zeros on CPU): the on-core PRNG's mask fraction,
deterministic replay of the stochastic custom-VJP, and a finite-difference
probe through real stochastic masks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware-only (set VSNCA_TPU_TESTS=1 and run on a TPU)",
)

from vsnca_tpu.config import NCAConfig  # noqa: E402
from vsnca_tpu.models.dynca import (  # noqa: E402
    dynca_init,
    dynca_rollout,
    dynca_seed,
    make_conditioning,
)


def test_flat_kernel_hardware_parity_and_mask_fraction():
    from vsnca_tpu.ops.pallas_step import fused_rollout_flat_chw

    cfg1 = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular",
                     update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg1)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, cfg1.c_in, 128, 128)
    ) - 0.5
    xh = jnp.transpose(x, (0, 2, 3, 1))
    # Like-for-like: the kernels pin DEFAULT matmul precision internally
    # (see pallas_step), while conftest sets 'highest' globally — run the
    # XLA reference at default too.
    with jax.default_matmul_precision("default"):
        ref, _ = dynca_rollout(params, xh, jax.random.PRNGKey(3), cfg1, 1,
                               remat="none")
    out = jnp.transpose(
        fused_rollout_flat_chw(params, x, jnp.int32(0), cfg1, 1), (0, 2, 3, 1)
    )
    d = np.abs(np.asarray(out - ref))
    # padded-K MXU reordering noise: tiny mean, sparse ReLU-edge spikes
    assert d.mean() < 1e-7 and d.max() < 1e-3

    cfg = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular")
    out5 = fused_rollout_flat_chw(params, x, jnp.int32(7), cfg, 1)
    changed = float(jnp.mean(np.any(np.asarray(out5 != x), axis=1)))
    assert 0.45 < changed < 0.55, f"mask fraction {changed} != ~0.5"


def test_flat_vjp_deterministic_replay_and_fd():
    from vsnca_tpu.ops.pallas_train import fused_rollout_train_flat

    cfg = NCAConfig(c_in=12, fc_dim=96, conditioning="pos_emb",
                    padding_mode="circular")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = dynca_seed(cfg, 2, 128)
    cond = make_conditioning(cfg, (128, 128), batch=2)

    def loss(p, seed):
        _, rgb = fused_rollout_train_flat(p, x, seed, cfg, 8, cond_nhwc=cond,
                                          cond_no_grad=True)
        return jnp.mean(rgb ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    (v1, g1), (v2, g2) = vg(params, 13.0), vg(params, 13.0)
    assert float(v1) == float(v2)
    for k in g1:
        np.testing.assert_array_equal(np.asarray(g1[k]), np.asarray(g2[k]))
    v3, _ = vg(params, 14.0)
    assert float(v1) != float(v3)

    eps = 1e-3
    d = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.PRNGKey(9), a.shape, a.dtype),
        params,
    )
    pp = jax.tree_util.tree_map(lambda a, b: a + eps * b, params, d)
    pm = jax.tree_util.tree_map(lambda a, b: a - eps * b, params, d)
    fd = (float(vg(pp, 13.0)[0]) - float(vg(pm, 13.0)[0])) / (2 * eps)
    an = float(sum(jnp.vdot(g1[k], d[k]) for k in g1))
    assert abs(fd - an) / (abs(fd) + 1e-12) < 0.02, (fd, an)


def test_stylizer_kernel_selection_runs():
    from vsnca_tpu.infer.stylize import VideoStylizer

    cfg = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular",
                    conditioning="edges")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    styl = VideoStylizer(params, cfg, 256, step_n=24)
    assert styl._kernel == "flat"
    frame = jnp.zeros((1, 256, 256, 3))
    out = styl.step_frame(frame)
    assert np.isfinite(np.asarray(out)).all()
