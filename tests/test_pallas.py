"""Fused Pallas rollout kernel vs the pure-JAX scan rollout.

Runs under the TPU interpreter on CPU (pltpu.force_tpu_interpret_mode), with
update_rate=1.0 so the stochastic mask is deterministic and results must
match exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.models.dynca import dynca_init, dynca_rollout, make_conditioning
from vsnca_tpu.ops.pallas_step import (
    fused_rollout_chw,
    fused_rollout_supported,
    _pick_tile_h,
    _uniform_threshold,
)


def _run_pallas(params, x_nhwc, cfg, n_steps, cond_nhwc=None):
    xc = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    cond = (
        jnp.transpose(cond_nhwc, (0, 3, 1, 2)) if cond_nhwc is not None else None
    )
    with pltpu.force_tpu_interpret_mode():
        out = fused_rollout_chw(params, xc, jnp.int32(0), cfg, n_steps, cond)
    return jnp.transpose(out, (0, 2, 3, 1))


@pytest.mark.parametrize("pad_mode", ["circular", "replicate", "zeros"])
def test_fused_rollout_matches_scan(pad_mode):
    cfg = NCAConfig(c_in=12, fc_dim=32, padding_mode=pad_mode, update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 128, 12)) - 0.5
    ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 3, remat="none")
    got = _run_pallas(params, x, cfg, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_rollout_with_pos_emb_conditioning():
    cfg = NCAConfig(
        c_in=8, fc_dim=16, padding_mode="circular", conditioning="pos_emb",
        update_rate=1.0,
    )
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 128, 8)) - 0.5
    cond = make_conditioning(cfg, (16, 128), batch=1)
    ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 2, cond=cond,
                           remat="none")
    got = _run_pallas(params, x, cfg, 2, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_rollout_batch_dim():
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 128, 8)) - 0.5
    ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 2, remat="none")
    got = _run_pallas(params, x, cfg, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_uniform_threshold_edges():
    assert _uniform_threshold(1.0) == 0  # always update
    assert _uniform_threshold(0.0) == 1 << 24  # never update
    assert _uniform_threshold(0.5) == 1 << 23


def test_supported_predicate():
    cfg = NCAConfig(c_in=12, fc_dim=96)
    assert fused_rollout_supported(cfg, 256, 256)
    assert not fused_rollout_supported(cfg, 1024, 1024)  # VMEM
    cfg_ms = NCAConfig(c_in=12, fc_dim=96, perception_scales=(0, 1))
    assert not fused_rollout_supported(cfg_ms, 128, 128)


def test_tile_pick_divides():
    for h, w in [(128, 128), (256, 256), (96, 96), (64, 192)]:
        th = _pick_tile_h(h, w)
        assert h % th == 0


def test_fused_rollout_bf16_state_dtype():
    """state_dtype=bfloat16 path stays numerically sane (slow on hardware,
    kept for completeness; see pallas_step docstring)."""
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 128, 8)) - 0.5
    ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 3, remat="none")
    xc = jnp.transpose(x, (0, 3, 1, 2))
    with pltpu.force_tpu_interpret_mode():
        out = fused_rollout_chw(
            params, xc, jnp.int32(0), cfg, 3,
            compute_dtype="bfloat16", state_dtype="bfloat16",
        )
    got = jnp.transpose(out.astype(jnp.float32), (0, 2, 3, 1))
    # bf16 state: coarse tolerance, but trajectories must track
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0.1, atol=0.05)


@pytest.mark.parametrize("pad_mode", ["circular", "replicate", "zeros"])
def test_fused_rollout_multiscale_matches_scan(pad_mode):
    """The multiscale (0,1) kernel variant is exact vs perceive_multiscale
    (kept non-default: measured break-even with XLA on v5e)."""
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode=pad_mode,
                    perception_scales=(0, 1), update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 128, 8)) - 0.5
    ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 3, remat="none")
    got = _run_pallas(params, x, cfg, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)
    # and auto-selection keeps multiscale off the fused path
    assert not fused_rollout_supported(cfg, 128, 128)


def test_fused_rollout_multi_tile_paths():
    """h=64, w=128 → multiple row tiles: exercises interior band slices and
    cross-tile halos for both the single-scale and multiscale kernels (the
    16x128 tests above run with a single tile)."""
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 8)) - 0.5
    for scales in [(0,), (0, 1)]:
        cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                        perception_scales=scales, update_rate=1.0)
        params = dynca_init(jax.random.PRNGKey(0), cfg)
        ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 3,
                               remat="none")
        got = _run_pallas(params, x, cfg, 3)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg=str(scales),
        )


def test_fused_rollout_rejects_bad_algo():
    cfg = NCAConfig(c_in=8, fc_dim=16)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 8, 16, 128))
    with pytest.raises(AssertionError):
        fused_rollout_chw(params, x, jnp.int32(0), cfg, 1, algo="rolls")


def test_fused_rollout_stream_matches_scan():
    """HBM-streaming row-band kernel (for grids past the VMEM cap) vs the
    scan rollout, tiny shape (the DMA interpreter is slow — hardware runs
    validate the 512px target; see docs/ROUND2.md)."""
    cfg = NCAConfig(c_in=4, fc_dim=8, padding_mode="circular", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 128, 4)) - 0.5
    from vsnca_tpu.ops.pallas_step import (
        fused_rollout_stream_chw,
        fused_stream_supported,
    )

    assert fused_stream_supported(cfg, 16, 128)
    assert fused_stream_supported(
        NCAConfig(c_in=12, fc_dim=96, padding_mode="circular"), 512, 512
    )
    assert not fused_stream_supported(
        NCAConfig(c_in=12, fc_dim=96, padding_mode="replicate"), 512, 512
    )
    with pltpu.force_tpu_interpret_mode():
        ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 2,
                               remat="none")
        got = fused_rollout_stream_chw(
            params, jnp.transpose(x, (0, 3, 1, 2)), jnp.int32(0), cfg, 2,
            interpret=True,
        )
        got = jnp.transpose(got, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_fused_rollout_mat_stencil_matches_scan():
    """algo='mat': stencils folded into the first matmul
    (stencil_folded_w1) — exact vs the scan rollout."""
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular",
                    conditioning="pos_emb", update_rate=1.0)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 128, 8)) - 0.5
    cond = make_conditioning(cfg, (16, 128), batch=1)
    with pltpu.force_tpu_interpret_mode():
        ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(2), cfg, 3,
                               cond=cond, remat="none")
        got = fused_rollout_chw(
            params, jnp.transpose(x, (0, 3, 1, 2)), jnp.int32(0), cfg, 3,
            cond=jnp.transpose(cond, (0, 3, 1, 2)), interpret=True,
            algo="mat",
        )
        got = jnp.transpose(got, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_stencil_folded_w1_identity():
    """Folded weights reproduce W1^T percept for random inputs (numpy)."""
    from vsnca_tpu.ops.pallas_step import stencil_folded_w1
    from vsnca_tpu.ops.filters import LAPLACIAN, SOBEL_X, SOBEL_Y

    rng = np.random.RandomState(0)
    c, f, cc = 5, 7, 2
    w1 = rng.randn(4 * c + cc, f).astype(np.float32)
    taps = rng.randn(9, c).astype(np.float32)  # one pixel's 3x3 neighborhood
    cond = rng.randn(cc).astype(np.float32)

    sx = sum(float(SOBEL_X[i][j]) * taps[i * 3 + j] for i in range(3) for j in range(3))
    sy = sum(float(SOBEL_Y[i][j]) * taps[i * 3 + j] for i in range(3) for j in range(3))
    lp = sum(float(LAPLACIAN[i][j]) * taps[i * 3 + j] for i in range(3) for j in range(3))
    percept = np.concatenate([taps[4], sx, sy, lp, cond])
    ref = w1.T @ percept

    w_eff = np.asarray(stencil_folded_w1(w1, c))
    stacked = np.concatenate([taps.reshape(-1), cond])
    np.testing.assert_allclose(w_eff.T @ stacked, ref, rtol=1e-5, atol=1e-5)


def test_mat_stencil_rejects_bf16_state():
    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 16, 128)) - 0.5
    with pytest.raises(AssertionError, match="float32 state"):
        with pltpu.force_tpu_interpret_mode():
            fused_rollout_chw(params, x, jnp.int32(0), cfg, 2,
                              interpret=True, algo="mat",
                              state_dtype="bfloat16")


@pytest.mark.parametrize(
    "pad_mode,conditioning,h,w",
    [
        ("circular", None, 8, 128),
        ("circular", "pos_emb", 6, 128),
        ("circular", "edges", 8, 128),
        ("replicate", None, 8, 128),
        ("zeros", None, 8, 128),
        ("circular", None, 2, 128),   # single-tile band wraps both sides
    ],
)
def test_fused_rollout_flat_matches_scan(pad_mode, conditioning, h, w):
    """Flat-layout kernel (state [ceil8(C), H*W], all pixels on lanes) vs
    the scan rollout — exact with deterministic masks across padding modes,
    conditioning variants, and the one-tile edge case."""
    from vsnca_tpu.ops.pallas_step import (
        fused_flat_supported,
        fused_rollout_flat_chw,
    )

    cfg = NCAConfig(c_in=12, fc_dim=16, padding_mode=pad_mode,
                    update_rate=1.0, conditioning=conditioning)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, cfg.c_in)) - 0.5
    cond = make_conditioning(
        cfg, (h, w),
        cond_img=jax.random.uniform(jax.random.PRNGKey(2), (1, h, w, 1))
        if conditioning == "edges" else None,
        batch=1,
    )
    assert fused_flat_supported(cfg, h, w)
    ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(3), cfg, 3,
                           cond=cond, remat="none")
    with pltpu.force_tpu_interpret_mode():
        got = fused_rollout_flat_chw(
            params,
            jnp.transpose(x, (0, 3, 1, 2)),
            jnp.int32(0), cfg, 3,
            cond=jnp.transpose(cond, (0, 3, 1, 2)) if cond is not None else None,
            interpret=True,
        )
    got = jnp.transpose(got, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_fused_flat_supported_gates():
    from vsnca_tpu.ops.pallas_step import fused_flat_supported

    c = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular")
    assert fused_flat_supported(c, 256, 256)
    assert not fused_flat_supported(c, 256, 100)  # W % 128
    assert not fused_flat_supported(c, 512, 512)  # VMEM
    assert not fused_flat_supported(
        NCAConfig(c_in=12, fc_dim=96, perception_scales=(0, 1)), 128, 128
    )


@pytest.mark.parametrize("conditioning", [None, "pos_emb"])
def test_fused_rollout_stream_flat_matches_scan(conditioning):
    """Flat-layout HBM-streaming kernel (512px-class path) vs the scan
    rollout — exact with deterministic masks; bands + double-buffered DMA +
    wrap-row handling exercised at 2 bands."""
    from vsnca_tpu.ops.pallas_step import (
        fused_rollout_stream_flat_chw,
        fused_stream_flat_supported,
    )

    cfg = NCAConfig(c_in=12, fc_dim=16, padding_mode="circular",
                    update_rate=1.0, conditioning=conditioning)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    h, w = 8, 128
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, cfg.c_in)) - 0.5
    cond = make_conditioning(cfg, (h, w), batch=1)
    assert fused_stream_flat_supported(
        NCAConfig(c_in=12, fc_dim=96, padding_mode="circular"), 512, 512
    )
    assert not fused_stream_flat_supported(
        NCAConfig(c_in=12, fc_dim=96, padding_mode="replicate"), 512, 512
    )
    ref, _ = dynca_rollout(params, x, jax.random.PRNGKey(3), cfg, 3,
                           cond=cond, remat="none")
    with pltpu.force_tpu_interpret_mode():
        got = fused_rollout_stream_flat_chw(
            params, jnp.transpose(x, (0, 3, 1, 2)), jnp.int32(0), cfg, 3,
            cond=jnp.transpose(cond, (0, 3, 1, 2)) if cond is not None else None,
            interpret=True,
        )
    got = jnp.transpose(got, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_select_rollout_kernel_policy():
    """The measured auto-selection table (docs/ROUND2.md): flat when
    VMEM-resident fits, roll only for multiscale-capable... (multiscale
    stays on XLA), stream_flat for large circular grids, None otherwise."""
    from vsnca_tpu.ops.pallas_step import select_rollout_kernel

    circ = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular")
    assert select_rollout_kernel(circ, 256, 256) == "flat"
    assert select_rollout_kernel(circ, 128, 128) == "flat"
    assert select_rollout_kernel(circ, 512, 512) == "stream_flat"
    assert select_rollout_kernel(circ, 1024, 1024) == "stream_flat"
    # W not lane-aligned -> XLA
    assert select_rollout_kernel(circ, 256, 100) is None
    # multiscale -> XLA (measured break-even for the CHW ms kernel)
    ms = NCAConfig(c_in=16, fc_dim=128, padding_mode="circular",
                   perception_scales=(0, 1))
    assert select_rollout_kernel(ms, 256, 256) is None
    # replicate padding: flat VMEM-resident handles it; no streaming tier
    rep = NCAConfig(c_in=12, fc_dim=96, padding_mode="replicate")
    assert select_rollout_kernel(rep, 256, 256) == "flat"
    assert select_rollout_kernel(rep, 512, 512) is None


def test_kernel_gates_account_for_conditioning_vmem():
    """The VMEM-resident kernel carries a whole-grid cond block — its gate
    must reject sizes where it blows the budget (a 1024² edges stylizer
    OOMed the scoped-vmem allocator before this accounting). The STREAMING
    kernel now streams cond band-by-band from HBM, so 1024²+ conditioned
    grids are in scope (previously the cond block forced XLA fallback)."""
    from vsnca_tpu.ops.pallas_step import (
        fused_flat_supported,
        fused_stream_flat_supported,
        select_rollout_kernel,
    )

    edges = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular",
                      conditioning="edges")
    assert fused_flat_supported(edges, 256, 256)          # 497 fps measured
    assert not fused_flat_supported(edges, 1024, 1024)    # cond 33.5 MB
    assert fused_stream_flat_supported(edges, 512, 512)   # 188 fps measured
    assert fused_stream_flat_supported(edges, 1024, 1024)  # cond streams now
    assert select_rollout_kernel(edges, 1024, 1024) == "stream_flat"
