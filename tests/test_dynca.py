"""DyNCA cell tests: torch parity of the deterministic path, seed modes,
rollout/remat equivalence, and gradient flow."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.models.dynca import (
    dynca_init,
    dynca_seed,
    dynca_step,
    dynca_rollout,
    dynca_rollout_with_taps,
    make_conditioning,
    to_rgb,
    param_count,
)
from vsnca_tpu.ops.filters import SOBEL_X, SOBEL_Y, LAPLACIAN


def torch_dynca_step(params, x_nchw, cond_nchw, pad_mode, scales, update_mask):
    """Reference-math DyNCA step in torch, built from our params."""
    c = x_nchw.shape[1]

    def dw(z, k):
        w = torch.from_numpy(k).reshape(1, 1, 3, 3).repeat(c, 1, 1, 1)
        if pad_mode == "zeros":
            zp = F.pad(z, [1, 1, 1, 1], "constant", 0.0)
        else:
            zp = F.pad(z, [1, 1, 1, 1], pad_mode)
        return F.conv2d(zp, w, groups=c)

    def perceive(z):
        return torch.cat([z, dw(z, SOBEL_X), dw(z, SOBEL_Y), dw(z, LAPLACIAN)], 1)

    h0, w0 = x_nchw.shape[2:]
    percs = []
    for s in scales:
        if s == 0:
            percs.append(perceive(x_nchw))
        else:
            zs = F.interpolate(
                x_nchw, size=(h0 // 2**s, w0 // 2**s), mode="bilinear",
                align_corners=False,
            )
            p = perceive(zs)
            percs.append(
                F.interpolate(p, size=(h0, w0), mode="bilinear", align_corners=False)
            )
    y = sum(percs) / len(percs)
    if cond_nchw is not None:
        y = torch.cat([y, cond_nchw], dim=1)

    w1 = torch.from_numpy(np.asarray(params["w1"])).T.reshape(
        params["w1"].shape[1], params["w1"].shape[0], 1, 1
    )
    b1 = torch.from_numpy(np.asarray(params["b1"]))
    w2 = torch.from_numpy(np.asarray(params["w2"])).T.reshape(
        params["w2"].shape[1], params["w2"].shape[0], 1, 1
    )
    b2 = torch.from_numpy(np.asarray(params["b2"]))
    out = F.conv2d(F.relu(F.conv2d(y, w1, b1)), w2, b2)
    return x_nchw + out * update_mask


@pytest.mark.parametrize(
    "pad_mode,scales,conditioning",
    [
        ("replicate", (0,), None),
        ("circular", (0, 1), None),
        ("replicate", (0,), "pos_emb"),
        ("circular", (0,), "edges"),
    ],
)
def test_step_matches_torch(pad_mode, scales, conditioning):
    cfg = NCAConfig(
        c_in=8,
        fc_dim=16,
        padding_mode=pad_mode,
        perception_scales=scales,
        conditioning=conditioning,
        update_rate=1.0,  # deterministic mask
    )
    key = jax.random.PRNGKey(0)
    params = dynca_init(key, cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, cfg.c_in).astype(np.float32) * 0.1

    cond_img = None
    if conditioning == "edges":
        cond_img = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    cond = make_conditioning(cfg, (16, 16), cond_img=cond_img, batch=2)

    ours = dynca_step(params, jnp.asarray(x), jax.random.PRNGKey(1), cfg, cond)

    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    cond_t = None
    if cond is not None:
        cond_t = torch.from_numpy(np.asarray(cond)).permute(0, 3, 1, 2)
    theirs = torch_dynca_step(params, x_t, cond_t, pad_mode, scales, 1.0)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-5
    )


def test_seed_modes():
    cfg = NCAConfig(c_in=12)
    z = dynca_seed(cfg, 3, 16)
    assert z.shape == (3, 16, 16, 12) and float(jnp.abs(z).sum()) == 0.0

    cfg_c = NCAConfig(c_in=12, seed_mode="center_on")
    zc = dynca_seed(cfg_c, 2, (8, 10))
    assert zc.shape == (2, 8, 10, 12)
    assert float(zc[:, 4, 5].sum()) == 24.0
    assert float(zc.sum()) == 24.0

    cfg_r = NCAConfig(c_in=12, seed_mode="random")
    zr = dynca_seed(cfg_r, 4, 8, key=jax.random.PRNGKey(0))
    # all batch entries identical; values in (-0.5, 0.5)
    np.testing.assert_allclose(np.asarray(zr[0]), np.asarray(zr[3]))
    assert float(jnp.abs(zr).max()) <= 0.5

    # ExtraChannels-style: seed one channel short of c_in
    cfg_x = NCAConfig(c_in=13, seed_channels=12)
    zx = dynca_seed(cfg_x, 2, 8)
    assert zx.shape[-1] == 12


def test_update_mask_rate():
    cfg = NCAConfig(c_in=4, fc_dim=8, update_rate=0.5)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    # With rate 0, state must be unchanged.
    x = jnp.asarray(np.random.RandomState(0).randn(1, 12, 12, 4).astype(np.float32))
    out = dynca_step(params, x, jax.random.PRNGKey(1), cfg, update_rate=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    # At rate 0.5, roughly half the cells change.
    out = dynca_step(params, x, jax.random.PRNGKey(2), cfg, update_rate=0.5)
    changed = np.any(np.asarray(out) != np.asarray(x), axis=-1).mean()
    assert 0.3 < changed < 0.7


def test_rollout_remat_equivalence():
    cfg = NCAConfig(c_in=6, fc_dim=12)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = dynca_seed(cfg, 2, 16)
    key = jax.random.PRNGKey(7)
    s1, rgb1 = dynca_rollout(params, x, key, cfg, 10, remat="per_step")
    s2, rgb2 = dynca_rollout(params, x, key, cfg, 10, remat="none")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(to_rgb(s1)), rtol=1e-6)
    # segment remat: identical PRNG stream (same split order), same values
    # AND same gradients as per-step remat.
    s3, _ = dynca_rollout(params, x, key, cfg, 10, remat="segment:5")
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s3))

    def obj(p, remat):
        s, frames = dynca_rollout_with_taps(p, x, key, cfg, 2, 4, remat=remat)
        return jnp.sum(s**2) + jnp.sum(frames**2)

    g1 = jax.grad(lambda p: obj(p, "per_step"))(params)
    g2 = jax.grad(lambda p: obj(p, "segment:2"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_rollout_with_taps_matches_plain_rollout():
    cfg = NCAConfig(c_in=6, fc_dim=12)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = dynca_seed(cfg, 1, 12)
    key = jax.random.PRNGKey(3)
    s_taps, frames = dynca_rollout_with_taps(params, x, key, cfg, 3, 5)
    s_plain, _ = dynca_rollout(params, x, key, cfg, 15)
    assert frames.shape == (3, 1, 12, 12, 3)
    np.testing.assert_allclose(np.asarray(s_taps), np.asarray(s_plain), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(frames[-1]), np.asarray(to_rgb(s_plain)), rtol=1e-5, atol=1e-6
    )


def test_gradients_flow_through_rollout():
    cfg = NCAConfig(c_in=6, fc_dim=12)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = dynca_seed(cfg, 1, 8)

    def loss_fn(p):
        s, rgb = dynca_rollout(p, x, jax.random.PRNGKey(1), cfg, 12)
        return jnp.mean(rgb**2)

    grads = jax.grad(loss_fn)(params)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0.0


def test_param_count_matches_reference_formula():
    # Reference DyNCA with c_in=12, fc_dim=96, edges conditioning:
    # w1: (48+3)*96 + 96, w2: 96*12 + 12
    cfg = NCAConfig(c_in=12, fc_dim=96, conditioning="edges")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    assert param_count(params) == (48 + 3) * 96 + 96 + 96 * 12 + 12
