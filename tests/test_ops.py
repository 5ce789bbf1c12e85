"""Golden tests: vsnca_tpu ops vs torch implementations of the same math.

The torch side is built inline from public torch.nn.functional ops (not
copied from the reference) to validate cross-correlation orientation,
padding semantics, and resize rules.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vsnca_tpu.ops.filters import SOBEL_X, SOBEL_Y, LAPLACIAN
from vsnca_tpu.ops.perception import depthwise_3x3, perceive, edge_extract
from vsnca_tpu.ops.padding import symmetric_pad_2d
from vsnca_tpu.ops.resize import resize_bilinear, resize_nearest_1d
from vsnca_tpu.ops.cpe import cartesian_positional_encoding
from vsnca_tpu.ops.grid_sample import grid_sample_bilinear
from vsnca_tpu.ops.conv import conv2d, max_pool_2d


def nhwc_to_nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


def nchw_to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def torch_depthwise(x_nchw, kernel, pad_mode):
    c = x_nchw.shape[1]
    w = torch.from_numpy(kernel).reshape(1, 1, 3, 3).repeat(c, 1, 1, 1)
    if pad_mode == "zeros":
        z = F.pad(x_nchw, [1, 1, 1, 1], "constant", 0.0)
    else:
        z = F.pad(x_nchw, [1, 1, 1, 1], pad_mode)
    return F.conv2d(z, w, groups=c)


@pytest.mark.parametrize("pad_mode", ["replicate", "circular", "zeros"])
@pytest.mark.parametrize("kernel", [SOBEL_X, SOBEL_Y, LAPLACIAN])
def test_depthwise_3x3_matches_torch(pad_mode, kernel):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 5).astype(np.float32)
    ours = depthwise_3x3(jnp.asarray(x), kernel, pad_mode)
    theirs = torch_depthwise(nhwc_to_nchw(x), kernel, pad_mode)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5
    )


def test_perceive_channel_order():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    y = perceive(jnp.asarray(x), "replicate")
    assert y.shape == (1, 8, 8, 12)
    # Block order: [raw | sobel_x | sobel_y | laplacian]
    np.testing.assert_allclose(np.asarray(y[..., :3]), x, rtol=1e-6)
    sx = depthwise_3x3(jnp.asarray(x), SOBEL_X, "replicate")
    np.testing.assert_allclose(np.asarray(y[..., 3:6]), np.asarray(sx), rtol=1e-6)


def test_edge_extract_matches_torch():
    rng = np.random.RandomState(2)
    g = rng.randn(2, 10, 10, 1).astype(np.float32)
    ours = edge_extract(jnp.asarray(g), "tanh")
    gt = nhwc_to_nchw(g)
    sx = F.conv2d(gt, torch.from_numpy(SOBEL_X).reshape(1, 1, 3, 3), padding=1)
    sy = F.conv2d(gt, torch.from_numpy(SOBEL_Y).reshape(1, 1, 3, 3), padding=1)
    lp = F.conv2d(gt, torch.from_numpy(LAPLACIAN).reshape(1, 1, 3, 3), padding=1)
    theirs = torch.tanh(torch.cat([sx, sy, lp], dim=1))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("out_size", [(4, 4), (16, 16), (7, 5)])
def test_resize_bilinear_matches_torch(out_size):
    rng = np.random.RandomState(3)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), out_size)
    theirs = F.interpolate(
        nhwc_to_nchw(x), size=out_size, mode="bilinear", align_corners=False
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_resize_nearest_1d_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 5, 17).astype(np.float32)
    for n in [17, 33, 9, 50]:
        ours = resize_nearest_1d(jnp.asarray(x), n)
        theirs = F.interpolate(torch.from_numpy(x), size=n, mode="nearest")
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-6)


def test_cpe_matches_reference_formula():
    h, w = 6, 9
    cpe = np.asarray(cartesian_positional_encoding(h, w))
    xs = 2.0 * (np.arange(h) / h - 0.5 + 0.5 / h)
    ys = 2.0 * (np.arange(w) / w - 0.5 + 0.5 / w)
    np.testing.assert_allclose(
        cpe[:, :, 0], np.broadcast_to(xs[:, None], (h, w)), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        cpe[:, :, 1], np.broadcast_to(ys[None, :], (h, w)), rtol=1e-6, atol=1e-7
    )
    assert abs(float(cpe.mean())) < 1e-6  # symmetric grid


def test_symmetric_pad_matches_half_sample_reflection():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 4, 4, 1).astype(np.float32)
    out = np.asarray(symmetric_pad_2d(jnp.asarray(x), (2, 2, 2, 2)))[0, :, :, 0]
    # np.pad 'symmetric' is half-sample reflection (edge duplicated).
    expected = np.pad(x[0, :, :, 0], 2, mode="symmetric")
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 7, 7, 3).astype(np.float32)
    grid = (rng.rand(2, 5, 6, 2).astype(np.float32) * 2.4) - 1.2  # incl. OOB
    ours = grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid))
    theirs = F.grid_sample(
        nhwc_to_nchw(x),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_conv2d_matches_torch():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 9, 9, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    ours = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=1)
    theirs = F.conv2d(
        nhwc_to_nchw(x),
        torch.from_numpy(w).permute(3, 2, 0, 1),
        torch.from_numpy(b),
        padding=1,
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_max_pool_matches_torch():
    rng = np.random.RandomState(8)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    ours = max_pool_2d(jnp.asarray(x), 3, 1, 1)
    theirs = F.max_pool2d(nhwc_to_nchw(x), 3, stride=1, padding=1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-6
    )
    ours5 = max_pool_2d(jnp.asarray(x), 5, 1, 2)
    theirs5 = F.max_pool2d(nhwc_to_nchw(x), 5, stride=1, padding=2)
    np.testing.assert_allclose(
        np.asarray(ours5), theirs5.numpy().transpose(0, 2, 3, 1), rtol=1e-6
    )


def test_max_pool_eq_vjp_matches_reduce_window_grad():
    """The equality-mask custom VJP (production stride-1 path) must match
    XLA's select_and_scatter gradient exactly on tie-free inputs, for every
    (window, padding) shape the codebase uses and a few generic ones."""
    import jax

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 11, 13, 4).astype(np.float32))

    def rw(x, w, p):
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            (1, w, w, 1),
            (1, 1, 1, 1),
            ((0, 0), (p, p), (p, p), (0, 0)),
        )

    for w, p in [(5, 2), (3, 1), (2, 0), (4, 1), (5, 0)]:
        y_eq = max_pool_2d(x, w, 1, p)
        y_rw = rw(x, w, p)
        assert np.array_equal(np.asarray(y_eq), np.asarray(y_rw)), (w, p)
        g_eq = jax.grad(lambda v: jnp.sum(jnp.sin(3 * max_pool_2d(v, w, 1, p))))(x)
        g_rw = jax.grad(lambda v: jnp.sum(jnp.sin(3 * rw(v, w, p))))(x)
        np.testing.assert_allclose(
            np.asarray(g_eq), np.asarray(g_rw), rtol=2e-6, atol=2e-6
        )


def test_max_pool_nonoverlap_eq_vjp_matches_reduce_window_grad():
    """window == stride pools (VGG's 2x2/2) take the repeat+equality VJP;
    values and gradients must match select_and_scatter EXACTLY on tie-free
    inputs (each input belongs to one window, so there is no
    accumulation-order ambiguity). Includes non-divisible tails (VALID)."""
    import jax

    def rw(x, w):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, w, w, 1), (1, w, w, 1), "VALID"
        )

    rng = np.random.RandomState(13)
    for shape, w in [((2, 16, 16, 4), 2), ((2, 17, 19, 4), 2),
                     ((1, 9, 12, 3), 3)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        assert np.array_equal(
            np.asarray(max_pool_2d(x, w, w, 0)), np.asarray(rw(x, w))
        )
        g_eq = jax.grad(lambda v: jnp.sum(jnp.sin(3 * max_pool_2d(v, w, w, 0))))(x)
        g_rw = jax.grad(lambda v: jnp.sum(jnp.sin(3 * rw(v, w))))(x)
        assert np.array_equal(np.asarray(g_eq), np.asarray(g_rw)), (shape, w)


def test_max_pool_eq_vjp_splits_ties_conserving_mass():
    """On tied inputs the eq-VJP splits each window's cotangent evenly across
    its argmaxes (a valid symmetric subgradient); total gradient mass equals
    the number of output cells (for an identity-sum loss)."""
    import jax

    xc = jnp.ones((1, 8, 8, 1), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(max_pool_2d(v, 5, 1, 2)))(xc)
    np.testing.assert_allclose(float(jnp.sum(g)), 64.0, rtol=1e-5)
    assert float(jnp.min(g)) > 0.0  # every tied cell gets a share
