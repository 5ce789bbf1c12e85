"""Bilinear grid sampling and the MSOE TF-consistent upsample.

``grid_sample_bilinear`` reproduces torch ``F.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=False)`` for NHWC inputs; it exists to
support the MSOE pyramid's TF-consistent bilinear upsample
(ExtraChannels/models/MSOEmultiscale.py:26-44), whose nonstandard grid
construction silently changes flow values if approximated with an ordinary
resize.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def grid_sample_bilinear(imgs: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample NHWC images at normalized grid locations.

    imgs: [B, H, W, C]; grid: [B, Ho, Wo, 2] with grid[..., 0] = x (width)
    and grid[..., 1] = y (height) in [-1, 1]. align_corners=False mapping;
    out-of-range taps contribute zero.
    """
    b, h, w, c = imgs.shape
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(yi, xi, wy, wx):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        # Gather per batch: flatten spatial dims and index.
        flat = imgs.reshape(b, h * w, c)
        lin = yi_c * w + xi_c  # [B, Ho, Wo]
        vals = jnp.take_along_axis(
            flat, lin.reshape(b, -1, 1).astype(jnp.int32), axis=1
        ).reshape(lin.shape + (c,))
        wgt = (wy * wx * valid.astype(imgs.dtype))[..., None]
        return vals * wgt

    out = (
        tap(y0, x0, wy0, wx0)
        + tap(y0, x1, wy0, wx1)
        + tap(y1, x0, wy1, wx0)
        + tap(y1, x1, wy1, wx1)
    )
    return out


def resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] bilinear resize matrix in align_corners=False
    convention with EDGE CLAMPING — exactly `jax.image.resize(...,
    method='linear', antialias=False)` / torch F.interpolate semantics along
    one axis. For n_out = n_in/2 this is exact 2x2-pair averaging; used by
    the fused multiscale kernel to express down/upsampling as MXU matmuls.
    """
    g = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(g).astype(np.int64)
    frac = g - lo
    mat = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        for tap, wgt in ((lo[i], 1.0 - frac[i]), (lo[i] + 1, frac[i])):
            mat[i, min(max(tap, 0), n_in - 1)] += wgt
    return mat


def _interp_matrix(xs: np.ndarray, size: int) -> np.ndarray:
    """Row-stochastic [N, size] bilinear interpolation matrix for normalized
    coordinates ``xs`` in align_corners=False convention with zero padding
    out of range (each row has <= 2 nonzeros)."""
    n = len(xs)
    g = (xs + 1.0) * size / 2.0 - 0.5
    lo = np.floor(g).astype(np.int64)
    frac = g - lo
    mat = np.zeros((n, size), np.float32)
    for i in range(n):
        for tap, wgt in ((lo[i], 1.0 - frac[i]), (lo[i] + 1, frac[i])):
            if 0 <= tap < size:
                mat[i, tap] += wgt
    return mat


def tf_consistent_bilinear_upsample(imgs: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """TF-style bilinear upsample used between MSOE pyramid levels.

    imgs: [B, H, W, C] with H == W. Same sampling grid as the reference
    (MSOEmultiscale.py:26-44): an (N - p)-point linspace in
    [-1 + 1/H, 1 - 1/H] replicate-padded by p = int(scale) - 1 at the high
    end, applied separably to both axes.

    Because the grid is static and separable, the resample is evaluated as
    two small dense matmuls (out = A @ img @ A^T per channel) instead of a
    gather — MXU-friendly and drastically cheaper to compile.
    """
    b, h, w, c = imgs.shape
    assert h == w, "TF-consistent upsample requires square inputs"
    n = int(h * scale_factor)
    delta = 1.0 / h
    p = int(scale_factor) - 1

    xs = np.linspace(-1.0 + delta, 1.0 - delta, n - p, dtype=np.float64)
    if p > 0:
        xs = np.concatenate([xs, np.full(p, xs[-1])])

    a = jnp.asarray(_interp_matrix(xs, h))  # rows (y) and cols (x) share xs
    # out[b, i, j, c] = sum_{u,v} A[i,u] A[j,v] img[b,u,v,c]
    return jnp.einsum(
        "iu,buvc,jv->bijc", a, imgs, a, preferred_element_type=imgs.dtype
    )
