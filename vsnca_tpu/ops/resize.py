"""Resize primitives with torch-parity semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_matrix(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] half-pixel-center bilinear sampling matrix
    (align_corners=False, edge-clamped) — the linear map jax.image.resize
    applies along one axis."""
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(src)
    w_hi = src - lo
    a = np.zeros((n_out, n_in), np.float64)
    i0 = np.clip(lo.astype(np.int64), 0, n_in - 1)
    i1 = np.clip(lo.astype(np.int64) + 1, 0, n_in - 1)
    rows = np.arange(n_out)
    np.add.at(a, (rows, i0), 1.0 - w_hi)
    np.add.at(a, (rows, i1), w_hi)
    return a.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to (H, W) = size.

    Half-pixel-center sampling without antialiasing — identical to torch
    ``F.interpolate(mode='bilinear', align_corners=False)`` used throughout
    the reference (ConditioneDyNCA/models/dynca.py:81,98; loss resizes).

    Lowered as two static separable matmuls (out = A_h @ x @ A_w^T per
    channel) rather than ``jax.image.resize``'s gather formulation: the
    sampling grid is static under jit, matmuls ride the MXU, and — unlike
    the gather — the BACKWARD is just the transposed matmuls (the gather
    adjoint is a scatter, measured 8.6 ms of the video-motion iteration
    for three 256→128 frame resizes — docs/hw_r5/msoe_split.log).
    Value-parity with jax.image.resize is tested (tests/test_ops.py).
    """
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    a_h = jnp.asarray(_bilinear_matrix(size[0], h), x.dtype)
    a_w = jnp.asarray(_bilinear_matrix(size[1], w), x.dtype)
    # Pin HIGHEST matmul precision: under the TPU DEFAULT (one bf16 pass,
    # rel eps ~4e-3) a resize inside an XLA reference path would inject
    # bf16-class rounding that the gather lowering never had (caught by
    # test_ms_fused_pair_hardware_grad_parity drifting 7e-5 -> 1.1e-3).
    # The matrices are 2-nonzeros-per-row tiny, so the 6-pass cost is
    # negligible; the backward keeps the matmul (not scatter) form.
    with jax.default_matmul_precision("highest"):
        return jnp.einsum(
            "iu,buvc,jv->bijc", a_h, x, a_w, preferred_element_type=x.dtype
        )


def resize_nearest_1d(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Nearest-neighbor resize along the last axis of a [..., N] tensor.

    Matches torch ``F.interpolate(mode='nearest')`` index rule
    src = floor(dst * N_in / N_out) (appearance_loss.py:114).
    """
    n_in = x.shape[-1]
    if n_in == n:
        return x
    idx = np.floor(np.arange(n) * (n_in / n)).astype(np.int64)
    idx = np.minimum(idx, n_in - 1)
    return jnp.take(x, jnp.asarray(idx), axis=-1)
