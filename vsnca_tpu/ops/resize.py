"""Resize primitives with torch-parity semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to (H, W) = size.

    Half-pixel-center sampling without antialiasing — identical to torch
    ``F.interpolate(mode='bilinear', align_corners=False)`` used throughout
    the reference (ConditioneDyNCA/models/dynca.py:81,98; loss resizes).
    """
    b, _, _, c = x.shape
    return jax.image.resize(
        x, (b, size[0], size[1], c), method="linear", antialias=False
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
