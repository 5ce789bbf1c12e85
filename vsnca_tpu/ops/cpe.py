"""Cartesian positional encoding (CPE2D)."""

from __future__ import annotations

import jax.numpy as jnp


def cartesian_positional_encoding(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, 2] positional grid in (-1, 1).

    Channel 0 varies along rows (H), channel 1 along columns (W):
    ``2 * (i / n - 0.5 + 0.5 / n)`` per axis
    (ConditioneDyNCA/models/dynca.py:238-248).
    """
    xs = 2.0 * (jnp.arange(h, dtype=dtype) / h - 0.5 + 0.5 / h)
    ys = 2.0 * (jnp.arange(w, dtype=dtype) / w - 0.5 + 0.5 / w)
    cx = jnp.broadcast_to(xs[:, None], (h, w))
    cy = jnp.broadcast_to(ys[None, :], (h, w))
    return jnp.stack([cx, cy], axis=-1)
