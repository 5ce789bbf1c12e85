"""Learnable convolution helpers (NHWC / HWIO) with torch-parity init.

Used by the EncoderConditioning model family and the frozen feature
extractors (VGG16, MSOE). Kernels are stored HWIO so weight converters from
torch checkpoints are a simple transpose.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding="SAME",
    feature_group_count: int = 1,
) -> jnp.ndarray:
    """Cross-correlation conv on NHWC input with HWIO kernel.

    ``padding`` may be 'SAME', 'VALID', or an int (symmetric zero pad).
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    if b is not None:
        y = y + b
    return y


def torch_conv_init(
    key: jax.Array,
    kh: int,
    kw: int,
    c_in: int,
    c_out: int,
    groups: int = 1,
    bias: bool = True,
    zero_bias: bool = False,
    dtype=jnp.float32,
) -> dict:
    """torch.nn.Conv2d default init: kaiming-uniform(a=sqrt(5)) weights and
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bias; both reduce to bound
    1/sqrt(fan_in) with fan_in = (c_in/groups)*kh*kw.
    """
    kw_key, b_key = jax.random.split(key)
    fan_in = (c_in // groups) * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {
        "w": jax.random.uniform(
            kw_key, (kh, kw, c_in // groups, c_out), dtype, -bound, bound
        )
    }
    if bias:
        if zero_bias:
            p["b"] = jnp.zeros((c_out,), dtype)
        else:
            p["b"] = jax.random.uniform(b_key, (c_out,), dtype, -bound, bound)
    return p


def max_pool_2d(
    x: jnp.ndarray, window: int, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """Max pool on NHWC with symmetric zero-region padding (−inf identity)."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
