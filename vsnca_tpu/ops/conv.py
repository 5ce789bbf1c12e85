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


# Trace-time switch for the stride-1 pooling lowering (flip between
# benchmark runs to A/B the two paths in one process; jit programs trace
# whichever value is set at trace time). MEASURED NEGATIVE on v5e
# (scripts/profile_vm_r4c.py, 256² MSOE inside the video_motion train
# iteration): the shifted-slices path is ~11 ms/iter SLOWER than
# reduce_window + select_and_scatter — its W-direction shifted slices are
# sublane-misaligned relayouts (the round-2 layout lesson), which dwarf
# whatever the elementwise-select VJP saves. Default stays reduce_window.
_POOL_SHIFTMAX = False


def max_pool_2d(
    x: jnp.ndarray, window: int, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """Max pool on NHWC with symmetric zero-region padding (−inf identity).

    With ``_POOL_SHIFTMAX`` set, stride-1 float pools take a separable
    shifted-slices path: the max over a w×w window is the H-axis max of w
    shifted views followed by the W-axis max (2·(w−1) elementwise maxima).
    Value-identical to ``reduce_window`` with an elementwise-select VJP, but
    measured SLOWER in production (see the toggle's comment) — kept only as
    the A/B arm for profiling.
    """
    is_float = jnp.issubdtype(x.dtype, jnp.floating)
    if stride == 1 and is_float and window > 1 and _POOL_SHIFTMAX:
        neg = jnp.asarray(-jnp.inf, x.dtype)
        xp = jnp.pad(
            x,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            constant_values=neg,
        )
        out_h = x.shape[1] + 2 * padding - window + 1
        out_w = x.shape[2] + 2 * padding - window + 1
        r = xp[:, 0:out_h]
        for d in range(1, window):
            r = jnp.maximum(r, xp[:, d : d + out_h])
        y = r[:, :, 0:out_w]
        for d in range(1, window):
            y = jnp.maximum(y, r[:, :, d : d + out_w])
        return y
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x,
        -jnp.inf if is_float else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
