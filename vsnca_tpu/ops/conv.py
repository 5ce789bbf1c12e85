"""Learnable convolution helpers (NHWC / HWIO) with torch-parity init.

Used by the EncoderConditioning model family and the frozen feature
extractors (VGG16, MSOE). Kernels are stored HWIO so weight converters from
torch checkpoints are a simple transpose.
"""

from __future__ import annotations

import math
from functools import partial
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

# Stride-1 float pools take a custom-VJP path by default: reduce_window
# forwards (separable 1D×1D — values identical to the 2D window) with an
# equality-mask backward instead of XLA's select_and_scatter, which the
# r4d stage split measured at ~25 ms/iter of the video_motion training
# iteration (scripts/profile_vm_r4d.py: the 5×5 stride-1 pool is 25.5 ms
# of the 34 ms MSOE fwd+bwd marginal; everything else in MSOE is ≤6 ms).
# The backward is w shifted compare-accumulate passes per 1D stage — all
# static-offset slices of padded arrays that XLA fuses into elementwise
# loops. Tie semantics differ from select_and_scatter: gradient is SPLIT
# evenly across tied argmaxes (a valid symmetric subgradient) instead of
# routed to the first match — identical on tie-free inputs (any random
# test), and better-behaved on the real tie case (flat image regions
# squaring to equal conv responses).
_POOL_EQ_VJP = True


def _rw_max_1d(x: jnp.ndarray, window: int, padding: int, axis: int):
    """1D max reduce_window along ``axis`` of an NHWC array, stride 1."""
    dims = [1, 1, 1, 1]
    pads = [(0, 0)] * 4
    dims[axis] = window
    pads[axis] = (padding, padding)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=tuple(dims),
        window_strides=(1, 1, 1, 1),
        padding=tuple(pads),
    )


def _ax_pad(x, axis, lo, hi, value):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (lo, hi)
    return jnp.pad(x, pads, constant_values=value)


def _ax_slice(x, axis, start, size):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, start + size)
    return x[tuple(idx)]


def _eq_bwd_1d(x, y, g, window, padding, axis):
    """VJP of a 1D stride-1 max pool via equality masks.

    For output o with window [o−p, o−p+w−1]: tie count
    T[o] = Σ_d [x[o−p+d] == y[o]], and the input cotangent
    gx[i] = Σ_{o ∋ i} (g[o]/T[o]) · [x[i] == y[o]]. Both sums unroll as
    ``window`` static-offset slices of −inf/0-padded arrays, so out-of-range
    windows contribute nothing (padded y = −inf never equals finite x).
    """
    w, p = window, padding
    n_out = y.shape[axis]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = _ax_pad(x, axis, p, p, neg)
    ties = None
    for d in range(w):
        eq = (_ax_slice(xp, axis, d, n_out) == y).astype(x.dtype)
        ties = eq if ties is None else ties + eq
    gs = g / ties
    yp = _ax_pad(y, axis, w - 1 - p, w - 1 - p, neg)
    gp = _ax_pad(gs, axis, w - 1 - p, w - 1 - p, 0.0)
    n_in = x.shape[axis]
    gx = None
    for s in range(w):
        term = _ax_slice(gp, axis, s, n_in) * (
            x == _ax_slice(yp, axis, s, n_in)
        ).astype(x.dtype)
        gx = term if gx is None else gx + term
    return gx


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_2d_eq(x: jnp.ndarray, window: int, padding: int):
    return _rw_max_1d(_rw_max_1d(x, window, padding, 2), window, padding, 1)


def _max_pool_2d_eq_fwd(x, window, padding):
    y1 = _rw_max_1d(x, window, padding, 2)
    y = _rw_max_1d(y1, window, padding, 1)
    return y, (x, y1, y)


def _max_pool_2d_eq_bwd(window, padding, res, g):
    x, y1, y = res
    g1 = _eq_bwd_1d(y1, y, g, window, padding, 1)
    gx = _eq_bwd_1d(x, y1, g1, window, padding, 2)
    return (gx,)


_max_pool_2d_eq.defvjp(_max_pool_2d_eq_fwd, _max_pool_2d_eq_bwd)


def _rw_max_nonoverlap(x: jnp.ndarray, window: int):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, window, window, 1),
        padding="VALID",
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_2d_nonoverlap_eq(x: jnp.ndarray, window: int):
    """window == stride max pool (VGG's 2×2/2): each input cell belongs to
    exactly one window, so the VJP is repeat-upsample + equality mask —
    no select_and_scatter (same motivation as ``_max_pool_2d_eq``)."""
    return _rw_max_nonoverlap(x, window)


def _max_pool_2d_nonoverlap_eq_fwd(x, window):
    y = _rw_max_nonoverlap(x, window)
    return y, (x, y)


def _max_pool_2d_nonoverlap_eq_bwd(window, res, g):
    x, y = res
    w = window
    hc, wc = y.shape[1] * w, y.shape[2] * w  # VALID: tail rows/cols unused

    def up(v):  # nearest ×w upsample
        return jnp.repeat(jnp.repeat(v, w, axis=1), w, axis=2)

    eq = (x[:, :hc, :wc] == up(y)).astype(x.dtype)
    ties = jax.lax.reduce_window(
        eq,
        jnp.asarray(0.0, x.dtype),
        jax.lax.add,
        window_dimensions=(1, w, w, 1),
        window_strides=(1, w, w, 1),
        padding="VALID",
    )
    gx = eq * up(g / ties)
    pads = (
        (0, 0),
        (0, x.shape[1] - hc),
        (0, x.shape[2] - wc),
        (0, 0),
    )
    return (jnp.pad(gx, pads),)


_max_pool_2d_nonoverlap_eq.defvjp(
    _max_pool_2d_nonoverlap_eq_fwd, _max_pool_2d_nonoverlap_eq_bwd
)


def max_pool_2d(
    x: jnp.ndarray, window: int, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """Max pool on NHWC with symmetric zero-region padding (−inf identity).

    Stride-1 float pools default to ``_max_pool_2d_eq``: separable
    reduce_window forwards with an equality-mask custom VJP (see the
    ``_POOL_EQ_VJP`` comment — select_and_scatter was the single biggest
    term of the video-motion loss backward). ``_POOL_SHIFTMAX`` selects the
    shifted-slices forward instead (measured negative, kept as an A/B arm).
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
    if stride == 1 and is_float and window > 1 and _POOL_EQ_VJP:
        return _max_pool_2d_eq(x, window, padding)
    if (stride == window and padding == 0 and is_float and window > 1
            and _POOL_EQ_VJP):
        return _max_pool_2d_nonoverlap_eq(x, window)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x,
        -jnp.inf if is_float else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
