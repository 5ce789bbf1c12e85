"""Spatial padding helpers for NHWC tensors."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_PAD_MODES = {
    "zeros": "constant",
    "constant": "constant",
    "replicate": "edge",
    "edge": "edge",
    "circular": "wrap",
    "wrap": "wrap",
    "reflect": "reflect",
}


def pad2d(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    """Pad the two spatial dims of an NHWC tensor.

    ``mode`` accepts the reference's names (replicate/circular/zeros —
    ConditioneDyNCA/models/dynca.py:85) as well as numpy names.
    """
    jmode = _PAD_MODES[mode]
    widths = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    if jmode == "constant":
        return jnp.pad(x, widths, mode="constant", constant_values=0.0)
    return jnp.pad(x, widths, mode=jmode)


def _reflect_index(idx: np.ndarray, n: int) -> np.ndarray:
    """Half-sample symmetric reflection of indices into [0, n).

    Mirrors the triangular-wave index math of the reference's
    ``symmetric_padding`` (ExtraChannels/models/MSOEmultiscale.py:4-24),
    reflecting around -0.5 and n - 0.5 so edge samples are duplicated.
    """
    minx, maxx = -0.5, n - 0.5
    rng = maxx - minx
    double_rng = 2 * rng
    mod = np.fmod(idx - minx, double_rng)
    normed = np.where(mod < 0, mod + double_rng, mod)
    out = np.where(normed >= rng, double_rng - normed, normed) + minx
    return out.astype(np.int64)


def symmetric_pad_2d(x: jnp.ndarray, padding) -> jnp.ndarray:
    """Symmetric (half-sample, edge-duplicating) padding on NHWC spatial dims.

    ``padding`` is (left, right, top, bottom). For pads within one period
    (pad <= size, always true for the MSOE kernels) this lowers to
    flip+concat slices, which XLA compiles orders of magnitude faster than
    the equivalent gather (the gather formulation cost ~7 min of TPU compile
    for the MSOE forward alone); larger pads fall back to the triangular-
    wave gather.
    """
    left, right, top, bottom = padding
    h, w = x.shape[1], x.shape[2]
    if max(left, right) <= w and max(top, bottom) <= h:
        parts = []
        if top:
            parts.append(jnp.flip(x[:, :top], axis=1))
        parts.append(x)
        if bottom:
            parts.append(jnp.flip(x[:, h - bottom :], axis=1))
        x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else x
        parts = []
        if left:
            parts.append(jnp.flip(x[:, :, :left], axis=2))
        parts.append(x)
        if right:
            parts.append(jnp.flip(x[:, :, w - right :], axis=2))
        return jnp.concatenate(parts, axis=2) if len(parts) > 1 else x
    x_idx = _reflect_index(np.arange(-left, w + right), w)
    y_idx = _reflect_index(np.arange(-top, h + bottom), h)
    x = jnp.take(x, jnp.asarray(y_idx), axis=1)
    x = jnp.take(x, jnp.asarray(x_idx), axis=2)
    return x
