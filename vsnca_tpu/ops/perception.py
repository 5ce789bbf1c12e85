"""NCA perception: fixed 3x3 stencils evaluated on the VPU.

TPU-first design: instead of dispatching depthwise convolutions (tiny
channel counts starve the MXU), the Sobel-x / Sobel-y / Laplacian responses
are computed as one shared 9-point stencil — pad once, slice the 8 shifted
neighborhoods, and form the three filter outputs with fused multiply-adds.
XLA fuses the whole perception into a single elementwise kernel.

Behavioral parity: reference ``perceive_torch`` / ``perceive_multiscale``
(ConditioneDyNCA/models/dynca.py:75-115) and ``EdgeExtractor``
(ConditioneDyNCA/models/dynca.py:182-213).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from vsnca_tpu.ops.padding import pad2d
from vsnca_tpu.ops.resize import resize_bilinear


def _shifted(p: jnp.ndarray, h: int, w: int):
    """Return the 3x3 neighborhood slices of a 1-padded NHWC tensor.

    ``n[di][dj]`` is the input shifted so that position (i, j) reads the
    padded value at (i + di - 1, j + dj - 1) — cross-correlation layout.
    """
    return [[p[:, di : di + h, dj : dj + w, :] for dj in range(3)] for di in range(3)]


def stencil_3x3(x: jnp.ndarray, kernels: Sequence, pad_mode: str) -> list:
    """Apply several fixed 3x3 cross-correlation kernels to every channel.

    x: [B, H, W, C]; each kernel is a 3x3 array (numpy or jnp).
    Returns a list of [B, H, W, C] responses, one per kernel, sharing a
    single padded buffer and neighborhood slices.
    """
    h, w = x.shape[1], x.shape[2]
    p = pad2d(x, 1, pad_mode)
    n = _shifted(p, h, w)
    outs = []
    for k in kernels:
        acc = None
        for di in range(3):
            for dj in range(3):
                kv = float(k[di][dj])
                if kv == 0.0:
                    continue
                term = n[di][dj] * kv if kv != 1.0 else n[di][dj]
                acc = term if acc is None else acc + term
        outs.append(acc)
    return outs


def depthwise_3x3(x: jnp.ndarray, kernel, pad_mode: str) -> jnp.ndarray:
    """Single fixed-kernel depthwise 3x3 cross-correlation on NHWC."""
    return stencil_3x3(x, [kernel], pad_mode)[0]


def perceive(x: jnp.ndarray, pad_mode: str = "replicate") -> jnp.ndarray:
    """Single-scale DyNCA perception: concat [x, sobel_x(x), sobel_y(x), lap(x)].

    Channel layout matches the reference's block order
    (ConditioneDyNCA/models/dynca.py:92-95): [C raw | C sx | C sy | C lap].
    """
    from vsnca_tpu.ops.filters import SOBEL_X, SOBEL_Y, LAPLACIAN

    y1, y2, y3 = stencil_3x3(x, [SOBEL_X, SOBEL_Y, LAPLACIAN], pad_mode)
    return jnp.concatenate([x, y1, y2, y3], axis=-1)


def perceive_multiscale(
    x: jnp.ndarray,
    perception_scales: Sequence[int] = (0,),
    pad_mode: str = "replicate",
) -> jnp.ndarray:
    """Multi-scale perception averaged over scales.

    For scale s > 0 the state is bilinearly downsampled to (H // 2^s, W // 2^s),
    perceived, and upsampled back (align_corners=False semantics on both
    trips), then all scales are averaged
    (ConditioneDyNCA/models/dynca.py:75-115).
    """
    h, w = x.shape[1], x.shape[2]
    acc = None
    for scale in perception_scales:
        if scale == 0:
            z = perceive(x, pad_mode)
        else:
            hs, ws = h // (2**scale), w // (2**scale)
            xs = resize_bilinear(x, (hs, ws))
            z = perceive(xs, pad_mode)
            z = resize_bilinear(z, (h, w))
        acc = z if acc is None else acc + z
    return acc / float(len(perception_scales))


def edge_extract(gray: jnp.ndarray, transform: str = "none") -> jnp.ndarray:
    """Edge conditioning map from a grayscale image.

    gray: [B, H, W, 1] → [B, H, W, 3] = [sobel_x, sobel_y, laplacian], with
    zero padding (torch Conv2d padding=1 default) and optional tanh
    (ConditioneDyNCA/models/dynca.py:182-213).
    """
    from vsnca_tpu.ops.filters import SOBEL_X, SOBEL_Y, LAPLACIAN

    y1, y2, y3 = stencil_3x3(gray, [SOBEL_X, SOBEL_Y, LAPLACIAN], "zeros")
    out = jnp.concatenate([y1, y2, y3], axis=-1)
    if transform == "tanh":
        out = jnp.tanh(out)
    return out
