"""MSOE multiscale two-stream motion-energy network (frozen flow backend).

Functional JAX port of the reference's frozen optic-flow net
(ExtraChannels/models/MSOEmultiscale.py:86-175): a 5-level Gaussian pyramid
of motion-energy units (11x11x2 conv → square → maxpool → 1x1 → L1-norm)
with TF-consistent bilinear upsampling back to full resolution, a 320-channel
motion feature, and a small decoder producing 2-channel flow.

All padding is the half-sample symmetric scheme (MSOEmultiscale.py:4-24);
the per-frame 2-tap "3-D" convolution is expressed as two 2-D convolutions
summed, which is exactly the valid-mode Conv3d over a depth-2 axis.

Weights: convert the reference's ``two_stream_dynamic_model.pth`` with
``scripts/convert_msoe.py`` → npz; without it, ``load_msoe`` falls back to a
deterministic random init (flow values then differ from the reference, but
all shapes/derivatives are exercised).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsnca_tpu.ops.conv import conv2d, max_pool_2d
from vsnca_tpu.ops.filters import matlab_gaussian_kernel_2d
from vsnca_tpu.ops.grid_sample import tf_consistent_bilinear_upsample
from vsnca_tpu.ops.padding import symmetric_pad_2d

N_SCALES = 5


def msoe_random_init(key: jax.Array, dtype=jnp.float32) -> dict:
    """Deterministic fallback weights with torch-default init bounds."""

    def u(k, shape, fan_in):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    k1, k2, k3, k4, kb1, kb2, kb3, kb4 = jax.random.split(key, 8)
    return {
        # conv1: Conv3d(1, 32, (11, 11, 2)) → [11, 11, 2, 32]
        "conv1_w": u(k1, (11, 11, 2, 32), 11 * 11 * 2),
        "conv1_b": u(kb1, (32,), 11 * 11 * 2),
        "conv2_w": u(k2, (1, 1, 32, 64), 32),
        "conv2_b": u(kb2, (64,), 32),
        "decode1_w": u(k3, (3, 3, 64 * N_SCALES, 64), 64 * N_SCALES * 9),
        "decode1_b": u(kb3, (64,), 64 * N_SCALES * 9),
        "decode2_w": u(k4, (1, 1, 64, 2), 64),
        "decode2_b": u(kb4, (2,), 64),
    }


def msoe_from_npz(path: str) -> dict:
    data = np.load(path)
    return {k: jnp.asarray(v) for k, v in data.items()}


DEFAULT_MSOE_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "weights", "msoe.npz"),
    "/root/repo/weights/msoe.npz",
)


def load_msoe(path: Optional[str] = None) -> Tuple[dict, bool]:
    candidates = [path] if path else list(DEFAULT_MSOE_PATHS)
    for p in candidates:
        if p and os.path.exists(p):
            return msoe_from_npz(p), True
    return msoe_random_init(jax.random.PRNGKey(175)), False


def contrast_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize a frame pair to zero mean / unit std over all non-batch dims
    (MSOEmultiscale.py:127-136; torch.var unbiased)."""
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    n = np.prod([x.shape[a] for a in axes])
    var = jnp.sum((x - mean) ** 2, axis=axes, keepdims=True) / max(n - 1, 1)
    return (x - mean) / jnp.sqrt(var + 1e-12)


def _msoenet(params: dict, pair: jnp.ndarray) -> jnp.ndarray:
    """Motion-energy unit on a frame pair [B, H, W, 2] → [B, H, W, 64]
    (MSOEmultiscale.py:86-112)."""
    x = symmetric_pad_2d(pair, (5, 5, 5, 5))
    # The 2-tap temporal Conv3d over a depth-2 axis IS a single 2-channel
    # 2-D convolution (the C_in reduction = the temporal-tap sum); one conv
    # call doubles the MXU contraction depth vs two C_in=1 convs.
    y = conv2d(x, params["conv1_w"], params["conv1_b"], padding="VALID")
    y = jnp.square(y)
    y = max_pool_2d(y, 5, 1, 2)
    y = conv2d(y, params["conv2_w"], params["conv2_b"])
    norm = jnp.sum(jnp.abs(y), axis=-1, keepdims=True)
    return y / jnp.maximum(norm, 1e-12)


def _pyramid_blur(pair: jnp.ndarray) -> jnp.ndarray:
    """k5 sigma-2 Gaussian blur + stride-2 decimation per frame with
    symmetric padding (MSOEmultiscale.py:46-69)."""
    k = jnp.asarray(matlab_gaussian_kernel_2d((5, 5), 2.0), pair.dtype)
    kw = jnp.tile(k[:, :, None, None], (1, 1, 1, 2))  # depthwise over 2 frames
    x = symmetric_pad_2d(pair, (2, 2, 2, 2))
    return jax.lax.conv_general_dilated(
        x,
        kw,
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2,
    )


def msoe_forward(
    params: dict, pair: jnp.ndarray, return_features: bool = False
):
    """Frame pair [B, H, W, 2] (grayscale in [0,1], H == W) → flow [B, H, W, 2].

    Orientation parity: flow channel 1 is negated as in the reference
    (MSOEmultiscale.py:170). ``return_features`` additionally returns the
    320-channel pre-decoder motion feature (the motion-texture descriptor).
    """
    x0 = contrast_norm(pair)
    levels = [x0]
    for _ in range(N_SCALES - 1):
        levels.append(_pyramid_blur(levels[-1]))

    hs = [_msoenet(params, lv) for lv in levels]
    zs = [hs[0]]
    for i in range(1, N_SCALES):
        zs.append(tf_consistent_bilinear_upsample(hs[i], scale_factor=float(2**i)))
    z = jnp.concatenate(zs, axis=-1)  # [B, H, W, 320]

    d = symmetric_pad_2d(z, (1, 1, 1, 1))
    d = conv2d(d, params["decode1_w"], params["decode1_b"], padding="VALID")
    d = jax.nn.relu(d)
    flow = conv2d(d, params["decode2_w"], params["decode2_b"])
    flow = flow * jnp.asarray([1.0, -1.0], flow.dtype)

    if return_features:
        return flow, [z]
    return flow


def rgb_to_grayscale(x: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma with torchvision's exact coefficients (0.2989, not
    0.299), matching ``TF.rgb_to_grayscale`` used when feeding MSOE
    (vector_field_loss.py:84-85)."""
    w = jnp.asarray([0.2989, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def motion_pair_from_rgb(
    image1: jnp.ndarray, image2: jnp.ndarray, size: Tuple[int, int]
) -> jnp.ndarray:
    """Two RGB frames in [-1, 1] → MSOE input pair [B, H, W, 2]
    (vector_field_loss.py:73-87): resize → [0,1] → grayscale → stack."""
    from vsnca_tpu.ops.resize import resize_bilinear

    if image1.shape[1:3] != tuple(size):
        image1 = resize_bilinear(image1, size)
    if image2.shape[1:3] != tuple(size):
        image2 = resize_bilinear(image2, size)
    g1 = rgb_to_grayscale((image1 + 1.0) / 2.0)
    g2 = rgb_to_grayscale((image2 + 1.0) / 2.0)
    return jnp.concatenate([g1, g2], axis=-1)


def motion_pairs_from_frames(frames, size: Tuple[int, int]) -> jnp.ndarray:
    """Consecutive-pair MSOE inputs for a frame sequence, stacked on batch:
    [len(frames)-1 × B, h, w, 2].

    Value-identical to calling ``motion_pair_from_rgb`` per pair and
    concatenating, but each frame is resized + grayscaled ONCE (interior
    frames belong to two pairs — the per-pair path recomputed them, and its
    BPTT backward re-ran each interior frame's resize adjoint twice), and
    all frames ride a single batched resize/luma op.
    """
    from vsnca_tpu.ops.resize import resize_bilinear

    t = len(frames)
    assert t >= 2
    x = jnp.concatenate(list(frames), axis=0)
    if x.shape[1:3] != tuple(size):
        x = resize_bilinear(x, size)
    g = rgb_to_grayscale((x + 1.0) / 2.0)
    b = frames[0].shape[0]
    return jnp.concatenate(
        [
            jnp.concatenate([g[i * b : (i + 1) * b], g[(i + 1) * b : (i + 2) * b]], axis=-1)
            for i in range(t - 1)
        ],
        axis=0,
    )
