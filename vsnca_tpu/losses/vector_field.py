"""Vector-field motion loss + synthetic target-field library.

Parity targets: ExtraChannels/utils/loss/vector_field_loss.py:9-328. The
field generators are vectorized numpy (the reference uses Python
double-loops); fields are built host-side once per run and are exact
replicas including the reference's quirks: pi ≈ 3.1416, center-cell
skipping, zero last row/col for the half-open ranges, and the "+0.2 minimum
strength" shift for gradient fields.

Field tensors are NHWC: [1, H, W, 2], channel 0 = x-component.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TORCH_PI = 3.1416  # reference uses torch.FloatTensor([3.1416]), not np.pi


def _grids(img_size) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (i, j, in_range) where i/j are offsets from the center over the
    full H×W grid and in_range marks cells covered by the reference's
    range(-c, c) loops (the last row/col stay zero for odd remainders)."""
    h, w = img_size
    cx, cy = h // 2, w // 2
    rows = np.arange(h) - cx
    cols = np.arange(w) - cy
    i = np.broadcast_to(rows[:, None], (h, w)).astype(np.float64)
    j = np.broadcast_to(cols[None, :], (h, w)).astype(np.float64)
    # range(-c, c) covers offsets [-c, c): for odd sizes the last row/col
    # stays zero, exactly as in the reference loops.
    in_range = (rows[:, None] < cx) & (cols[None, :] < cy)
    return i, j, in_range


def _normalize_by_mean_strength(vec: np.ndarray) -> np.ndarray:
    avg = np.mean(np.sqrt(vec[..., 0] ** 2 + vec[..., 1] ** 2))
    return vec / avg


def get_motion_vector_field_by_name(name: str, img_size=(128, 128)) -> jnp.ndarray:
    """Build a target motion field [1, H, W, 2] by name
    (vector_field_loss.py:135-328).

    Names: an integer string (uniform direction in degrees), 'grad_θ_φ',
    'hyperbolic', 'circular', 'circle', 'converge', 'diverge', '2block_x',
    '2block_y', '3block', '4block'.
    """
    h, w = img_size
    try:
        deg = int(name)
        rad = deg / 180.0 * _TORCH_PI
        vec = np.zeros((h, w, 2), np.float64)
        vec[..., 0] = np.cos(rad)
        vec[..., 1] = np.sin(rad)
        return jnp.asarray(vec[None].astype(np.float32))
    except ValueError:
        pass

    i, j, in_range = _grids(img_size)
    r = np.sqrt(i**2 + j**2)
    vec = np.zeros((h, w, 2), np.float64)

    if name.startswith("grad"):
        theta = int(name.split("_")[1]) / 180.0 * _TORCH_PI
        phi = int(name.split("_")[2]) / 180.0 * _TORCH_PI
        alpha = j * np.cos(phi) + i * np.sin(phi)
        alpha = np.where(in_range, alpha, 0.0)
        vec[..., 0] = alpha
        vec[..., 1] = alpha
        vec = vec - vec.min() + 0.2
        vec[..., 0] *= np.cos(theta)
        vec[..., 1] *= np.sin(theta)
        vec = _normalize_by_mean_strength(vec)
    elif name == "hyperbolic":
        mask = in_range & (r != 0)
        maxr = (((h // 2) ** 2 + (w // 2) ** 2)) ** 0.5
        vec[..., 0] = np.where(mask, 4.0 * i / maxr, 0.0)
        vec[..., 1] = np.where(mask, 4.0 * j / maxr, 0.0)
        vec = _normalize_by_mean_strength(vec)
    elif name == "circular":
        mask = in_range & (r != 0)
        maxr = (((h // 2) ** 2 + (w // 2) ** 2)) ** 0.5
        vec[..., 0] = np.where(mask, 4.0 * i / maxr, 0.0)
        vec[..., 1] = np.where(mask, -4.0 * j / maxr, 0.0)
        vec = _normalize_by_mean_strength(vec)
    elif name == "circle":
        mask = in_range & (r != 0)
        rs = np.where(r == 0, 1.0, r)
        vec[..., 0] = np.where(mask, i / rs, 0.0)
        vec[..., 1] = np.where(mask, -j / rs, 0.0)
    elif name == "converge":
        mask = in_range & (r != 0)
        rs = np.where(r == 0, 1.0, r)
        vec[..., 0] = np.where(mask, -j / rs, 0.0)
        vec[..., 1] = np.where(mask, -i / rs, 0.0)
    elif name == "diverge":
        mask = in_range & (r != 0)
        rs = np.where(r == 0, 1.0, r)
        vec[..., 0] = np.where(mask, j / rs, 0.0)
        vec[..., 1] = np.where(mask, i / rs, 0.0)
    elif name in ("2block_x", "2block_y", "3block", "4block"):
        if name == "2block_x":
            rad_deg = np.where(i >= 0, 0.0, 180.0)
        elif name == "2block_y":
            rad_deg = np.where(i >= 0, 90.0, -90.0)
        elif name == "3block":
            rad_deg = np.where(i >= 0, 0.0, np.where(j < 0, 90.0, 180.0))
        else:  # 4block
            rad_deg = np.where(
                i >= 0,
                np.where(j >= 0, 0.0, 90.0),
                np.where(j < 0, 180.0, 270.0),
            )
        rad = rad_deg / 180.0 * _TORCH_PI
        vec[..., 0] = np.where(in_range, np.cos(rad), 0.0)
        vec[..., 1] = np.where(in_range, np.sin(rad), 0.0)
    else:
        raise ValueError(f"unknown motion vector field {name!r}")

    return jnp.asarray(vec[None].astype(np.float32))


def _cos_sim(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-pixel cosine similarity over the channel axis (torch
    CosineSimilarity semantics: denom = max(|a|·|b|, eps))."""
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


def vector_field_motion_loss(
    msoe_params,
    image_before: jnp.ndarray,
    image_after: jnp.ndarray,
    target_field: jnp.ndarray,
    step_n: jnp.ndarray,
    nca_base_num_steps: int = 24,
    motion_img_size=(128, 128),
    strength_weight: float = 0.5,
    direction_weight: float = 0.5,
):
    """Direction + gated-strength motion loss vs a synthetic field
    (vector_field_loss.py:50-132).

    image_before/after: RGB [-1, 1]; target_field: [1, H, W, 2]; ``step_n``
    may be a traced scalar — the flow magnitude is rescaled by
    base_steps / step_n. Returns (loss, log_dict, flow).
    """
    from vsnca_tpu.models.msoe import motion_pair_from_rgb, msoe_forward

    pair = motion_pair_from_rgb(image_before, image_after, motion_img_size)
    flow = msoe_forward(msoe_params, pair)  # [B, H, W, 2]

    logs = {}
    loss = 0.0

    cos = _cos_sim(flow, target_field)  # [B, H, W]

    if strength_weight > 0:
        strength = jnp.linalg.norm(flow, axis=-1) * (
            nca_base_num_steps / step_n
        )
        target_strength = jnp.linalg.norm(target_field, axis=-1)
        sl = jnp.abs(strength - target_strength)
        cos_loss_b = 1.0 - jnp.mean(cos, axis=(1, 2), keepdims=True)
        alpha = jax.lax.stop_gradient(1.0 - jnp.clip(cos_loss_b, 0.0, 1.0))
        sl = jnp.mean(sl * alpha)
        logs["strength"] = sl
        loss = loss + strength_weight * sl

    if direction_weight > 0:
        dl = 1.0 - jnp.mean(cos)
        logs["direction"] = dl
        loss = loss + direction_weight * dl

    return loss, logs, flow
