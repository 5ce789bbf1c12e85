"""Host-side image/video preprocessing (L1 of SURVEY.md §1).

Parity targets: ExtraChannels/utils/misc/preprocess_texture.py:9-211 —
center-crop-to-square, resize, [0,1] (style) or [-1,1] (video/targets),
NHWC float32 arrays. Decoding uses PIL for images/GIFs and OpenCV for
mp4/avi; everything returns numpy (device transfer happens in the trainer).

Synthetic generators provide deterministic fixtures for tests/benchmarks in
the no-assets environment.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

try:
    from PIL import Image, ImageSequence

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _center_crop_square(arr: np.ndarray) -> np.ndarray:
    h, w = arr.shape[:2]
    if h == w:
        return arr
    cut = abs(w - h) // 2
    if w > h:
        return arr[:, cut : w - cut, :]
    return arr[cut : h - cut, :, :]


def preprocess_pil_image(img, img_size=(128, 128)) -> np.ndarray:
    """PIL image → [1, H, W, 3] float32 in [0, 1]
    (preprocess_texture.py:9-33)."""
    img = img.convert("RGB")
    arr = np.asarray(img)
    arr = _center_crop_square(arr)
    img = Image.fromarray(arr.astype(np.uint8)).resize((img_size[0], img_size[1]))
    out = np.float32(img) / 255.0
    return out[None]


def preprocess_style_image(path_or_img, img_size=(128, 128), batch_size: int = 4) -> np.ndarray:
    """Style image file/PIL → [batch, H, W, 3] in [0, 1]."""
    img = Image.open(path_or_img) if isinstance(path_or_img, (str, os.PathLike)) else path_or_img
    one = preprocess_pil_image(img, img_size)
    return np.repeat(one, batch_size, axis=0)


def preprocess_target_images(paths: Sequence[str], img_size=(128, 128), normal_rgb=False) -> np.ndarray:
    """Image folder → [T, H, W, 3] in [-1, 1] (preprocess_texture.py:35-44)."""
    frames = []
    for p in paths:
        f = preprocess_style_image(p, img_size, batch_size=1)[0]
        if not normal_rgb:
            f = f * 2.0 - 1.0
        frames.append(f)
    return np.stack(frames)


def preprocess_video(path: str, img_size=(128, 128), normal_rgb=False, max_frames=None) -> np.ndarray:
    """GIF/mp4/avi → [T, H, W, 3] in [-1, 1] (preprocess_texture.py:46-85)."""
    frames: List[np.ndarray] = []
    if path.endswith(".gif"):
        gif = Image.open(path)
        for frame in ImageSequence.Iterator(gif):
            frames.append(preprocess_pil_image(frame, img_size)[0])
            if max_frames and len(frames) >= max_frames:
                break
    elif path.endswith((".avi", ".mp4")):
        assert _HAS_CV2, "OpenCV required for mp4/avi decode"
        cap = cv2.VideoCapture(path)
        while cap.isOpened():
            ret, frame = cap.read()
            if not ret:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frames.append(
                preprocess_pil_image(Image.fromarray(frame), img_size)[0]
            )
            if max_frames and len(frames) >= max_frames:
                break
        cap.release()
    else:
        raise ValueError(f"unsupported video format: {path}")
    seq = np.stack(frames)
    if not normal_rgb:
        seq = seq * 2.0 - 1.0
    return seq


def rgb_to_grayscale_mean(x: np.ndarray) -> np.ndarray:
    """Channel-mean grayscale, keepdim — the reference's RGBToGrayscale
    (preprocess_texture.py:178-179), distinct from the luma weights MSOE
    uses."""
    return np.mean(x, axis=-1, keepdims=True)


def compute_flow_strengths(msoe_params, video) -> List[float]:
    """Mean MSOE flow magnitude for each consecutive frame pair of a
    [T, H, W, 3] in [-1, 1] video (the appearance-frame auto-selection
    pipeline, preprocess_texture.py:116-149)."""
    import jax
    import jax.numpy as jnp

    from vsnca_tpu.models.msoe import motion_pair_from_rgb, msoe_forward

    video = jnp.asarray(video)
    size = (video.shape[1], video.shape[2])

    @jax.jit
    def strength(f1, f2):
        pair = motion_pair_from_rgb(f1[None], f2[None], size)
        flow = msoe_forward(msoe_params, pair)
        return jnp.mean(jnp.linalg.norm(flow, axis=-1))

    return [
        float(strength(video[t], video[t + 1])) for t in range(video.shape[0] - 1)
    ]


def select_frame_by_vgg_median(vgg_params, image_seq) -> int:
    """Pick the frame whose VGG features are closest to the sequence mean
    (preprocess_texture.py:88-114 ``select_frame``; dead code at reference
    runtime, reimplemented for inventory completeness).

    image_seq: [T, H, W, 3] in [-1, 1]; uses the relu4_1 tap (the
    reference's features[-2:-1] slice of the style taps).
    """
    import jax.numpy as jnp

    from vsnca_tpu.models.vgg import vgg16_features

    seq01 = (jnp.asarray(image_seq) + 1.0) / 2.0
    feats = vgg16_features(vgg_params, seq01, layers=(18,))[0]  # relu4_1
    avg = jnp.mean(feats, axis=0)
    dists = jnp.asarray(
        [jnp.mean(jnp.linalg.norm(feats[t] - avg)) for t in range(feats.shape[0])]
    )
    return int(jnp.argmin(dists))


def select_appearance_frame(flow_strengths: Sequence[float]) -> int:
    """Appearance-frame auto-selection: the frame pair with maximum mean
    flow magnitude (preprocess_texture.py:116-149). Callers compute
    ``flow_strengths[t] = mean |MSOE flow(frame_t, frame_{t+1})|``."""
    total = float(sum(flow_strengths))
    weights = [s / total for s in flow_strengths]
    return int(np.argmax(weights))


def get_start_frame_idx(rng: np.random.RandomState, video_len: int,
                        window: int) -> int:
    """Window-start sampler for target-video frame windows, matching the
    reference algorithm (ExtraChannels/utils/misc/misc.py:4-30): draw a
    uniform anchor frame, then grow a ``window``-frame window around it by
    random left/right expansions (uniform weights), clamped at the video
    ends; return the window start index."""
    idx_vid = int(rng.randint(0, max(video_len - 1, 1)))
    start = idx_vid
    left_add, right_add = 1, 1
    remaining = window - 2
    while remaining > 0:
        left_expand = idx_vid - left_add
        right_expand = idx_vid + right_add + 1
        if left_expand < 0:
            go_left = False
        elif right_expand > video_len - 1:
            go_left = True
        else:
            go_left = bool(rng.randint(0, 2))
        if go_left:
            left_add += 1
            start -= 1
        else:
            right_add += 1
        remaining -= 1
    return int(max(start, 0))


# ----------------------------------------------------------- synthetic


def synthetic_style_image(img_size=(128, 128), batch_size: int = 4, seed: int = 0) -> np.ndarray:
    """Deterministic colorful test texture in [0, 1], [B, H, W, 3]."""
    h, w = img_size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 0.5 + 0.5 * np.sin(2 * np.pi * (xx / w * 3 + yy / h))
    g = 0.5 + 0.5 * np.cos(2 * np.pi * (yy / h * 2 - xx / w))
    b = 0.5 + 0.5 * np.sin(2 * np.pi * ((xx + yy) / (h + w) * 4 + seed))
    img = np.stack([r, g, b], axis=-1)[None]
    return np.repeat(img, batch_size, axis=0).astype(np.float32)


def synthetic_video(img_size=(128, 128), n_frames: int = 8, seed: int = 0) -> np.ndarray:
    """Deterministic drifting texture in [-1, 1], [T, H, W, 3]."""
    h, w = img_size
    frames = []
    for t in range(n_frames):
        base = synthetic_style_image(img_size, 1, seed)[0]
        shift = int(t * 2) % w
        frames.append(np.roll(base, shift, axis=1))
    return (np.stack(frames) * 2.0 - 1.0).astype(np.float32)
