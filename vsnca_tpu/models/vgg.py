"""VGG16 feature extractor (jitted, functional).

Replaces the reference's torchvision ``vgg16(pretrained=True).features``
backend (ExtraChannels/utils/loss/appearance_loss.py:211-236,
content_loss.py:33-45). Layer indexing follows torchvision's Sequential so
the reference's layer constants carry over: style taps [1, 6, 11, 18, 25]
(post-ReLU of convN_1) and content tap 19 (conv4_2 pre-ReLU).

Weights: convert a torchvision checkpoint once with
``scripts/convert_vgg16.py`` → npz; ``load_vgg16`` falls back to a
deterministic random init when no checkpoint is available (offline CI), in
which case losses remain well-defined (random-feature style distances) but
are not parity-comparable with the reference.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsnca_tpu.ops.conv import conv2d

# (out_channels, pool_after) per conv, torchvision vgg16 "D" configuration.
VGG16_CONVS: Tuple[Tuple[int, bool], ...] = (
    (64, False), (64, True),
    (128, False), (128, True),
    (256, False), (256, False), (256, True),
    (512, False), (512, False), (512, True),
    (512, False), (512, False), (512, True),
)

# torchvision Sequential index of each conv (for layer-tap bookkeeping).
VGG16_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)

STYLE_LAYERS = (1, 6, 11, 18, 25)  # relu1_1, relu2_1, relu3_1, relu4_1, relu5_1
CONTENT_LAYER = 19  # conv4_2 pre-ReLU

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def vgg16_random_init(key: jax.Array, dtype=jnp.float32) -> List[dict]:
    """Deterministic fallback weights, He-normal (std = sqrt(2/fan_in)).

    NOT torch's default kaiming-uniform-with-a=sqrt(5): that scheme shrinks
    ReLU activations ~3x per conv, so 13 layers deep the content tap
    (conv4_2) collapses to ~1e-2 magnitudes and the content / deep-style
    losses carry no usable signal under the fallback (measured: content
    MSE between a photo and a black frame was 6e-7 — the round-4 encoder
    artifact run trained with an effectively dead content term). He-normal
    is variance-preserving through conv+ReLU, keeping every tap O(1), so
    the no-pretrained-weights path still optimizes meaningfully. Pretrained
    conversions (scripts/convert_vgg16.py) are unaffected.
    """
    params = []
    c_in = 3
    for i, (c_out, _) in enumerate(VGG16_CONVS):
        kw, kb, key = jax.random.split(key, 3)
        fan_in = c_in * 9
        std = math.sqrt(2.0 / fan_in)
        params.append(
            {
                "w": std * jax.random.normal(kw, (3, 3, c_in, c_out), dtype),
                "b": jnp.zeros((c_out,), dtype),
            }
        )
        c_in = c_out
    return params


def vgg16_from_npz(path: str) -> List[dict]:
    data = np.load(path)
    params = []
    for i in range(len(VGG16_CONVS)):
        params.append(
            {"w": jnp.asarray(data[f"w{i}"]), "b": jnp.asarray(data[f"b{i}"])}
        )
    return params


DEFAULT_VGG_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "weights", "vgg16.npz"),
    "/root/repo/weights/vgg16.npz",
)


def load_vgg16(path: Optional[str] = None, dtype=jnp.float32) -> Tuple[List[dict], bool]:
    """Load converted VGG16 weights; returns (params, pretrained_flag)."""
    candidates = [path] if path else list(DEFAULT_VGG_PATHS)
    for p in candidates:
        if p and os.path.exists(p):
            return vgg16_from_npz(p), True
    return vgg16_random_init(jax.random.PRNGKey(16)), False


def _maxpool2x2(x: jnp.ndarray) -> jnp.ndarray:
    # window == stride routes to the repeat+equality custom VJP (no
    # select_and_scatter in the style-loss backward — ops/conv.py r4 note).
    from vsnca_tpu.ops.conv import max_pool_2d

    return max_pool_2d(x, 2, 2, 0)


def vgg16_features(
    params: List[dict],
    imgs: jnp.ndarray,
    layers: Sequence[int] = STYLE_LAYERS,
    include_image_as_feat: bool = False,
) -> List[jnp.ndarray]:
    """Run VGG16 up to max(layers) and collect taps.

    imgs: [B, H, W, 3] in [0, 1]; ImageNet-normalized internally
    (appearance_loss.py:219-236). Tap index semantics match torchvision
    Sequential: index 2k = conv k output, 2k+1 = after its ReLU, pools get
    their own indices. Returns NHWC feature maps.
    """
    n_pools_needed = sum(
        1
        for conv_i, (_, pool) in enumerate(VGG16_CONVS)
        if pool and VGG16_CONV_INDICES[conv_i] < max(layers)
    )
    assert min(imgs.shape[1:3]) >> n_pools_needed > 0, (
        f"input {imgs.shape[1:3]} too small for VGG tap {max(layers)} "
        f"({n_pools_needed} pools); would produce empty feature maps"
    )
    mean = jnp.asarray(IMAGENET_MEAN, imgs.dtype)
    std = jnp.asarray(IMAGENET_STD, imgs.dtype)
    x = (imgs - mean) / std

    feats: List[jnp.ndarray] = []
    if include_image_as_feat:
        feats.append(x)

    max_layer = max(layers)
    idx = 0  # torchvision Sequential index
    for conv_i, (c_out, pool_after) in enumerate(VGG16_CONVS):
        # conv
        x = conv2d(x, params[conv_i]["w"], params[conv_i]["b"], padding=1)
        if idx in layers:
            feats.append(x)
        if idx >= max_layer:
            return feats
        idx += 1
        # relu
        x = jax.nn.relu(x)
        if idx in layers:
            feats.append(x)
        if idx >= max_layer:
            return feats
        idx += 1
        if pool_after:
            x = _maxpool2x2(x)
            if idx in layers:
                feats.append(x)
            if idx >= max_layer:
                return feats
            idx += 1
    return feats


def vgg16_style_features(
    params: List[dict], imgs: jnp.ndarray, include_image_as_feat: bool = False
) -> List[jnp.ndarray]:
    return vgg16_features(params, imgs, STYLE_LAYERS, include_image_as_feat)


def vgg16_content_features(params: List[dict], imgs: jnp.ndarray) -> jnp.ndarray:
    return vgg16_features(params, imgs, (CONTENT_LAYER,))[0]
