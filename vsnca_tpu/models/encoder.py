"""ImageEncoder: per-pixel goal embedding for the encoder-conditioned NCA.

Parity target: EncoderConditioning/encoder.py:5-64. Fixed front-end
(Sobel-x/y + Laplacian on the grayscale image, 5x5 sigma-1 Gaussian blur per
input channel) followed by two learnable 3x3 convs producing an
``embedding_dim``-channel per-pixel goal code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vsnca_tpu.ops.conv import conv2d, torch_conv_init
from vsnca_tpu.ops.filters import gaussian_kernel_2d
from vsnca_tpu.ops.perception import edge_extract


def image_encoder_init(
    key: jax.Array, embedding_dim: int = 16, channels: int = 3, dtype=jnp.float32
) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "embed1": torch_conv_init(k1, 3, 3, channels + 3, embedding_dim, dtype=dtype),
        "embed2": torch_conv_init(
            k2, 3, 3, embedding_dim, embedding_dim, bias=False, dtype=dtype
        ),
    }


def image_encoder_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W, channels] → [B, H, W, embedding_dim].

    Concat order matches encoder.py:51: (sobel_x, sobel_y, laplacian,
    blurred channels); all fixed filters use zero padding.
    """
    channels = x.shape[-1]
    gray = jnp.mean(x, axis=-1, keepdims=True)
    edges = edge_extract(gray, transform="none")  # [B,H,W,3] sx, sy, lap

    gk = jnp.asarray(gaussian_kernel_2d(5, 1.0), x.dtype)
    # Per-channel (depthwise) blur: HWIO kernel [5,5,1,C] with C groups.
    blur_w = jnp.tile(gk[:, :, None, None], (1, 1, 1, channels))
    blurred = conv2d(x, blur_w, padding=2, feature_group_count=channels)

    feats = jnp.concatenate([edges, blurred], axis=-1)
    h = jax.nn.relu(conv2d(feats, params["embed1"]["w"], params["embed1"]["b"], padding=1))
    return conv2d(h, params["embed2"]["w"], padding=1)
