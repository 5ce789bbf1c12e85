"""VGG content loss: MSE on conv4_2 features
(ExtraChannels/utils/loss/content_loss.py:11-45)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def content_loss(vgg_params, generated: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """generated/target: RGB in [0, 1] (callers rescale from [-1, 1])."""
    from vsnca_tpu.models.vgg import vgg16_content_features

    gen_f = vgg16_content_features(vgg_params, generated)
    tgt_f = jax.lax.stop_gradient(vgg16_content_features(vgg_params, target))
    return jnp.mean((gen_f - tgt_f) ** 2)
