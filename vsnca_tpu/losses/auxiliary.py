"""Auxiliary (content-conditioning) loss: match generated frames to the
content/reference image with a selectable metric
(ExtraChannels/utils/loss/auxillary_loss.py:11-95)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def auxiliary_loss(
    vgg_params,
    generated: jnp.ndarray,
    aux_target: jnp.ndarray,
    loss_type: str = "VGG",
    key: Optional[jax.Array] = None,
    subsample: int = 1000,
    proj_n: int = 32,
) -> jnp.ndarray:
    """generated/aux_target: RGB in [-1, 1].

    Metrics: 'MSE' (raw pixels after [0,1] rescale), 'VGG' (content loss),
    'OT' / 'SlW' / 'Gram' (style metrics vs the content image).
    """
    from vsnca_tpu.losses.appearance import appearance_loss
    from vsnca_tpu.losses.content import content_loss
    from vsnca_tpu.ops.resize import resize_bilinear

    if loss_type in ("OT", "SlW", "Gram"):
        return appearance_loss(
            vgg_params, generated, aux_target, loss_type, key, subsample, proj_n
        )

    gen = (generated + 1.0) / 2.0
    tgt = (aux_target + 1.0) / 2.0
    if gen.shape[1:3] != tgt.shape[1:3]:
        tgt = resize_bilinear(tgt, gen.shape[1:3])

    if loss_type == "MSE":
        return jnp.mean((gen - jax.lax.stop_gradient(tgt)) ** 2)
    if loss_type == "VGG":
        return content_loss(vgg_params, gen, tgt)
    raise ValueError(f"unknown auxiliary loss type {loss_type}")
