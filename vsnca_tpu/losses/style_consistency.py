"""Style-consistency loss (parity: ExtraChannels/utils/loss/
style_consistency_loss.py:15-37).

The reference computes this entirely under torch.no_grad(), so it
contributes NO gradient — it is effectively a monitoring metric for how
well a freshly seeded NCA reproduces the style after min_steps. We keep
that behavior (stop_gradient around the whole term) and document it
(SURVEY.md C13 'dead/experimental')."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.models.dynca import dynca_rollout, dynca_seed, make_conditioning


def style_consistency_loss(
    params: dict,
    nca_cfg: NCAConfig,
    style_target: jnp.ndarray,
    key: jax.Array,
    min_steps: int = 32,
    cond_img: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Grow a fresh seed for min_steps and MSE its RGB against the style
    target [B, H, W, 3] in [-1, 1]. Zero-gradient by construction."""
    b, h, w, _ = style_target.shape
    seed = dynca_seed(nca_cfg, b, (h, w), key=key)
    if nca_cfg.n_seed_channels < nca_cfg.c_in:
        extra = nca_cfg.c_in - nca_cfg.n_seed_channels
        if cond_img is not None:
            gray = jnp.mean(cond_img, axis=-1, keepdims=True)
            fill = jnp.tile(gray, (1, 1, 1, extra))
        else:
            fill = jnp.zeros((b, h, w, extra), seed.dtype)
        seed = jnp.concatenate([seed, fill], axis=-1)
    cond = make_conditioning(nca_cfg, (h, w), cond_img=cond_img, batch=b)
    _, rgb = dynca_rollout(
        params, seed, key, nca_cfg, min_steps, cond=cond, remat="none"
    )
    loss = jnp.mean((rgb - style_target) ** 2)
    return jax.lax.stop_gradient(loss)
