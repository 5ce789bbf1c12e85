"""Overflow regularizer: mean |state − clamp(state, −1, 1)|
(ExtraChannels/utils/loss/loss.py:33-36)."""

import jax.numpy as jnp


def overflow_loss(nca_state: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(nca_state - jnp.clip(nca_state, -1.0, 1.0)))
