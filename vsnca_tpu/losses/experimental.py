"""Experimental / historical losses.

``distill_style_loss`` corresponds to the reference's unreferenced
``StyleLoss`` (EncoderConditioning/utils/loss.py:17-64, SURVEY.md C15 —
dead code there): the distill.pub-style relaxed-OT objective evaluated in
log10 space. Reimplemented for inventory completeness; nothing in the
training presets uses it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vsnca_tpu.losses.appearance import _moment_loss, _remd


def distill_style_loss(
    vgg_params,
    generated: jnp.ndarray,
    target: jnp.ndarray,
    key: jax.Array,
    subsample: int = 1000,
) -> jnp.ndarray:
    """log10 of (REMD + moment matching) summed over style taps.

    generated/target: RGB in [0, 1].
    """
    from vsnca_tpu.models.vgg import vgg16_style_features

    gen_f = vgg16_style_features(vgg_params, generated)
    tgt_f = [jax.lax.stop_gradient(t) for t in vgg16_style_features(vgg_params, target)]

    loss = 0.0
    for g, t in zip(gen_f, tgt_f):
        b, h, w, c = g.shape
        gf = g.reshape(b, h * w, c)
        tf_ = t.reshape(b, h * w, c)
        if h * w > subsample:
            key, sub = jax.random.split(key)
            idx = jax.random.choice(sub, h * w, shape=(subsample,), replace=False)
            gf = jnp.take(gf, idx, axis=1)
            tf_ = jnp.take(tf_, idx, axis=1)

        def per_item(gx, tx):
            return _remd(tx, gx) + _moment_loss(tx, gx)

        loss = loss + jnp.mean(jax.vmap(per_item)(gf, tf_))
    return jnp.log10(loss + 1e-12)
