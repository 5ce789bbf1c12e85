"""Export validator: execute an exported WebGL JSON model in Python and
compare against the float model.

The browser runtime (docs/dynca.js) dequantizes the weight atlas and runs
perception → dense x2 → stochastic update; this simulator replays that
pipeline with the SAME dequantized weights through our step math, bounding
the quantization error a deployed model will exhibit. (The uint8 path
mirrors the texture precision actually uploaded to the GPU.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.export.webgl import load_webgl_model


def params_from_webgl(path: str, cfg: NCAConfig, quantize_uint8: bool = False) -> dict:
    """Rebuild a params pytree from an exported JSON (model 0).

    ``quantize_uint8`` additionally rounds the normalized atlas through
    uint8 first, reproducing the texture precision of the browser upload.
    """
    mats = load_webgl_model(path)
    if quantize_uint8:
        import json

        with open(path) as f:
            js = json.load(f)
        mats = []
        for layer in js["layers"]:
            data = np.asarray(layer["data_flatten"], np.float32).reshape(
                layer["data_shape"]
            )
            q = np.round(data * 255.0).clip(0, 255) / 255.0
            denorm = q * layer["scale"] - layer["center"] * layer["scale"]
            rows, cols = layer["shape"]
            quads = (cols + 3) // 4
            mats.append(denorm[:rows, :quads, :].reshape(rows, -1)[:, :cols])

    l1, l2 = mats
    return {
        "w1": jnp.asarray(l1[:-1]),
        "b1": jnp.asarray(l1[-1]),
        "w2": jnp.asarray(l2[:-1]),
        "b2": jnp.asarray(l2[-1]),
    }


def validate_export(
    path: str,
    params: dict,
    cfg: NCAConfig,
    size: int = 64,
    n_steps: int = 24,
    key: Optional[jax.Array] = None,
    quantize_uint8: bool = True,
):
    """Roll both the float model and the dequantized export with identical
    RNG; returns dict of divergence metrics."""
    from vsnca_tpu.models.dynca import dynca_rollout, dynca_seed, make_conditioning

    key = key if key is not None else jax.random.PRNGKey(0)
    re_params = params_from_webgl(path, cfg, quantize_uint8=quantize_uint8)

    seed = dynca_seed(cfg, 1, size, key=key)
    if cfg.n_seed_channels < cfg.c_in:
        seed = jnp.concatenate(
            [seed, jnp.zeros(seed.shape[:3] + (cfg.c_in - cfg.n_seed_channels,))],
            axis=-1,
        )
    cond_img = (
        jnp.zeros((1, size, size, 1)) if cfg.conditioning == "edges" else None
    )
    cond = make_conditioning(cfg, (size, size), cond_img=cond_img, batch=1)

    s_ref, rgb_ref = dynca_rollout(params, seed, key, cfg, n_steps, cond=cond)
    s_exp, rgb_exp = dynca_rollout(re_params, seed, key, cfg, n_steps, cond=cond)

    return {
        "state_max_abs_diff": float(jnp.abs(s_ref - s_exp).max()),
        "rgb_mean_abs_diff": float(jnp.abs(rgb_ref - rgb_exp).mean()),
        "weight_max_abs_diff": max(
            float(jnp.abs(params[k] - re_params[k]).max())
            for k in ("w1", "b1", "w2", "b2")
        ),
    }
