"""Goal-guided ConditionedNCA (EncoderConditioning variant).

Parity target: EncoderConditioning/nca.py:29-215. State layout (NHWC):
channels = [target RGB | alive | hidden...] with ``alive_channel`` =
num_target_channels by default; 20 channels total for the 3+16+1 default.

TPU-first choices: the learnable depthwise 3x3 perception is expressed as a
9-tap stencil einsum (keeps channel-major [c*3+k] output ordering compatible
with torch grouped-conv checkpoints); the UpdateNet 1x1 convs are MXU
einsums; ``grow`` is a remat'd lax.scan.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from vsnca_tpu.config import ConditionedNCAConfig
from vsnca_tpu.models.encoder import image_encoder_apply, image_encoder_init
from vsnca_tpu.ops.conv import max_pool_2d, torch_conv_init
from vsnca_tpu.ops.padding import pad2d


def conditioned_nca_init(key: jax.Array, cfg: ConditionedNCAConfig, dtype=jnp.float32) -> dict:
    c = cfg.num_channels
    d = cfg.update_hidden_dim
    kp, k1, k2, k3, ke = jax.random.split(key, 5)
    # Depthwise perception: one 3x3 kernel per (channel, filter-slot) pair,
    # stored [C, 3, 3, 3] = [channel, slot, kh, kw]; torch fan_in = 9.
    bound = 1.0 / math.sqrt(9)
    perception_w = jax.random.uniform(kp, (c, 3, 3, 3), dtype, -bound, bound)
    return {
        "perception_w": perception_w,
        "update1": torch_conv_init(k1, 1, 1, c * 3, d, zero_bias=True, dtype=dtype),
        "update2": torch_conv_init(k2, 1, 1, d, d, zero_bias=True, dtype=dtype),
        "update3": torch_conv_init(k3, 1, 1, d, c, bias=False, dtype=dtype),
        "encoder": image_encoder_init(
            ke, cfg.num_hidden_channels, cfg.num_target_channels, dtype
        ),
    }


def _depthwise_perceive(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Learnable depthwise 3x3 (groups = C, 3 filters per channel, zero pad).

    x: [B,H,W,C], w: [C, 3(slots), 3, 3] → [B,H,W,C*3] ordered channel-major
    (out[..., c*3 + s]) to match torch grouped-conv channel ordering
    (nca.py:99-107).
    """
    b, h, wdt, c = x.shape
    p = pad2d(x, 1, "zeros")
    # Stack the 9 neighborhood taps: [B,H,W,C,9]
    taps = jnp.stack(
        [p[:, di : di + h, dj : dj + wdt, :] for di in range(3) for dj in range(3)],
        axis=-1,
    )
    wk = w.reshape(c, 3, 9)  # [C, slot, tap]
    out = jnp.einsum("bhwct,cst->bhwcs", taps, wk)
    return out.reshape(b, h, wdt, c * 3)


def alive_mask(x: jnp.ndarray, cfg: ConditionedNCAConfig) -> jnp.ndarray:
    """maxpool3x3(alpha) > threshold, [B,H,W,1] bool (nca.py:152-163)."""
    if not cfg.use_living_channel:
        return jnp.ones(x.shape[:3] + (1,), dtype=bool)
    a = x[..., cfg.alive_channel : cfg.alive_channel + 1]
    return max_pool_2d(a, 3, 1, 1) > cfg.alpha_living_threshold


def encode_goal(params: dict, cfg: ConditionedNCAConfig, goal_img: jnp.ndarray) -> jnp.ndarray:
    """Goal image [B,H,W,3] → padded goal encoding [B,H,W,num_channels].

    The encoder's embedding occupies the LAST num_hidden_channels channels;
    the leading channels are zero (F.pad with front channel padding,
    nca.py:199-203).
    """
    emb = image_encoder_apply(params["encoder"], goal_img)
    padf = cfg.num_channels - cfg.num_hidden_channels
    pads = [(0, 0), (0, 0), (0, 0), (padf, 0)]
    return jnp.pad(emb, pads)


def conditioned_nca_step(
    params: dict,
    x: jnp.ndarray,
    goal_encoding: jnp.ndarray,
    key: jax.Array,
    cfg: ConditionedNCAConfig,
) -> jnp.ndarray:
    """One ConditionedNCA step (nca.py:176-195).

    alive gate → perceive(x + goal*pre_mask) → UpdateNet → stochastic
    residual → life-mask gate → clamp.
    """
    pre = alive_mask(x, cfg)
    pre_f = pre.astype(x.dtype)

    percept = _depthwise_perceive(x + goal_encoding * pre_f, params["perception_w"])
    h = jax.nn.relu(
        jnp.einsum("bhwf,fd->bhwd", percept, params["update1"]["w"][0, 0])
        + params["update1"]["b"]
    )
    h = jax.nn.relu(
        jnp.einsum("bhwd,de->bhwe", h, params["update2"]["w"][0, 0])
        + params["update2"]["b"]
    )
    out = jnp.einsum("bhwd,dc->bhwc", h, params["update3"]["w"][0, 0])

    b, hh, ww, _ = x.shape
    rand_mask = (
        jax.random.uniform(key, (b, hh, ww, 1), dtype=x.dtype) < cfg.cell_fire_rate
    ).astype(x.dtype)
    x = x + rand_mask * out

    post = alive_mask(x, cfg)
    life = (pre & post).astype(x.dtype)
    x = x * life
    return jnp.clip(x, -cfg.clamp_value, cfg.clamp_value)


def conditioned_nca_seed(
    cfg: ConditionedNCAConfig, n: int, size: Optional[int] = None, dtype=jnp.float32
) -> jnp.ndarray:
    """Zero state with channels alive_channel.. set to 1 at the center pixel
    (nca.py:130-150)."""
    s = size or cfg.image_size
    seed = jnp.zeros((n, s, s, cfg.num_channels), dtype)
    return seed.at[:, s // 2, s // 2, cfg.alive_channel :].set(1.0)


@partial(jax.jit, static_argnames=("cfg", "num_steps", "remat"))
def conditioned_nca_grow(
    params: dict,
    x: jnp.ndarray,
    goal_img: jnp.ndarray,
    key: jax.Array,
    cfg: ConditionedNCAConfig,
    num_steps: int,
    remat: str = "per_step",
) -> jnp.ndarray:
    """Encode the goal once, then scan num_steps NCA steps (nca.py:197-209)."""
    goal_encoding = encode_goal(params, cfg, goal_img)

    def step_fn(x, sub):
        return conditioned_nca_step(params, x, goal_encoding, sub, cfg)

    if remat == "per_step":
        step_fn = jax.checkpoint(step_fn)

    def body(carry, _):
        x, key = carry
        key, sub = jax.random.split(key)
        return (step_fn(x, sub), key), None

    (x, _), _ = jax.lax.scan(body, (x, key), None, length=num_steps)
    return x
