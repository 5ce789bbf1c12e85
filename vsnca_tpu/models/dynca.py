"""DyNCA cell as pure functions over a params pytree.

The cell (perception → 1x1-conv MLP → stochastic residual update) follows
ConditioneDyNCA/models/dynca.py:30-178 / ExtraChannels/models/dynca.py:30-167,
re-expressed TPU-first:

- NHWC layout; the two 1x1 convolutions are einsum contractions that XLA
  tiles onto the MXU over all B*H*W pixels at once.
- Perception is the shared 9-point VPU stencil (vsnca_tpu.ops.perception).
- Randomness is an explicit PRNG key; rollouts thread keys through
  ``lax.scan`` with optional per-step rematerialization so BPTT memory is
  O(1) in rollout length (SURVEY.md §5.7).
- Conditioning (positional encoding / edge map) is precomputed once per
  rollout: the reference recomputes EdgeExtractor(cond_img) under no_grad at
  every step (dynca.py:117-127) but cond_img is constant across the rollout,
  so hoisting is semantics-preserving and removes 3 stencils/step.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.ops.cpe import cartesian_positional_encoding
from vsnca_tpu.ops.perception import edge_extract, perceive_multiscale


def _xavier_normal(key, shape, gain: float, dtype):
    fan_in, fan_out = shape[0], shape[1]
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def dynca_init(key: jax.Array, cfg: NCAConfig) -> dict:
    """Initialize DyNCA parameters.

    Matches reference init (dynca.py:60-65): w1 Xavier-normal gain 0.2 with
    torch-default uniform bias, w2 Xavier-normal gain 0.1 with zero bias.
    Weights are stored as [in, out] matrices (1x1 convs == dense over pixels).
    """
    dtype = jnp.dtype(cfg.dtype)
    k1, k2, kb = jax.random.split(key, 3)
    p = cfg.perception_dim
    bound = 1.0 / math.sqrt(p)
    return {
        "w1": _xavier_normal(k1, (p, cfg.fc_dim), 0.2, dtype),
        "b1": jax.random.uniform(kb, (cfg.fc_dim,), dtype, -bound, bound),
        "w2": _xavier_normal(k2, (cfg.fc_dim, cfg.c_in), 0.1, dtype),
        "b2": jnp.zeros((cfg.c_in,), dtype),
    }


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def make_conditioning(
    cfg: NCAConfig,
    shape_hw: Tuple[int, int],
    cond_img: Optional[jnp.ndarray] = None,
    batch: int = 1,
) -> Optional[jnp.ndarray]:
    """Precompute the per-rollout conditioning tensor [B, H, W, c_cond].

    - 'pos_emb': CPE2D grid (dynca.py:216-253), broadcast over batch.
    - 'edges': EdgeExtractor(cond_img) where cond_img is grayscale
      [B, H, W, 1] (dynca.py:182-213). Gradients are stopped, matching the
      reference's no_grad (dynca.py:123-124).
    - None: no conditioning.
    """
    if cfg.conditioning == "pos_emb":
        cpe = cartesian_positional_encoding(*shape_hw, dtype=jnp.dtype(cfg.dtype))
        return jnp.broadcast_to(cpe[None], (batch,) + cpe.shape)
    if cfg.conditioning == "edges":
        assert cond_img is not None, "edges conditioning requires cond_img"
        return jax.lax.stop_gradient(edge_extract(cond_img, cfg.edge_transform))
    return None


def dynca_step(
    params: dict,
    x: jnp.ndarray,
    key: jax.Array,
    cfg: NCAConfig,
    cond: Optional[jnp.ndarray] = None,
    update_rate: Optional[float] = None,
) -> jnp.ndarray:
    """One NCA step: x [B,H,W,C] → x' [B,H,W,C].

    perception → concat(cond) → w2(relu(w1(·))) → Bernoulli-masked residual
    (dynca.py:117-133). The mask is floor(U(0,1) + rate), shared across
    channels per cell.
    """
    rate = cfg.update_rate if update_rate is None else update_rate
    y = perceive_multiscale(x, cfg.perception_scales, cfg.padding_mode)
    if cond is not None:
        y = jnp.concatenate([y, cond], axis=-1)
    h = jax.nn.relu(
        jnp.einsum("bhwf,fd->bhwd", y, params["w1"], preferred_element_type=x.dtype)
        + params["b1"]
    )
    dx = (
        jnp.einsum("bhwd,dc->bhwc", h, params["w2"], preferred_element_type=x.dtype)
        + params["b2"]
    )
    b, hh, ww, _ = x.shape
    mask = jnp.floor(
        jax.random.uniform(key, (b, hh, ww, 1), dtype=x.dtype) + rate
    )
    return x + dx * mask


def to_rgb(x: jnp.ndarray, c_out: int = 3) -> jnp.ndarray:
    """RGB readout: first c_out channels times 2 (dynca.py:140-141)."""
    return x[..., :c_out] * 2.0


def dynca_seed(
    cfg: NCAConfig, n: int, size, key: Optional[jax.Array] = None
) -> jnp.ndarray:
    """Seed states [n, H, W, seed_channels] (dynca.py:143-166).

    'random' draws one uniform(-0.5, 0.5) state and repeats it across the
    batch, as the reference does (dynca.py:160-164).
    """
    if isinstance(size, int):
        size = (size, size)
    h, w = size
    c = cfg.n_seed_channels
    dtype = jnp.dtype(cfg.dtype)
    if cfg.seed_mode == "zeros":
        return jnp.zeros((n, h, w, c), dtype)
    if cfg.seed_mode == "center_on":
        sd = jnp.zeros((n, h, w, c), dtype)
        return sd.at[:, h // 2, w // 2, :].set(1.0)
    if cfg.seed_mode == "random":
        assert key is not None, "random seed mode requires a PRNG key"
        one = jax.random.uniform(key, (1, h, w, c), dtype) - 0.5
        return jnp.broadcast_to(one, (n, h, w, c))
    raise ValueError(f"unknown seed_mode {cfg.seed_mode}")


def _scan_rollout(step_fn, x, key, n_steps, remat):
    """Scan ``n_steps`` of ``x = step_fn(x, sub)`` with a rematerialization
    policy for BPTT:

    - 'per_step': every step checkpointed — O(1) extra activation memory,
      backward recomputes each step once (SURVEY.md §5.7).
    - 'segment:K': blocks of K steps checkpointed — the backward recomputes
      a block then differentiates it with its intermediates held (O(K)
      activation memory), which lets XLA fuse across the block.
    - 'none': the whole rollout's activations are stored.
    """
    if remat == "per_step":
        step_fn = jax.checkpoint(step_fn)

    block_len = 1
    if remat.startswith("segment:"):
        block_len = int(remat.split(":", 1)[1])
        if n_steps % block_len != 0:
            # Values are identical under any policy (same PRNG stream);
            # fall back to per-step checkpointing for awkward lengths.
            block_len = 1
            step_fn = jax.checkpoint(step_fn)

    def body(carry, _):
        x, key = carry
        key, sub = jax.random.split(key)
        x = step_fn(x, sub)
        return (x, key), None

    if block_len > 1:

        @jax.checkpoint
        def block(x, key):
            (x, key), _ = jax.lax.scan(body, (x, key), None, length=block_len)
            return x, key

        def outer(carry, _):
            return block(*carry), None

        (x, key), _ = jax.lax.scan(
            outer, (x, key), None, length=n_steps // block_len
        )
        return x, key

    (x, key), _ = jax.lax.scan(body, (x, key), None, length=n_steps)
    return x, key


@partial(jax.jit, static_argnames=("cfg", "n_steps", "remat", "update_rate"))
def dynca_rollout(
    params: dict,
    x: jnp.ndarray,
    key: jax.Array,
    cfg: NCAConfig,
    n_steps: int,
    cond: Optional[jnp.ndarray] = None,
    remat: str = "per_step",
    update_rate: Optional[float] = None,
):
    """Roll the NCA n_steps (static) and return (state, rgb).

    Equivalent to ``forward_nsteps`` (dynca.py:168-178) with scan + remat
    instead of a Python loop.
    """

    def step_fn(x, sub):
        return dynca_step(params, x, sub, cfg, cond, update_rate)

    x, _ = _scan_rollout(step_fn, x, key, n_steps, remat)
    return x, to_rgb(x, cfg.c_out)


@partial(
    jax.jit, static_argnames=("cfg", "n_segments", "steps_per_segment", "remat")
)
def dynca_rollout_with_taps(
    params: dict,
    x: jnp.ndarray,
    key: jax.Array,
    cfg: NCAConfig,
    n_segments: int,
    steps_per_segment: int,
    cond: Optional[jnp.ndarray] = None,
    remat: str = "per_step",
):
    """Rollout emitting an RGB frame every ``steps_per_segment`` steps.

    Replaces the reference's return_middle_feature + [::64] slicing
    (fit_video_motion.py:230-235) with a two-level scan: the outer scan emits
    one frame per segment, so only n_segments frames are materialized.
    Returns (state, rgb_frames [n_segments, B, H, W, c_out]).
    """

    def step_fn(x, sub):
        return dynca_step(params, x, sub, cfg, cond)

    def segment(carry, _):
        x, key = carry
        x, key = _scan_rollout(step_fn, x, key, steps_per_segment, remat)
        return (x, key), to_rgb(x, cfg.c_out)

    (x, _), frames = jax.lax.scan(segment, (x, key), None, length=n_segments)
    return x, frames


def tap_schedule(step_n: int, tap_every: int = 64):
    """Reference-faithful frame-tap schedule for a ``step_n``-step rollout.

    ``fit_video_motion.py:230-235`` taps ``middle_feature_list[::interval]``
    where entry k is the RGB AFTER step k+1 — frames land after steps
    1, 1+interval, 1+2*interval, ... <= step_n, and the rollout continues to
    ``step_n`` after the last tap. Returns ``(frame_chunks, tail_steps)``:
    ``frame_chunks[i]`` steps are rolled then a frame is emitted, then
    ``tail_steps`` more are rolled with no frame. For the default range
    [80, 144) this is 2-3 frames over step_n total steps — NOT
    ``n_frames * tap_every`` steps (the r2 trainer shape over-rolled).
    """
    assert step_n >= 1 and tap_every >= 1
    frame_steps = list(range(1, step_n + 1, tap_every))
    chunks = [frame_steps[0]] + [
        frame_steps[i] - frame_steps[i - 1] for i in range(1, len(frame_steps))
    ]
    return tuple(chunks), step_n - frame_steps[-1]


@partial(
    jax.jit, static_argnames=("cfg", "frame_chunks", "tail_steps", "remat")
)
def dynca_rollout_schedule(
    params: dict,
    x: jnp.ndarray,
    key: jax.Array,
    cfg: NCAConfig,
    frame_chunks,
    tail_steps: int = 0,
    cond: Optional[jnp.ndarray] = None,
    remat: str = "per_step",
):
    """Rollout with an explicit tap schedule (see ``tap_schedule``): roll
    ``frame_chunks[i]`` steps and emit an RGB frame after each chunk, then
    roll ``tail_steps`` more (no frame). Returns (state, [frames]).

    Mirrors the reference's ``return_middle_feature=True`` +
    ``[::interval]`` slicing (fit_video_motion.py:230-235) without
    materializing all ``step_n`` intermediate frames.
    """

    def step_fn(x, sub):
        return dynca_step(params, x, sub, cfg, cond)

    frames = []
    for c in frame_chunks:
        x, key = _scan_rollout(step_fn, x, key, int(c), remat)
        frames.append(to_rgb(x, cfg.c_out))
    if tail_steps:
        x, key = _scan_rollout(step_fn, x, key, int(tail_steps), remat)
    return x, frames
