"""Spatially sharded NCA rollout: H-dimension sharding with 1-row halo
exchange (the NCA analogue of context parallelism, SURVEY.md §5.7).

Each device in the 'space' axis holds an H/n-row slab of the grid. Per step
it exchanges one boundary row with each neighbor via ``lax.ppermute`` (rides
ICI), pads W locally, and runs the same perception + MLP + stochastic-update
math as the single-device cell. Boundary semantics honor the configured
padding mode: 'circular' maps to the ppermute ring directly; 'replicate' and
'zeros' overwrite the outermost halos on the edge devices.

Restrictions: perception_scales == (0,) (multi-scale would need cross-shard
resampling) and conditioning precomputed/sharded by the caller.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.models.dynca import to_rgb
from vsnca_tpu.ops.filters import LAPLACIAN, SOBEL_X, SOBEL_Y


def _perceive_h_padded(xp: jnp.ndarray, pad_mode_w: str) -> jnp.ndarray:
    """Perception on an H-pre-padded slab.

    xp: [B, Hl+2, W, C] (one halo row on each side already in place).
    Pads W per the configured mode and evaluates the three fixed stencils;
    returns [B, Hl, W, 4C] in the reference block order.
    """
    mode = {"zeros": "constant", "replicate": "edge", "circular": "wrap"}[pad_mode_w]
    if mode == "constant":
        xpp = jnp.pad(xp, [(0, 0), (0, 0), (1, 1), (0, 0)], mode="constant")
    else:
        xpp = jnp.pad(xp, [(0, 0), (0, 0), (1, 1), (0, 0)], mode=mode)
    hl = xp.shape[1] - 2
    w = xp.shape[2]
    n = [[xpp[:, di : di + hl, dj : dj + w, :] for dj in range(3)] for di in range(3)]

    def apply(k):
        acc = None
        for di in range(3):
            for dj in range(3):
                kv = float(k[di][dj])
                if kv == 0.0:
                    continue
                term = n[di][dj] * kv if kv != 1.0 else n[di][dj]
                acc = term if acc is None else acc + term
        return acc

    x_center = xp[:, 1:-1]
    return jnp.concatenate(
        [x_center, apply(SOBEL_X), apply(SOBEL_Y), apply(LAPLACIAN)], axis=-1
    )


def spatial_rollout(
    params: dict,
    x: jnp.ndarray,
    key: jax.Array,
    cfg: NCAConfig,
    n_steps: int,
    mesh: Mesh,
    axis: str = "space",
    cond: Optional[jnp.ndarray] = None,
):
    """Roll the NCA n_steps with the grid's H dim sharded over ``axis``.

    x: [B, H, W, C] (H divisible by the axis size); cond: optional
    [B, H, W, c_cond]. Returns (state, rgb) with the same sharding.
    """
    assert tuple(cfg.perception_scales) == (0,), (
        "spatial sharding supports single-scale perception"
    )
    n = mesh.shape[axis]
    perm_up = [(i, (i + 1) % n) for i in range(n)]  # receive prev device's bottom row
    perm_down = [((i + 1) % n, i) for i in range(n)]  # receive next device's top row

    has_cond = cond is not None
    in_specs = (P(), P(None, axis), P(), P(None, axis)) if has_cond else (
        P(), P(None, axis), P()
    )
    out_specs = (P(None, axis), P(None, axis))

    def body(params, x_local, key, cond_local=None):
        idx = jax.lax.axis_index(axis)

        def one_step(x_local, sub):
            top_own = x_local[:, :1]
            bot_own = x_local[:, -1:]
            halo_top = jax.lax.ppermute(bot_own, axis, perm_up)
            halo_bot = jax.lax.ppermute(top_own, axis, perm_down)

            if cfg.padding_mode == "replicate":
                halo_top = jnp.where(idx == 0, top_own, halo_top)
                halo_bot = jnp.where(idx == n - 1, bot_own, halo_bot)
            elif cfg.padding_mode == "zeros":
                halo_top = jnp.where(idx == 0, jnp.zeros_like(halo_top), halo_top)
                halo_bot = jnp.where(
                    idx == n - 1, jnp.zeros_like(halo_bot), halo_bot
                )
            # 'circular': the ring permutation IS the wrap pad.

            xp = jnp.concatenate([halo_top, x_local, halo_bot], axis=1)
            y = _perceive_h_padded(xp, cfg.padding_mode)
            if cond_local is not None:
                y = jnp.concatenate([y, cond_local], axis=-1)
            h = jax.nn.relu(
                jnp.einsum("bhwf,fd->bhwd", y, params["w1"]) + params["b1"]
            )
            dx = jnp.einsum("bhwd,dc->bhwc", h, params["w2"]) + params["b2"]
            b, hh, ww, _ = x_local.shape
            # fold in the shard index so mask rows differ across devices
            sub = jax.random.fold_in(sub, idx)
            mask = jnp.floor(
                jax.random.uniform(sub, (b, hh, ww, 1), x_local.dtype)
                + cfg.update_rate
            )
            return x_local + dx * mask

        def scan_body(carry, _):
            x_local, key = carry
            key, sub = jax.random.split(key)
            return (one_step(x_local, sub), key), None

        (x_local, _), _ = jax.lax.scan(
            scan_body, (x_local, key), None, length=n_steps
        )
        return x_local, to_rgb(x_local, cfg.c_out)

    fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    if has_cond:
        return fn(params, x, key, cond)
    return fn(params, x, key)
