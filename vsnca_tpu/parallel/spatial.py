"""Spatially sharded NCA rollout: H-dimension sharding with 1-row halo
exchange (the NCA analogue of context parallelism, SURVEY.md §5.7).

Each device in the 'space' axis holds an H/n-row slab of the grid. Per step
it exchanges one boundary row with each neighbor via ``lax.ppermute`` (rides
ICI), pads W locally, and runs the same perception + MLP + stochastic-update
math as the single-device cell. Boundary semantics honor the configured
padding mode: 'circular' maps to the ppermute ring directly; 'replicate' and
'zeros' overwrite the outermost halos on the edge devices.

Multi-scale (perception_scales == (0, 1), the video-motion percept,
ExtraChannels/models/dynca.py:98-111) shards too, for CIRCULAR padding:
each device exchanges a 6-row halo (the multiscale stencil's full-res
reach, same bound as the tiled train kernel's _MS_HALO) and evaluates the
dense ``perceive_multiscale`` on the haloed slab as if it were a whole
grid — the slab-local padding artifacts live within the halo and the
center crop is exact. The 2x2 downsample cells stay aligned to GLOBAL
even rows because both the slab height and the halo are even. Replicate/
zeros with multi-scale stay unsupported (they would need half-resolution
edge semantics on the edge devices); the production multi-scale preset
(video_motion) is circular. Conditioning is precomputed/sharded by the
caller.
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


def _up2x_global_clamp(ps, q0, half_h_global):
    """Factor-2 bilinear upsample (align_corners=False: the 0.75/0.25
    two-tap chain) of a half-res slab, with the H edge clamp applied at
    the GLOBAL grid boundary rather than the slab boundary.

    The dense ``resize_bilinear`` clamps its sampling at the grid edge
    even under circular padding (torch F.interpolate semantics, which the
    reference inherits — ConditioneDyNCA/models/dynca.py:98-111). A
    sharded slab must reproduce that clamp exactly at global half rows 0
    and H/2-1 while using real wrapped neighbors everywhere else.

    ps: [B, m, w2, C] half-res slab whose row s is global half row
    ``q0 + s`` (q0 may be negative / beyond H/2 for the wrap halos —
    those output rows land in the cropped halo). W is unsharded, so its
    clamp is local == global.
    """
    b, m, w2, c = ps.shape
    q = q0 + jnp.arange(m)
    prev = jnp.concatenate([ps[:, :1], ps[:, :-1]], axis=1)
    nxt = jnp.concatenate([ps[:, 1:], ps[:, -1:]], axis=1)
    at_g0 = (q == 0)[None, :, None, None]
    at_gn = (q == half_h_global - 1)[None, :, None, None]
    prev = jnp.where(at_g0, ps, prev)
    nxt = jnp.where(at_gn, ps, nxt)
    even = 0.25 * prev + 0.75 * ps
    odd = 0.75 * ps + 0.25 * nxt
    yh = jnp.stack([even, odd], axis=2).reshape(b, 2 * m, w2, c)
    prevw = jnp.concatenate([yh[:, :, :1], yh[:, :, :-1]], axis=2)
    nxtw = jnp.concatenate([yh[:, :, 1:], yh[:, :, -1:]], axis=2)
    evenw = 0.25 * prevw + 0.75 * yh
    oddw = 0.75 * yh + 0.25 * nxtw
    return jnp.stack([evenw, oddw], axis=3).reshape(b, 2 * m, 2 * w2, c)


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
    scales = tuple(cfg.perception_scales)
    assert scales in ((0,), (0, 1)), (
        "spatial sharding supports perception_scales (0,) or (0, 1)"
    )
    ms = scales == (0, 1)
    if ms:
        assert cfg.padding_mode == "circular", (
            "multi-scale spatial sharding requires circular padding "
            "(replicate/zeros would need half-res edge semantics)"
        )
    n = mesh.shape[axis]
    # halo rows per side: 1 for the 3x3 stencil; 6 for the multiscale
    # stencil's full-res reach (even, so the 2x2 downsample cells of the
    # haloed slab stay aligned to global even rows).
    hb = 6 if ms else 1
    hl = x.shape[1] // n
    assert x.shape[1] % n == 0, "H must divide the space axis"
    if ms:
        assert hl % 2 == 0, "multi-scale sharding needs an even local slab"
        assert hl >= hb, (
            f"local slab ({hl} rows) must cover the {hb}-row halo"
        )
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
            top_own = x_local[:, :hb]
            bot_own = x_local[:, -hb:]
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
            if ms:
                # Multiscale percept on the haloed slab: scale 0 and the
                # half-res stencil read real (exchanged) neighbor rows —
                # their slab-local wrap pollution stays inside the halo —
                # while the 2x upsample applies the global-boundary clamp
                # explicitly (the halo contains the true wrap rows, but
                # the dense resize clamps at the grid edge; see
                # _up2x_global_clamp).
                from vsnca_tpu.ops.perception import perceive
                from vsnca_tpu.ops.resize import resize_bilinear

                hs = xp.shape[1]
                w = xp.shape[2]
                # _perceive_h_padded consumes a 1-row halo: its row 0 is
                # xp row 1, so the center crop starts at hb - 1.
                y0 = _perceive_h_padded(xp, "circular")[
                    :, hb - 1 : hb - 1 + x_local.shape[1]
                ]
                x_half = resize_bilinear(xp, (hs // 2, w // 2))
                ps = perceive(x_half, "circular")
                q0 = idx * (hl // 2) - hb // 2
                up = _up2x_global_clamp(ps, q0, (hl * n) // 2)
                y = 0.5 * (y0 + up[:, hb:-hb])
            else:
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
