"""Video-motion (motion-texture) loss on MSOE features of frame pairs.

Parity target: ExtraChannels/utils/loss/video_motion_loss.py:12-261. For each
consecutive generated-frame pair and the matching target-video pair, extract
the 320-channel MSOE motion feature and match statistics with MotionOT /
MotionSlW / MotionGram (MotionGram normalizes by C*H*W, unlike the
appearance Gram's H*W).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def motion_feature(
    msoe_params, image1: jnp.ndarray, image2: jnp.ndarray, size=(128, 128)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two RGB frames in [-1, 1] → (320-ch motion feature NHWC, flow)
    (video_motion_loss.py:63-81)."""
    from vsnca_tpu.models.msoe import motion_pair_from_rgb, msoe_forward

    pair = motion_pair_from_rgb(image1, image2, size)
    flow, feats = msoe_forward(msoe_params, pair, return_features=True)
    return feats[0], flow


def _motion_gram(f: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = f.shape
    x = f.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", x, x, preferred_element_type=jnp.float32) / (
        c * h * w
    )


def precompute_target_motion_features(
    msoe_params, target_video: jnp.ndarray, motion_img_size=(128, 128),
    hbm_budget_bytes: int = 4 * 2**30,
):
    """MSOE motion features of EVERY consecutive target-frame pair, computed
    once per video (the targets are constant across training iterations; the
    reference re-extracts them under no_grad every iteration —
    video_motion_loss.py:95-99; precomputing is gradient-identical).

    target_video: [T, H, W, 3] RGB in [-1, 1]. Returns [T-1, h', w', 320];
    slice the training window's pairs and pass (broadcast over batch) as
    ``video_motion_loss``'s ``target_features``.

    Returns None when the stacked features would exceed
    ``hbm_budget_bytes`` (~84 MB per pair at 256px — a long video would OOM
    HBM at startup; callers then recompute target features per window). The
    per-pair size is measured from the first pair's actual feature shape,
    not hard-coded."""
    n_pairs = int(target_video.shape[0]) - 1
    if n_pairs < 1:
        raise ValueError(
            "precompute_target_motion_features needs >= 2 target frames "
            f"(got {target_video.shape[0]}); motion features are per "
            "consecutive pair"
        )
    first, _ = motion_feature(
        msoe_params, target_video[0:1], target_video[1:2], motion_img_size
    )
    pair_bytes = int(np.prod(first.shape[-3:])) * first.dtype.itemsize
    if n_pairs * pair_bytes > hbm_budget_bytes:
        return None
    feats = [jax.lax.stop_gradient(first[0])]
    for t in range(1, n_pairs):
        f, _ = motion_feature(
            msoe_params,
            target_video[t : t + 1],
            target_video[t + 1 : t + 2],
            motion_img_size,
        )
        feats.append(jax.lax.stop_gradient(f[0]))
    return jnp.stack(feats)


def video_motion_loss(
    msoe_params,
    generated_frames: Sequence[jnp.ndarray],
    target_frames: Sequence[jnp.ndarray],
    loss_type: str = "MotionOT",
    key: Optional[jax.Array] = None,
    motion_img_size=(128, 128),
    subsample: int = 1000,
    proj_n: int = 32,
    target_features=None,
):
    """Sum over consecutive frame-pair indices of the selected motion metric
    (video_motion_loss.py:84-111). Target features are gradient-stopped.

    Deliberate deviation: the reference's forward ``return``s inside its
    pair loop (video_motion_loss.py:117-131), so it only ever scores the
    FIRST pair; we score every consecutive pair. Per-pair math is
    value-parity-tested against a torch mirror (tests/test_losses.py).

    generated_frames / target_frames: lists of RGB [-1, 1] batches, length
    >= 2. Returns (loss, (last_gen_flow, last_target_flow)).

    ``target_features``: optional per-pair precomputed target MSOE features
    (sequence of [B, h', w', 320] or broadcastable [h', w', 320] entries,
    length len(frames)-1, from ``precompute_target_motion_features``) —
    skips the target-side MSOE forwards; target flow summaries are then
    unavailable (None).
    """
    from vsnca_tpu.losses.appearance import (
        _flatten,
        _moment_loss,
        _remd,
        _project_sort,
    )
    from vsnca_tpu.ops.resize import resize_nearest_1d

    assert len(generated_frames) >= 2
    if target_features is None and target_frames is None:
        raise ValueError(
            "video_motion_loss needs target motion supervision: pass either "
            "target_frames (raw RGB target window, MSOE runs on pairs) or "
            "target_features (precomputed per-pair MSOE features)"
        )

    from vsnca_tpu.models.msoe import motion_pairs_from_frames, msoe_forward

    n_pairs = len(generated_frames) - 1

    # All generated pairs ride ONE MSOE forward (pairs stacked on the batch
    # axis): per-item math is unchanged (contrast_norm and every conv are
    # batch-parallel), but the convs run at n_pairs x the batch — better MXU
    # utilization and one dispatch chain instead of n_pairs, for both the
    # forward and the BPTT backward. Per-pair metric keys/subsample draws
    # below keep the exact per-pair key sequence of the unbatched loop.
    # motion_pairs_from_frames also resizes/grayscales each frame once
    # (interior frames belong to two pairs).
    gen_pairs = motion_pairs_from_frames(generated_frames, motion_img_size)

    if loss_type == "MotionPairMean":
        # Profiling-only stub: keeps the pair construction (resize/luma)
        # fwd+bwd, drops MSOE and the metric — for full-iteration marginal
        # cost splits (scripts/profile_vm_r4.py methodology).
        return jnp.mean(gen_pairs), (None, None)
    bsz = generated_frames[0].shape[0]
    flow_all, feats_all = msoe_forward(msoe_params, gen_pairs, return_features=True)
    fg_list = [feats_all[0][i * bsz : (i + 1) * bsz] for i in range(n_pairs)]
    flow_g = flow_all[(n_pairs - 1) * bsz :]

    if loss_type == "MotionMean":
        # Profiling-only stub: keeps pair construction + the generated-side
        # MSOE fwd+bwd, drops target features and the statistics metric.
        return jnp.mean(feats_all[0]), (flow_g, None)

    flow_t = None
    if target_features is not None:
        # Keep precomputed target features at batch 1: every batch item
        # scores against the same target pair, so the batch broadcast is
        # deferred until AFTER the OT subsample gather (gathering the
        # materialized [B, h', w', 320] broadcast cost ~6 ms/iter —
        # docs/hw_r5/msoe_split.log target_bcast row); Gram/SlW broadcast
        # for free in their elementwise differences.
        ft_list = [
            jax.lax.stop_gradient(
                jnp.reshape(
                    target_features[idx],
                    (1,) + tuple(target_features[idx].shape[-3:]),
                )
            )
            for idx in range(n_pairs)
        ]
    else:
        # Target pairs are constants (no gradient path), so their MSOE runs
        # as a separate stacked stop-gradient call: XLA never builds a
        # backward for it.
        tgt_pairs = motion_pairs_from_frames(target_frames, motion_img_size)
        tb = target_frames[0].shape[0]
        tflow_all, tfeats_all = msoe_forward(
            msoe_params, tgt_pairs, return_features=True
        )
        ft_list = [
            jax.lax.stop_gradient(tfeats_all[0][i * tb : (i + 1) * tb])
            for i in range(n_pairs)
        ]
        flow_t = jax.lax.stop_gradient(tflow_all[(n_pairs - 1) * tb :])

    loss = 0.0
    for idx in range(n_pairs):
        fg, ft = fg_list[idx], ft_list[idx]

        if loss_type == "MotionGram":
            loss = loss + jnp.mean((_motion_gram(ft) - _motion_gram(fg)) ** 2)
        elif loss_type == "MotionSlW":
            assert key is not None
            key, sub = jax.random.split(key)
            gf, tf_ = _flatten(fg), _flatten(ft)
            c = gf.shape[-1]
            projs = jax.random.normal(sub, (c, proj_n), gf.dtype)
            projs = projs / jnp.linalg.norm(projs, axis=0, keepdims=True)
            sp = _project_sort(gf, projs)
            tp = resize_nearest_1d(_project_sort(tf_, projs), sp.shape[-1])
            loss = loss + jnp.sum((sp - tp) ** 2)
        elif loss_type == "MotionOT":
            assert key is not None
            b, h, w, c = fg.shape
            gf, tf_ = _flatten(fg), _flatten(ft)
            if h > 32 and h * w > subsample:
                key, sub = jax.random.split(key)
                sel = jax.random.choice(sub, h * w, shape=(subsample,), replace=False)
                gf = jnp.take(gf, sel, axis=1)
                tf_ = jnp.take(tf_, sel, axis=1)
            if tf_.shape[0] != b:  # batch-1 precomputed target features
                tf_ = jnp.broadcast_to(tf_, (b,) + tf_.shape[1:])

            def per_item(gx, tx):
                return _remd(tx, gx) + _moment_loss(tx, gx)

            loss = loss + jnp.mean(jax.vmap(per_item)(gf, tf_))
        else:
            raise ValueError(f"unknown video motion loss type {loss_type}")

    return loss, (flow_g, flow_t)
