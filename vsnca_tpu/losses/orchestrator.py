"""Loss orchestrator: builds the weighted multi-term objective from a
LossConfig, mirroring the reference registry
(ExtraChannels/utils/loss/loss.py:12-126).

``make_loss_fn`` returns a pure, jit-friendly function
``loss_fn(input_dict, key) -> (total_loss, log_dict)``. Weights live in the
(static) LossConfig; the dynamic calibration protocols from the reference
(`set_loss_weight`) return an updated LossConfig — the trainer re-jits on
recalibration, which happens at most a handful of times per run.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vsnca_tpu.config import LossConfig
from vsnca_tpu.losses.appearance import appearance_loss
from vsnca_tpu.losses.auxiliary import auxiliary_loss
from vsnca_tpu.losses.overflow import overflow_loss
from vsnca_tpu.losses.vector_field import (
    get_motion_vector_field_by_name,
    vector_field_motion_loss,
)
from vsnca_tpu.losses.video_motion import video_motion_loss


@dataclasses.dataclass
class LossState:
    """Host-side mutable companion to LossConfig: the precomputed target
    field and feature-extractor params."""

    cfg: LossConfig
    vgg_params: Optional[list] = None
    msoe_params: Optional[dict] = None
    target_field: Optional[jnp.ndarray] = None
    nca_cfg: Optional[object] = None  # NCAConfig, for style-consistency


def make_loss_fn(state: LossState) -> Callable:
    """Build the composite loss function for the enabled terms."""
    cfg = state.cfg

    if cfg.vector_field_motion_weight != 0 and state.target_field is None:
        state.target_field = get_motion_vector_field_by_name(
            cfg.motion_vector_field_name, cfg.motion_img_size
        )

    needs_vgg = (
        cfg.appearance_weight != 0
        or (cfg.auxiliary_weight != 0 and cfg.auxiliary_loss_type != "MSE")
        or cfg.content_weight != 0
    )
    needs_msoe = cfg.vector_field_motion_weight != 0 or cfg.video_motion_weight != 0
    assert not needs_vgg or state.vgg_params is not None, "loss needs VGG params"
    assert not needs_msoe or state.msoe_params is not None, "loss needs MSOE params"

    def loss_fn(input_dict: Dict, key: jax.Array):
        total = jnp.asarray(0.0, jnp.float32)
        logs: Dict[str, jnp.ndarray] = {}

        if cfg.overflow_weight != 0:
            l = overflow_loss(input_dict["nca_state"])
            logs["overflow"] = l * cfg.overflow_weight
            total = total + cfg.overflow_weight * l

        if cfg.auxiliary_weight != 0:
            key, sub = jax.random.split(key)
            gen_list = input_dict["generated_image_list"]
            aux_list = input_dict["auxillary_image_list"]
            l = 0.0
            for g, a in zip(gen_list, aux_list):
                l = l + auxiliary_loss(
                    state.vgg_params, g, a, cfg.auxiliary_loss_type, sub,
                    cfg.ot_subsample, cfg.slw_projections,
                )
            l = l / len(gen_list)
            logs["auxillary"] = l * cfg.auxiliary_weight
            total = total + cfg.auxiliary_weight * l

        if cfg.vector_field_motion_weight != 0:
            l, sub_logs, _ = vector_field_motion_loss(
                state.msoe_params,
                input_dict["generated_image_before_nca"],
                input_dict["generated_image_after_nca"],
                state.target_field,
                input_dict["step_n"],
                cfg.nca_base_num_steps,
                cfg.motion_img_size,
                cfg.motion_strength_weight,
                cfg.motion_direction_weight,
            )
            for k, v in sub_logs.items():
                logs[f"vector_field_motion-{k}"] = v
            logs["vector_field_motion"] = l * cfg.vector_field_motion_weight
            total = total + cfg.vector_field_motion_weight * l

        if cfg.appearance_weight != 0:
            key, sub = jax.random.split(key)
            gen_list = input_dict["generated_image_list"]
            tgt_list = input_dict["target_image_list"]
            # Optional precomputed style features (constant across
            # iterations — see precompute_target_style_features).
            tgt_feats = input_dict.get("target_style_features")
            one_target = all(t is tgt_list[0] for t in tgt_list[1:]) and all(
                g.shape == gen_list[0].shape for g in gen_list
            )
            if len(gen_list) > 1 and one_target:
                # Tapped-frame lists share ONE style target (the trainer
                # builds [target_style] * n_frames, fit_video_motion.py:243)
                # — stack the frames on the batch axis so the n_frames VGG
                # forwards (and their backwards) run as ONE larger-batch
                # call. Per-item metrics then average over frames*batch,
                # which equals the per-frame mean-loss average exactly;
                # SlW SUMS over items, so it needs the explicit /n_frames.
                # The unbatched loop reuses the same `sub` key per frame,
                # so the single stacked draw is key-identical too.
                gen = jnp.concatenate(gen_list, axis=0)
                l = appearance_loss(
                    state.vgg_params, gen, tgt_list[0],
                    cfg.appearance_loss_type, sub,
                    cfg.ot_subsample, cfg.slw_projections,
                    target_features=tgt_feats,
                )
                if cfg.appearance_loss_type == "SlW":
                    l = l / len(gen_list)
            else:
                l = 0.0
                for g, t in zip(gen_list, tgt_list):
                    l = l + appearance_loss(
                        state.vgg_params, g, t, cfg.appearance_loss_type, sub,
                        cfg.ot_subsample, cfg.slw_projections,
                        target_features=tgt_feats,
                    )
                l = l / len(gen_list)
            logs["appearance"] = l * cfg.appearance_weight
            total = total + cfg.appearance_weight * l

        if cfg.video_motion_weight != 0:
            key, sub = jax.random.split(key)
            l, _ = video_motion_loss(
                state.msoe_params,
                input_dict["generated_image_list_motion"],
                input_dict.get("target_motion_image_list"),
                cfg.video_motion_loss_type,
                sub,
                cfg.motion_img_size,
                cfg.ot_subsample,
                cfg.slw_projections,
                target_features=input_dict.get("target_motion_feature_list"),
            )
            logs["video_motion"] = l * cfg.video_motion_weight
            total = total + cfg.video_motion_weight * l

        if cfg.content_weight != 0:
            from vsnca_tpu.losses.content import content_loss

            gen = (input_dict["generated_image_list"][0] + 1.0) / 2.0
            tgt = (input_dict["content_image"] + 1.0) / 2.0
            l = content_loss(state.vgg_params, gen, tgt)
            logs["content"] = l * cfg.content_weight
            total = total + cfg.content_weight * l

        if cfg.style_consistency_weight != 0:
            from vsnca_tpu.losses.style_consistency import style_consistency_loss

            key, sub = jax.random.split(key)
            # min_steps is static under jit: 32 = the reference's step-range
            # minimum (fit scripts' nca_step_range[0]).
            l = style_consistency_loss(
                input_dict["nca_params"],
                state.nca_cfg,
                input_dict["target_image_list"][0],
                sub,
                min_steps=32,
                cond_img=input_dict.get("style_consistency_cond_img"),
            )
            logs["style_consistency"] = l * cfg.style_consistency_weight
            total = total + cfg.style_consistency_weight * l

        return total, logs

    return loss_fn


# Manual per-texture motion weights (loss.py:117-126).
_MANUAL_WEIGHTS = {
    "12-96": {
        "ants": 0.2, "fur": 1.0, "sea_2": 4.0, "flames": 3.0,
        "sky_clouds_1": 0.25, "smoke_2": 0.1, "smoke_3": 0.5, "sea_3": 2.0,
        "calm_water_4": 1.0, "calm_water_2": 1.0,
    },
    "16-128": {
        "ants": 0.2, "fur": 1.0, "sea_2": 4.0, "flames": 2.0,
        "sky_clouds_1": 0.25, "smoke_2": 0.1, "smoke_3": 1.0, "sea_3": 2.0,
        "calm_water_4": 1.0, "calm_water_2": 1.0,
    },
}


def set_loss_weight(
    cfg: LossConfig,
    loss_name: str = "video_motion",
    appearance_loss_log=None,
    loss_num: float = 10.0,
    medium_mt: Optional[float] = None,
    img_size: int = 256,
    nca_config_key: str = "16-128",
    img_name: Optional[str] = None,
) -> LossConfig:
    """Dynamic weight calibration (loss.py:66-84). Returns a new LossConfig.

    - video_motion: linear fit from the median motion loss during warmup,
      clamped to [2, 10], overridden by the hand-tuned per-texture table.
    - vector_field_motion: median(appearance_loss_log) / 50.
    """
    if loss_name == "video_motion":
        w = loss_num
        if medium_mt is not None:
            if img_size == 256:
                w = min(10.0, max(medium_mt * 6.04 - 2.17, 2.0))
            elif img_size == 128:
                w = min(10.0, max(medium_mt * 5.82 - 1.05, 2.0))
            table = _MANUAL_WEIGHTS.get(nca_config_key, {})
            if img_name is not None and img_name in table:
                w = table[img_name]
        return dataclasses.replace(cfg, video_motion_weight=float(w))
    if loss_name == "vector_field_motion":
        w = float(np.median(np.asarray(appearance_loss_log)) / 50.0)
        return dataclasses.replace(cfg, vector_field_motion_weight=w)
    raise ValueError(f"unknown calibrated loss {loss_name}")
