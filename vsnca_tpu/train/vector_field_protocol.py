"""Vector-field-motion training protocol — the fit_vector_field_motion.py
driver semantics (ExtraChannels/fit_vector_field_motion.py:198-334,
SURVEY.md C18):

1. Train with appearance + vector-field-motion + overflow losses.
2. PERIODIC RECALIBRATION: every ``motion_weight_change_interval`` (500)
   iterations, reset the vector-field-motion weight from the running
   appearance-loss log — ``median(appearance_log) / 50``
   (fit_vector_field_motion.py:264-266, loss.py:66-84). Unlike the
   video-motion protocol there is NO model/pool/optimizer re-init: the
   weight changes in place mid-run.
3. ARTIFACT DUMPS: every ``save_every`` iterations, synthesize short
   control videos at 1x and 2x resolution (:285-287) plus the generated
   flow image and generated/target vector-field streamplots (:289-298).
4. NaN abort is the trainer's (train_failed semantics).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vsnca_tpu.config import LossConfig, NCAConfig, TrainConfig
from vsnca_tpu.losses.orchestrator import set_loss_weight
from vsnca_tpu.train.trainer import DyNCATrainer


def synthesize_texture_video(
    params: dict,
    nca_cfg: NCAConfig,
    img_size,
    path: str,
    n_frames: int = 30,
    step_n: int = 24,
    size_factor: float = 1.0,
    fps: float = 30.0,
    key: Optional[jax.Array] = None,
):
    """Roll the learned dynamic texture from a fresh seed, emitting one
    frame every ``step_n`` steps (fit_vector_field_motion.py:172-187's
    save_video: pure synthesis, no content conditioning; NCA state persists
    across frames). ``size_factor`` scales the grid (the reference saves 1x
    and 2x videos)."""
    from vsnca_tpu.models.dynca import (
        dynca_rollout, dynca_seed, make_conditioning,
    )
    from vsnca_tpu.utils.video_writer import VideoWriter

    h = int(img_size[0] * size_factor)
    w = int(img_size[1] * size_factor)
    key = key if key is not None else jax.random.PRNGKey(0)
    state = dynca_seed(nca_cfg, 1, (h, w), key=key)
    if nca_cfg.n_seed_channels < nca_cfg.c_in:
        state = jnp.concatenate(
            [state,
             jnp.zeros(state.shape[:3] + (nca_cfg.c_in - nca_cfg.n_seed_channels,))],
            axis=-1,
        )
    cond = make_conditioning(nca_cfg, (h, w), batch=1)
    frames = []
    with VideoWriter(path, fps=fps) as vw:
        for i in range(n_frames):
            key, sub = jax.random.split(key)
            state, rgb = dynca_rollout(
                params, state, sub, nca_cfg, step_n, cond=cond, remat="none"
            )
            frame = np.asarray(jnp.clip(rgb[0], -1.0, 1.0)) * 0.5 + 0.5
            vw.add(frame)
            frames.append(frame)
    return frames


@dataclasses.dataclass
class VectorFieldProtocol:
    """Host-side run loop for BASELINE config 2 (synthetic vector fields)."""

    nca_cfg: NCAConfig
    loss_cfg: LossConfig
    train_cfg: TrainConfig
    target_style: jnp.ndarray  # [B, H, W, 3] in [-1, 1]
    recalibrate_every: int = 500  # motion_weight_change_interval
    save_every: int = 0  # 0 disables artifact dumps
    out_dir: Optional[str] = None
    video_frames: int = 8
    precompute_features: bool = True

    def __post_init__(self):
        self._appearance_log: list = []
        self.recalibrations: list = []  # (iteration, new_weight)
        self._style_feats = None

    def run(self, vgg_params, msoe_params, log_every: int = 50,
            callback=None) -> DyNCATrainer:
        if self.precompute_features and self.loss_cfg.appearance_weight:
            from vsnca_tpu.losses.appearance import (
                precompute_target_style_features,
            )

            self._style_feats = precompute_target_style_features(
                vgg_params, self.target_style,
                self.loss_cfg.appearance_loss_type, self.train_cfg.img_size,
            )

        trainer = DyNCATrainer(
            self.nca_cfg, self.loss_cfg, self.train_cfg,
            vgg_params=vgg_params, msoe_params=msoe_params,
        )
        inputs = {"target_style": self.target_style}
        if self._style_feats is not None:
            inputs["target_style_features"] = self._style_feats

        for i in range(self.train_cfg.max_iterations):
            log = trainer.train_iteration(inputs)
            if "appearance" in log.logs and self.loss_cfg.appearance_weight:
                # The orchestrator logs WEIGHTED terms; the reference logs
                # raw values and calibrates on them (loss.py:108,66-84).
                self._appearance_log.append(
                    log.logs["appearance"] / self.loss_cfg.appearance_weight
                )

            # Periodic in-place weight recalibration (:264-266). The
            # reference checks ``i % interval == 0 and i > 0``.
            if (self.recalibrate_every
                    and i % self.recalibrate_every == 0 and i > 0):
                new_cfg = set_loss_weight(
                    self.loss_cfg, "vector_field_motion",
                    appearance_loss_log=self._appearance_log,
                )
                self.recalibrations.append(
                    (i, new_cfg.vector_field_motion_weight)
                )
                self.loss_cfg = new_cfg
                trainer.rebuild_loss(new_cfg)

            if (self.save_every and self.out_dir
                    and (i + 1) % self.save_every == 0):
                self._dump_artifacts(trainer, msoe_params, i)

            if callback and i % log_every == 0:
                callback("train", i, log)
        return trainer

    def _dump_artifacts(self, trainer: DyNCATrainer, msoe_params, i: int):
        """1x/2x control videos + flow image + generated/target vector-field
        streamplots (fit_vector_field_motion.py:285-298)."""
        from vsnca_tpu.losses.vector_field import (
            get_motion_vector_field_by_name,
        )
        from vsnca_tpu.models.msoe import motion_pair_from_rgb, msoe_forward
        from vsnca_tpu.utils.display import save_image_grid
        from vsnca_tpu.utils.flow_viz import flow_to_image, plot_vec_field

        os.makedirs(self.out_dir, exist_ok=True)
        frames = synthesize_texture_video(
            trainer.params, self.nca_cfg, self.train_cfg.img_size,
            os.path.join(self.out_dir, "video_last.mp4"),
            n_frames=self.video_frames,
            step_n=self.loss_cfg.nca_base_num_steps, size_factor=1.0,
        )
        synthesize_texture_video(
            trainer.params, self.nca_cfg, self.train_cfg.img_size,
            os.path.join(self.out_dir, "video_large_last.mp4"),
            n_frames=self.video_frames,
            step_n=self.loss_cfg.nca_base_num_steps, size_factor=2.0,
        )
        from PIL import Image

        if msoe_params is not None and len(frames) >= 2:
            a = jnp.asarray(frames[-2][None] * 2.0 - 1.0)
            b = jnp.asarray(frames[-1][None] * 2.0 - 1.0)
            pair = motion_pair_from_rgb(a, b, self.loss_cfg.motion_img_size)
            flow = np.asarray(msoe_forward(msoe_params, pair))[0]
            save_image_grid(
                flow_to_image(flow)[None].astype(np.float32) / 255.0,
                os.path.join(self.out_dir, f"flow_gen{i}.jpg"),
            )
            Image.fromarray(plot_vec_field(flow, name="generated")).save(
                os.path.join(self.out_dir, f"vec_field_gen{i}.png")
            )
        target = np.asarray(
            get_motion_vector_field_by_name(
                self.loss_cfg.motion_vector_field_name,
                self.loss_cfg.motion_img_size,
            )
        )[0]
        Image.fromarray(plot_vec_field(target, name="target")).save(
            os.path.join(self.out_dir, "vec_field_target.png")
        )
