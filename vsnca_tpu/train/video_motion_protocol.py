"""Video-motion training protocol — the fit_video_motion.py driver semantics
(ExtraChannels/fit_video_motion.py:216-355, SURVEY.md C18):

1. WARMUP: train ``warmup_iters`` with the initial video-motion weight.
2. CALIBRATE: set the video-motion weight from the median motion loss seen
   during warmup (the linear fits + manual per-texture table,
   loss.py:66-84).
3. REINIT: re-initialize model, pool, and optimizer, then train to
   completion with the calibrated weight.
4. Anomaly recovery: pool slots whose appearance loss exceeds a threshold
   are replaced with fresh seeds (fit_video_motion.py:316-327).
5. Target windows: frame-window start indices follow the bounded random
   walk (misc.py:4-30).
6. Final eval: ``synthesize_and_score`` rolls a long video and averages
   appearance/motion losses against all target frames, writing
   final_loss_test.txt (fit_video_motion.py:374-421).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vsnca_tpu.config import LossConfig, NCAConfig, TrainConfig
from vsnca_tpu.data.preprocess import get_start_frame_idx
from vsnca_tpu.losses.orchestrator import set_loss_weight
from vsnca_tpu.train.trainer import DyNCATrainer


@dataclasses.dataclass
class VideoMotionProtocol:
    nca_cfg: NCAConfig
    loss_cfg: LossConfig
    train_cfg: TrainConfig
    target_video: jnp.ndarray  # [T, H, W, 3] in [-1, 1]
    appearance_frame: jnp.ndarray  # [B, H, W, 3] (selected style frame)
    warmup_iters: int = 1000
    n_motion_frames: int = 3
    tap_every: int = 64
    # Reference-faithful tap schedule (fit_video_motion.py:230-235): frames
    # after steps 1, 1+tap_every, ... <= step_n plus a frameless tail —
    # step_n total steps per iteration, 2-3 frames for the default [80,144)
    # range. False reverts to the r2 shape (n_motion_frames equal chunks =
    # n*tap_every steps, which over-rolls vs the reference).
    reference_tap_schedule: bool = True
    anomaly_appearance_threshold: float = 50.0
    img_name: Optional[str] = None
    # Precompute target-side features once per video/style (they are
    # constant across iterations; the reference re-extracts them under
    # no_grad every iteration — precomputing is gradient-identical).
    precompute_features: bool = True

    def __post_init__(self):
        self._motion_losses: list = []
        self._start_idx = 0
        self._rng = np.random.RandomState(self.train_cfg.seed)
        self._style_feats = None
        self._motion_feats = None

    def _build_trainer(self, vgg, msoe) -> DyNCATrainer:
        return DyNCATrainer(
            self.nca_cfg, self.loss_cfg, self.train_cfg,
            vgg_params=vgg, msoe_params=msoe,
        )

    def _window_inputs(
        self, batch: int, n_frames: int = 0
    ) -> Dict[str, jnp.ndarray]:
        n_frames = n_frames or self.n_motion_frames
        t = int(self.target_video.shape[0])
        self._start_idx = get_start_frame_idx(self._rng, t, n_frames)
        inputs = {"target_style": self.appearance_frame}
        if self._style_feats is not None:
            inputs["target_style_features"] = self._style_feats
        if self._motion_feats is not None:
            s = self._start_idx
            inputs["target_motion_features"] = self._motion_feats[
                s : s + n_frames - 1
            ]
        else:
            inputs["target_motion_frames"] = jnp.stack(
                [
                    jnp.broadcast_to(
                        self.target_video[self._start_idx + k],
                        (batch,) + self.target_video.shape[1:],
                    )
                    for k in range(n_frames)
                ]
            )
        return inputs

    def _iteration_kwargs(self, trainer: DyNCATrainer):
        """(inputs, train_iteration kwargs) for one iteration — the
        reference schedule derives frames-per-iteration from the sampled
        (bucketed) step_n; the legacy shape fixes n_motion_frames chunks."""
        if not self.reference_tap_schedule:
            inputs = self._window_inputs(self.train_cfg.batch_size)
            return inputs, dict(
                n_motion_frames=self.n_motion_frames,
                tap_every=self.tap_every,
            )
        from vsnca_tpu.models.dynca import tap_schedule

        step_n = trainer.sample_step_n()
        # The motion loss needs >= 2 tapped frames; the reference's step
        # range [80, 144) with interval 64 guarantees this — enforce it for
        # arbitrary (test-sized) configs by bumping step_n past the first
        # tap interval.
        step_n = max(step_n, self.tap_every + 1)
        chunks, tail = tap_schedule(step_n, self.tap_every)
        inputs = self._window_inputs(
            self.train_cfg.batch_size, n_frames=len(chunks)
        )
        return inputs, dict(
            step_n=step_n, tap_chunks=chunks, tail_steps=tail
        )

    def run(self, vgg_params, msoe_params, log_every: int = 50, callback=None):
        """Full protocol; returns the final trainer."""
        if self.precompute_features:
            from vsnca_tpu.losses.appearance import (
                precompute_target_style_features,
            )
            from vsnca_tpu.losses.video_motion import (
                precompute_target_motion_features,
            )

            if self.loss_cfg.appearance_weight:
                self._style_feats = precompute_target_style_features(
                    vgg_params, self.appearance_frame,
                    self.loss_cfg.appearance_loss_type,
                    self.train_cfg.img_size,
                )
            if self.loss_cfg.video_motion_weight and msoe_params is not None:
                # The helper enforces the HBM budget itself (None past it;
                # we then recompute target features per window).
                self._motion_feats = precompute_target_motion_features(
                    msoe_params, self.target_video,
                    self.loss_cfg.motion_img_size,
                )
        trainer = self._build_trainer(vgg_params, msoe_params)

        # ---- warmup ----
        for i in range(self.warmup_iters):
            inputs, kw = self._iteration_kwargs(trainer)
            log = trainer.train_iteration(inputs, **kw)
            if "video_motion" in log.logs and self.loss_cfg.video_motion_weight:
                self._motion_losses.append(
                    log.logs["video_motion"] / self.loss_cfg.video_motion_weight
                )
            self._maybe_anomaly_reseed(trainer, log)
            if callback and i % log_every == 0:
                callback("warmup", i, log)

        # ---- calibrate + reinit (fit_video_motion.py:280-306) ----
        medium_mt = float(np.median(self._motion_losses)) if self._motion_losses else None
        new_loss_cfg = set_loss_weight(
            self.loss_cfg,
            "video_motion",
            medium_mt=medium_mt,
            img_size=self.train_cfg.img_size[0],
            nca_config_key=f"{self.nca_cfg.c_in}-{self.nca_cfg.fc_dim}",
            img_name=self.img_name,
        )
        self.loss_cfg = new_loss_cfg
        trainer = self._build_trainer(vgg_params, msoe_params)
        trainer.loss_state = dataclasses.replace(
            trainer.loss_state, cfg=new_loss_cfg
        )
        trainer.rebuild_loss(new_loss_cfg)

        # ---- main phase ----
        remaining = self.train_cfg.max_iterations - self.warmup_iters
        for i in range(max(remaining, 0)):
            inputs, kw = self._iteration_kwargs(trainer)
            log = trainer.train_iteration(inputs, **kw)
            self._maybe_anomaly_reseed(trainer, log)
            if callback and i % log_every == 0:
                callback("main", i, log)
        return trainer

    def _maybe_anomaly_reseed(self, trainer: DyNCATrainer, log):
        """Replace the diverged batch's pool slots with fresh seeds
        (fit_video_motion.py:316-327 writes seeds to the SAME batch_idx;
        here the diverged states were already scattered back, so reseeding
        those exact slots yields the same pool contents)."""
        app = log.logs.get("appearance")
        if app is not None and app > self.anomaly_appearance_threshold:
            trainer.reseed_pool_slots(trainer.last_batch_idx)


def synthesize_and_score(
    trainer: DyNCATrainer,
    target_video: jnp.ndarray,
    out_dir: str,
    n_frames: int = 40,
    step_n: int = 32,
    key: Optional[jax.Array] = None,
    texture_frames: Optional[jnp.ndarray] = None,
) -> Dict[str, float]:
    """Quantitative eval hook (fit_video_motion.py:374-421): roll a video
    from a fresh seed, then score each generated frame's appearance loss
    (the configured metric) against every texture frame, and each
    consecutive generated-frame pair's video-motion loss against every
    consecutive target-frame pair; write final_loss_test.txt.

    ``texture_frames`` defaults to ``target_video`` (the reference passes
    ``train_image_seq_texture``, which for video-motion fits is the target
    video itself). The reference normalizes totals by ``video_length*40``
    regardless of how many pairs were scored; we report true means instead.
    """
    from vsnca_tpu.losses.appearance import appearance_loss
    from vsnca_tpu.losses.video_motion import video_motion_loss
    from vsnca_tpu.models.dynca import dynca_rollout_with_taps, dynca_seed, make_conditioning

    key = key if key is not None else jax.random.PRNGKey(0)
    cfg = trainer.nca_cfg
    hw = trainer.train_cfg.img_size
    seed = dynca_seed(cfg, 1, hw, key=key)
    if cfg.n_seed_channels < cfg.c_in:
        seed = jnp.concatenate(
            [seed, jnp.zeros(seed.shape[:3] + (cfg.c_in - cfg.n_seed_channels,))],
            axis=-1,
        )
    cond_img = (
        jnp.zeros((1,) + tuple(hw) + (1,)) if cfg.conditioning == "edges" else None
    )
    cond = (
        make_conditioning(cfg, hw, cond_img=cond_img, batch=1)
        if cfg.conditioning is not None
        else None
    )
    _, frames = dynca_rollout_with_taps(
        trainer.params, seed, key, cfg, n_frames, step_n, cond=cond, remat="none"
    )

    loss_cfg = trainer.loss_state.cfg
    vgg = trainer.loss_state.vgg_params
    msoe = trainer.loss_state.msoe_params
    if texture_frames is None:
        texture_frames = target_video

    # Batch all (frame, target) pairs through vmapped scorers — ONE device
    # dispatch + fetch per metric instead of O(n_frames * T) blocking
    # float() round-trips (each a tunnel round-trip on the axon backend).
    n_tex = int(texture_frames.shape[0])

    @jax.jit
    def app_scores_all(frames_, k):
        keys = jax.random.split(k, n_frames * n_tex).reshape(
            n_frames, n_tex, -1
        )

        def per_pair(gen, tgt, kk):
            return appearance_loss(
                vgg, gen[None], tgt[None], loss_cfg.appearance_loss_type, kk,
                loss_cfg.ot_subsample, loss_cfg.slw_projections,
            )

        per_gen = jax.vmap(per_pair, in_axes=(None, 0, 0))
        return jax.vmap(per_gen, in_axes=(0, None, 0))(
            frames_[:, 0], texture_frames, keys
        )

    @jax.jit
    def motion_scores_all(frames_, k):
        t_pairs = target_video.shape[0] - 1
        keys = jax.random.split(k, (n_frames - 1) * t_pairs).reshape(
            n_frames - 1, t_pairs, -1
        )

        def per_pair(g0, g1, t0, t1, kk):
            l, _ = video_motion_loss(
                msoe, [g0[None], g1[None]], [t0[None], t1[None]],
                loss_cfg.video_motion_loss_type, kk,
                loss_cfg.motion_img_size, loss_cfg.ot_subsample,
                loss_cfg.slw_projections,
            )
            return l

        per_gen = jax.vmap(per_pair, in_axes=(None, None, 0, 0, 0))
        return jax.vmap(per_gen, in_axes=(0, 0, None, None, 0))(
            frames_[:-1, 0], frames_[1:, 0],
            target_video[:-1], target_video[1:], keys,
        )

    key, k_app, k_mot = jax.random.split(key, 3)
    app = np.asarray(app_scores_all(frames, k_app))
    result = {"appearance_loss_mean": float(app.mean())}
    if msoe is not None and loss_cfg.video_motion_weight != 0 and n_frames > 1:
        mot = np.asarray(motion_scores_all(frames, k_mot))
        result["video_motion_loss_mean"] = float(mot.mean())
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "final_loss_test.txt"), "w") as f:
        f.write(repr(result))
    return result
