#!/usr/bin/env python
"""Bounded hardware training runs for the five BASELINE configs.

Produces, per preset, under assets/runs/<preset>/:
  loss.jsonl       one record per logged iteration (loss + per-term values)
  loss_curve.png   loss over iterations
  summary.json     final/min loss, it/s, wall time, run config
  *.gif / *.png    synthesized visual artifacts (texture videos, stylized
                   clips, control generations, grown goals)

Training inputs are read (read-only) from the reference checkout's data
folder — the reference's own style images / target videos / evaluation clip
(/root/reference/ExtraChannels/data, docs/supplementary) — nothing from the
reference is copied into this repo; only our generated outputs are committed.

VGG16/MSOE run with the deterministic random-fallback weights (the image is
offline — scripts/convert_vgg16.py / convert_msoe.py document the converter
path). Random shallow-filter statistics still carry a usable style/motion
signal, so these runs demonstrate that every protocol CONVERGES end-to-end
on TPU hardware (no-NaN, decreasing loss, stable attractor); they are not
claims about perceptual quality under the pretrained extractors.

Run:  python scripts/make_artifacts.py [--presets a,b,...] [--scale 1.0]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_DATA = "/root/reference/ExtraChannels/data"
REF_SUPP = "/root/reference/docs/supplementary/comparison_with_SOTA"
STYLE_IMG = os.path.join(REF_DATA, "Style_images", "texture-painting.jpg")
STYLE_IMG2 = os.path.join(REF_DATA, "Style_images", "starry-night.jpg")
TARGET_DIR = os.path.join(REF_DATA, "Target_images")
EVAL_GIF = os.path.join(REF_DATA, "Evaluation", "mr-bean.gif")
DYNAMICS_MP4 = os.path.join(REF_SUPP, "calm_water_6.mp4")


# Per-preset grid sizes; --smoke shrinks everything for a fast CPU
# validation pass of the full script before spending hardware time.
SIZES = {"static_texture": 128, "vector_field_motion": 128,
         "video_motion": 256, "conditioned": 256, "encoder": 64}


class RunLog:
    """JSONL logger + wall-clock it/s tracker for one preset run."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "loss.jsonl")
        self.f = open(self.path, "w")
        self.losses = []
        self.t0 = time.time()
        self._t_last = self.t0
        self._i_last = 0

    def log(self, i: int, loss: float, terms: dict, phase: str = "train"):
        now = time.time()
        di = max(i - self._i_last, 1)
        rate = di / max(now - self._t_last, 1e-9)
        self._t_last, self._i_last = now, i
        rec = {"i": i, "phase": phase, "loss": float(loss),
               "it_per_sec": rate,
               **{k: float(v) for k, v in terms.items()}}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        self.losses.append((i, float(loss)))
        print(f"[{os.path.basename(self.out_dir)}] {phase} i={i} "
              f"loss={loss:.4f} ({rate:.2f} it/s)", flush=True)

    def finish(self, **extra):
        self.f.close()
        wall = time.time() - self.t0
        arr = np.asarray([l for _, l in self.losses], dtype=np.float64)
        # steady-state it/s: median of the logged inter-block rates after
        # the first block (which pays the compiles)
        rates = []
        with open(self.path) as f:
            for line in f:
                rates.append(json.loads(line).get("it_per_sec", 0.0))
        summary = {
            "iterations_logged": len(self.losses),
            "first_loss": float(arr[0]) if arr.size else None,
            "final_loss": float(arr[-1]) if arr.size else None,
            "min_loss": float(arr.min()) if arr.size else None,
            "median_it_per_sec_after_warm": (
                float(np.median(rates[2:])) if len(rates) > 3 else None
            ),
            "wall_seconds": wall,
            "all_finite": bool(np.isfinite(arr).all()),
            **extra,
        }
        with open(os.path.join(self.out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        try:
            from vsnca_tpu.utils.display import plot_losses

            plot_losses([l for _, l in self.losses],
                        os.path.join(self.out_dir, "loss_curve.png"))
        except Exception as e:  # matplotlib backend issues shouldn't kill runs
            print("loss_curve.png failed:", e)
        return summary


def save_gif(path, frames, fps=12.0):
    from vsnca_tpu.utils.video_writer import VideoWriter

    with VideoWriter(path, fps=fps) as vw:
        for f in frames:
            vw.add(f)


def save_png(path, img01):
    from PIL import Image

    Image.fromarray(np.uint8(np.clip(img01, 0, 1) * 255)).save(path)


def _style(path, hw, batch):
    import jax.numpy as jnp

    from vsnca_tpu.data.preprocess import preprocess_style_image

    return jnp.asarray(preprocess_style_image(path, hw, batch) * 2.0 - 1.0)


# --------------------------------------------------------------- presets


def run_static_texture(out_dir, iters):
    import jax.numpy as jnp

    from vsnca_tpu.losses.appearance import precompute_target_style_features
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.presets import static_texture
    from vsnca_tpu.train.trainer import DyNCATrainer
    from vsnca_tpu.train.vector_field_protocol import synthesize_texture_video

    nca_cfg, loss_cfg, train_cfg = static_texture(SIZES["static_texture"])
    train_cfg = dataclasses.replace(
        train_cfg, max_iterations=iters, step_buckets=(64, 96),
        save_every=0,
    )
    vgg, _ = load_vgg16()
    style = _style(STYLE_IMG, train_cfg.img_size, train_cfg.batch_size)
    feats = precompute_target_style_features(
        vgg, style, loss_cfg.appearance_loss_type, train_cfg.img_size
    )
    trainer = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg)
    inputs = {"target_style": style, "target_style_features": feats}

    log = RunLog(out_dir)
    for i in range(iters):
        sync = i % 25 == 0 or i == iters - 1
        tl = trainer.train_iteration(inputs, sync=sync)
        if sync:
            log.log(i, tl.loss, tl.logs)

    frames = synthesize_texture_video(
        trainer.params, nca_cfg, train_cfg.img_size,
        os.path.join(out_dir, "texture.gif"), n_frames=48,
        step_n=loss_cfg.nca_base_num_steps, fps=12.0,
    )
    save_png(os.path.join(out_dir, "texture_final.png"), frames[-1])
    save_png(os.path.join(out_dir, "style_target.png"),
             np.asarray((style[0] + 1.0) / 2.0))
    return log.finish(preset="static_texture", style_image=STYLE_IMG,
                      img_size=SIZES["static_texture"],
                      rollout_path=trainer._rollout_path)


def run_vector_field(out_dir, iters):
    from vsnca_tpu.models.msoe import load_msoe
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.presets import vector_field_motion
    from vsnca_tpu.train.vector_field_protocol import VectorFieldProtocol

    nca_cfg, loss_cfg, train_cfg = vector_field_motion(
        SIZES["vector_field_motion"], field="circular")
    train_cfg = dataclasses.replace(
        train_cfg, max_iterations=iters, step_buckets=(64, 96), save_every=0,
    )
    vgg, _ = load_vgg16()
    msoe, _ = load_msoe()
    style = _style(STYLE_IMG, train_cfg.img_size, train_cfg.batch_size)

    proto = VectorFieldProtocol(
        nca_cfg, loss_cfg, train_cfg, target_style=style,
        recalibrate_every=500, save_every=0, out_dir=out_dir,
    )
    log = RunLog(out_dir)

    def cb(phase, i, tl):
        log.log(i, tl.loss, tl.logs, phase)

    trainer = proto.run(vgg, msoe, log_every=25, callback=cb)
    proto._dump_artifacts(trainer, msoe, iters)  # flow + streamplots + videos
    # texture video as gif for the repo
    from vsnca_tpu.train.vector_field_protocol import synthesize_texture_video

    synthesize_texture_video(
        trainer.params, nca_cfg, train_cfg.img_size,
        os.path.join(out_dir, "texture.gif"), n_frames=48,
        step_n=loss_cfg.nca_base_num_steps, fps=12.0,
    )
    return log.finish(preset="vector_field_motion", style_image=STYLE_IMG,
                      field="circular",
                      recalibrations=proto.recalibrations,
                      rollout_path=trainer._rollout_path)


def run_video_motion(out_dir, iters):
    import jax.numpy as jnp

    from vsnca_tpu.data.preprocess import (
        compute_flow_strengths,
        preprocess_video,
        select_appearance_frame,
    )
    from vsnca_tpu.models.msoe import load_msoe
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.presets import video_motion
    from vsnca_tpu.train.vector_field_protocol import synthesize_texture_video
    from vsnca_tpu.train.video_motion_protocol import (
        VideoMotionProtocol,
        synthesize_and_score,
    )

    nca_cfg, loss_cfg, train_cfg = video_motion(SIZES["video_motion"])
    train_cfg = dataclasses.replace(
        train_cfg, max_iterations=iters, step_buckets=(96, 128), save_every=0,
    )
    vgg, _ = load_vgg16()
    msoe, _ = load_msoe()

    video = jnp.asarray(
        preprocess_video(DYNAMICS_MP4, train_cfg.img_size, max_frames=16)
    )
    # appearance frame by max optic-flow strength (preprocess_texture.py:130-144)
    strengths = compute_flow_strengths(msoe, video)
    idx = select_appearance_frame(strengths)
    appearance = jnp.broadcast_to(
        video[idx], (train_cfg.batch_size,) + video.shape[1:]
    )

    proto = VideoMotionProtocol(
        nca_cfg, loss_cfg, train_cfg,
        target_video=video, appearance_frame=appearance,
        warmup_iters=min(1000, iters // 2),
    )
    log = RunLog(out_dir)

    def cb(phase, i, tl):
        log.log(i + (proto.warmup_iters if phase == "main" else 0),
                tl.loss, tl.logs, phase)

    trainer = proto.run(vgg, msoe, log_every=25, callback=cb)
    score = synthesize_and_score(
        trainer, video, out_dir, n_frames=24, step_n=32
    )
    synthesize_texture_video(
        trainer.params, nca_cfg, train_cfg.img_size,
        os.path.join(out_dir, "dynamic_texture.gif"), n_frames=48,
        step_n=loss_cfg.nca_base_num_steps, fps=12.0,
    )
    save_png(os.path.join(out_dir, "appearance_target.png"),
             np.asarray((appearance[0] + 1.0) / 2.0))
    return log.finish(preset="video_motion", target_video=DYNAMICS_MP4,
                      appearance_frame_idx=int(idx), eval_scores=score,
                      calibrated_motion_weight=proto.loss_cfg.video_motion_weight,
                      rollout_path=trainer._rollout_path)


def _run_conditioned(preset_name, out_dir, iters):
    """extra_channels / edge_conditioned: content-conditioned stylization
    (the fork's flagship flows, experiments.py:95-315)."""
    import jax.numpy as jnp

    from vsnca_tpu.data.preprocess import preprocess_target_images
    from vsnca_tpu.losses.appearance import precompute_target_style_features
    from vsnca_tpu.models.msoe import load_msoe
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.presets import PRESETS
    from vsnca_tpu.train.trainer import DyNCATrainer

    nca_cfg, loss_cfg, train_cfg = PRESETS[preset_name](SIZES["conditioned"])
    train_cfg = dataclasses.replace(
        train_cfg, max_iterations=iters, step_buckets=(64, 96), save_every=0,
    )
    vgg, _ = load_vgg16()
    msoe, _ = load_msoe()
    hw = train_cfg.img_size
    style = _style(STYLE_IMG2, hw, train_cfg.batch_size)
    feats = precompute_target_style_features(
        vgg, style, loss_cfg.appearance_loss_type, hw
    )
    paths = sorted(
        os.path.join(TARGET_DIR, f) for f in os.listdir(TARGET_DIR)
        if f.lower().endswith((".jpg", ".png", ".jpeg"))
    )
    target_frames = jnp.asarray(preprocess_target_images(paths, hw))

    trainer = DyNCATrainer(nca_cfg, loss_cfg, train_cfg,
                           vgg_params=vgg, msoe_params=msoe)
    rng = np.random.RandomState(424)
    log = RunLog(out_dir)
    for i in range(iters):
        idx = rng.choice(target_frames.shape[0], train_cfg.batch_size,
                         replace=True)
        aux = target_frames[jnp.asarray(idx)]
        inputs = {
            "target_style": style,
            "target_style_features": feats,
            "aux_imgs": aux,
            "aux_gs": jnp.mean(aux, axis=-1, keepdims=True),
        }
        sync = i % 25 == 0 or i == iters - 1
        tl = trainer.train_iteration(inputs, sync=sync)
        if sync:
            log.log(i, tl.loss, tl.logs)

    # stylize the reference's held-out evaluation clip + control videos
    from vsnca_tpu.data.preprocess import preprocess_video
    from vsnca_tpu.infer.stylize import stylize_frames

    eval_frames = preprocess_video(EVAL_GIF, hw, max_frames=24)
    styl = list(stylize_frames(trainer.params, nca_cfg, eval_frames,
                               step_n=loss_cfg.nca_base_num_steps))
    save_gif(os.path.join(out_dir, "mr-bean_stylized.gif"), styl, fps=10)
    save_gif(os.path.join(out_dir, "mr-bean_input.gif"),
             [(f + 1.0) / 2.0 for f in np.asarray(eval_frames)], fps=10)
    save_png(os.path.join(out_dir, "style_target.png"),
             np.asarray((style[0] + 1.0) / 2.0))
    # content-vs-output still
    save_png(os.path.join(out_dir, "eval_frame12_stylized.png"),
             styl[min(12, len(styl) - 1)])
    return log.finish(preset=preset_name, style_image=STYLE_IMG2,
                      target_images=paths, eval_video=EVAL_GIF,
                      rollout_path=trainer._rollout_path)


def run_extra_channels(out_dir, iters):
    return _run_conditioned("extra_channels", out_dir, iters)


def run_edge_conditioned(out_dir, iters):
    return _run_conditioned("edge_conditioned", out_dir, iters)


def run_encoder(out_dir, iters):
    import jax
    import jax.numpy as jnp

    from vsnca_tpu.config import ConditionedNCAConfig
    from vsnca_tpu.data.dataset import ConditioningDataset
    from vsnca_tpu.data.preprocess import preprocess_style_image
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.encoder_trainer import ConditionedNCATrainer
    from vsnca_tpu.utils.display import save_image_grid

    s = SIZES["encoder"]
    dataset = ConditioningDataset.from_folder(TARGET_DIR, s)
    style = jnp.asarray(preprocess_style_image(STYLE_IMG2, (s, s), 1))
    vgg, _ = load_vgg16()
    cfg = ConditionedNCAConfig(image_size=s)
    trainer = ConditionedNCATrainer(
        cfg, dataset, style, vgg, nca_steps=(48, 96), step_buckets=(64, 96),
        pool_size=1024, appearance_loss_type="OT",
        appearance_weight=1.0, content_weight=0.1, overflow_weight=1.0,
        # Alive-masked NCAs can fall into the absorbing all-dead attractor
        # (observed twice in r4 hardware runs: loss plateaus at the
        # style-vs-black constant, grown goals go blank); the trainer's
        # collapse recovery restores the best params + reseeds the pool
        # after 50 consecutive epochs above 3x the best loss.
        recovery_patience=50, recovery_factor=3.0,
    )
    log = RunLog(out_dir)
    for i in range(iters):
        loss, metrics = trainer.train_iteration(batch_size=8)
        if i % 25 == 0 or i == iters - 1 or metrics.get("recovered"):
            log.log(i, loss, {k: v for k, v in metrics.items()
                              if k != "log10loss"})

    goals = dataset.images[: min(4, dataset.images.shape[0])]
    grown = np.asarray(trainer.grow_preview(goals, num_steps=96))
    save_image_grid(grown, os.path.join(out_dir, "grown_goals.png"))
    final_params = trainer.params
    trainer.params = jax.tree_util.tree_map(jnp.asarray, trainer._best_params)
    grown_best = np.asarray(trainer.grow_preview(goals, num_steps=96))
    trainer.params = final_params
    save_image_grid(grown_best, os.path.join(out_dir, "grown_goals_best.png"))
    save_image_grid(np.asarray(goals),
                    os.path.join(out_dir, "goal_images.png"))
    return log.finish(preset="encoder", style_image=STYLE_IMG2,
                      image_dir=TARGET_DIR, image_size=s,
                      best_loss_iteration=trainer.best_iteration,
                      best_loss=trainer.best_loss,
                      recoveries=trainer.recoveries)


RUNNERS = {
    "static_texture": (run_static_texture, 2000),
    "vector_field_motion": (run_vector_field, 2000),
    "video_motion": (run_video_motion, 2000),
    "extra_channels": (run_extra_channels, 1000),
    "edge_conditioned": (run_edge_conditioned, 1000),
    "encoder": (run_encoder, 2000),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default=",".join(RUNNERS))
    ap.add_argument("--scale", type=float, default=1.0,
                    help="multiply every preset's iteration budget")
    ap.add_argument("--out-root", default="assets/runs")
    ap.add_argument("--smoke", action="store_true",
                    help="64px everywhere + ~10 iters: full-script CPU "
                         "validation pass")
    args = ap.parse_args()
    if args.smoke:
        for k in SIZES:
            SIZES[k] = 64
        args.scale = min(args.scale, 0.005)

    import jax

    # Honor JAX_PLATFORMS even on images whose sitecustomize registers the
    # TPU plugin regardless of env (CLAUDE.md) — needed for CPU smokes.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # One trivial jit first: the fresh-process axon warmup (3-7 min) should
    # not be attributed to the first preset's compile column.
    t0 = time.time()
    # host fetch, not block_until_ready (which does not block on axon)
    np.asarray(jax.jit(lambda x: x + 1)(jax.numpy.ones(())))
    print(f"process warmup: {time.time() - t0:.1f}s on "
          f"{jax.default_backend()}", flush=True)

    results = {}
    for name in args.presets.split(","):
        fn, default_iters = RUNNERS[name]
        iters = max(int(default_iters * args.scale), 10)
        out_dir = os.path.join(args.out_root, name)
        print(f"\n===== {name}: {iters} iterations -> {out_dir}", flush=True)
        # one retry per preset: the axon remote-compile helper transiently
        # drops connections ("response body closed before all bytes were
        # read"); the second attempt usually resumes from the persistent
        # compilation cache.
        for attempt in (1, 2):
            try:
                results[name] = fn(out_dir, iters)
                print(f"===== {name} OK: {json.dumps(results[name])[:400]}",
                      flush=True)
                break
            except Exception as e:
                traceback.print_exc()
                results[name] = {"error": repr(e), "attempt": attempt}
                os.makedirs(out_dir, exist_ok=True)
                with open(os.path.join(out_dir, "summary.json"), "w") as f:
                    json.dump(results[name], f)
                if attempt == 1:
                    print(f"===== {name} attempt 1 failed; retrying",
                          flush=True)
                    time.sleep(30)
    # Merge into any existing aggregate so a single-preset rerun doesn't
    # drop the other presets' entries.
    agg_path = os.path.join(args.out_root, "all_runs.json")
    merged = {}
    if os.path.exists(agg_path):
        try:
            with open(agg_path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    merged.update(results)
    with open(agg_path, "w") as f:
        json.dump(merged, f, indent=2)
    print("\nALL DONE", json.dumps({k: ("ok" if "error" not in v else "ERR")
                                    for k, v in results.items()}))


if __name__ == "__main__":
    main()
