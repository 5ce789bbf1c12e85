"""Training CLI — the TPU-native counterpart of the reference entry points
(ConditioneDyNCA/experiments.py, ExtraChannels/experiments.py,
fit_vector_field_motion.py, fit_video_motion.py).

Usage:
    python -m vsnca_tpu.train.cli --preset static_texture \
        [--style-image path | synthetic] [--target-images dir] \
        [--max-iterations N] [--img-size S] [--out out/run1]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax.numpy as jnp
import numpy as np


def setup_args():
    p = argparse.ArgumentParser(description="vsnca_tpu trainer")
    p.add_argument("--preset", default="static_texture",
                   choices=["static_texture", "vector_field_motion",
                            "video_motion", "extra_channels", "edge_conditioned"])
    p.add_argument("--style-image", default="synthetic",
                   help="style image path, or 'synthetic'")
    p.add_argument("--target-images", default=None,
                   help="folder of content/conditioning frames (conditioned presets)")
    p.add_argument("--target-video", default=None,
                   help="target dynamics video (video_motion preset)")
    p.add_argument("--motion-field", default="circular")
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--max-iterations", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--save-every", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="out/run")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--video-only", action="store_true",
                   help="skip training: load --checkpoint and only generate "
                        "videos (fit_video_motion.py --video_only parity)")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir to resume/load")
    p.add_argument("--make-videos", action="store_true",
                   help="after training: control videos + stylize "
                        "--eval-videos folder (experiments.py:305-312)")
    p.add_argument("--eval-videos", default=None,
                   help="folder of mp4/gif to stylize post-training")
    p.add_argument("--dp", type=int, default=0, metavar="N",
                   help="data-parallel training over N devices (0 = single "
                        "device). Requires batch_size %% N == 0; gradients "
                        "are all-reduced over the mesh by XLA.")
    p.add_argument("--no-precompute", action="store_true",
                   help="disable target-feature precompute (recompute VGG/"
                        "MSOE target features every iteration, as the "
                        "reference does)")
    return p.parse_args()


def main():
    args = setup_args()

    # Persistent compilation cache: repeated runs (and step-length buckets)
    # reuse compiled programs across processes.
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # Honor an explicit JAX_PLATFORMS request even on images whose
    # sitecustomize registers a preferred plugin regardless of env vars
    # (needed for --dp testing on a virtual CPU mesh; see CLAUDE.md).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass

    from vsnca_tpu.data.preprocess import (
        preprocess_style_image,
        preprocess_target_images,
        preprocess_video,
        rgb_to_grayscale_mean,
        synthetic_style_image,
        synthetic_video,
    )
    from vsnca_tpu.export.checkpoint import save_checkpoint
    from vsnca_tpu.models.msoe import load_msoe
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.presets import PRESETS
    from vsnca_tpu.train.trainer import DyNCATrainer

    preset_kwargs = {}
    if args.img_size:
        preset_kwargs["img_size"] = args.img_size
    if args.preset == "vector_field_motion":
        preset_kwargs["field"] = args.motion_field
    nca_cfg, loss_cfg, train_cfg = PRESETS[args.preset](**preset_kwargs)

    overrides = {}
    if args.max_iterations is not None:
        overrides["max_iterations"] = args.max_iterations
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.lr is not None:
        overrides["lr"] = args.lr
    if args.save_every is not None:
        overrides["save_every"] = args.save_every
    overrides["seed"] = args.seed
    train_cfg = dataclasses.replace(train_cfg, **overrides)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "args.json"), "w") as f:
        json.dump(
            {
                "cli": vars(args),
                "nca": dataclasses.asdict(nca_cfg),
                "loss": dataclasses.asdict(loss_cfg),
                "train": dataclasses.asdict(train_cfg),
            },
            f, indent=2,
        )

    # --- data ---
    hw = train_cfg.img_size
    if args.style_image == "synthetic":
        style = synthetic_style_image(hw, train_cfg.batch_size)
    else:
        style = preprocess_style_image(args.style_image, hw, train_cfg.batch_size)
    style = jnp.asarray(style * 2.0 - 1.0)

    target_frames = None
    if args.target_images:
        paths = sorted(
            os.path.join(args.target_images, f)
            for f in os.listdir(args.target_images)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        target_frames = jnp.asarray(preprocess_target_images(paths, hw))
    elif args.preset in ("extra_channels", "edge_conditioned"):
        target_frames = jnp.asarray(synthetic_video(hw, 8) )

    target_video = None
    if args.target_video:
        target_video = jnp.asarray(preprocess_video(args.target_video, hw))
    elif args.preset == "video_motion":
        target_video = jnp.asarray(synthetic_video(hw, 16))

    # --- video-only mode: load checkpoint, generate videos, exit ---
    if args.video_only:
        from vsnca_tpu.export.checkpoint import load_checkpoint
        from vsnca_tpu.utils.video_writer import (
            evaluate_folder_of_videos,
            generate_control_videos,
        )

        assert args.checkpoint, "--video-only requires --checkpoint"
        params = load_checkpoint(args.checkpoint)["params"]
        video_dir = os.path.join(args.out, "videos")
        generate_control_videos(
            video_dir, params, nca_cfg, np.asarray((style[0] + 1.0) / 2.0),
            step_n=loss_cfg.nca_base_num_steps,
        )
        if args.eval_videos:
            evaluate_folder_of_videos(
                args.eval_videos, video_dir, params, nca_cfg, hw,
                step_n=loss_cfg.nca_base_num_steps,
            )
        print(f"videos written to {video_dir}")
        return

    # --- feature extractors ---
    vgg, vgg_pretrained = load_vgg16()
    msoe = None
    if loss_cfg.vector_field_motion_weight or loss_cfg.video_motion_weight:
        msoe, msoe_pretrained = load_msoe()
        print(f"MSOE weights: {'pretrained' if msoe_pretrained else 'RANDOM FALLBACK'}")
    print(f"VGG16 weights: {'pretrained' if vgg_pretrained else 'RANDOM FALLBACK'}")

    mesh = None
    if args.dp:
        from vsnca_tpu.parallel.mesh import make_mesh

        devices = jax.devices()
        assert len(devices) >= args.dp, (
            f"--dp {args.dp} but only {len(devices)} devices visible "
            "(for CPU testing set XLA_FLAGS=--xla_force_host_platform_"
            "device_count=N JAX_PLATFORMS=cpu)"
        )
        mesh = make_mesh({"data": args.dp}, devices[: args.dp])
        print(f"data-parallel mesh: {args.dp}x {devices[0].platform}")

    trainer = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg,
                           msoe_params=msoe, mesh=mesh)
    from vsnca_tpu.models.dynca import param_count

    print(f"DyNCA param count: {param_count(trainer.params)}")

    from vsnca_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(args.out, config={"preset": args.preset})

    # Target-side features are constant across iterations — extract once
    # (gradient-identical to the reference's per-iteration no_grad recompute).
    style_feats = None
    motion_feats = None
    if loss_cfg.appearance_weight and not args.no_precompute:
        from vsnca_tpu.losses.appearance import precompute_target_style_features

        style_feats = precompute_target_style_features(
            vgg, style, loss_cfg.appearance_loss_type, hw
        )
    if (loss_cfg.video_motion_weight and msoe is not None
            and not args.no_precompute):
        from vsnca_tpu.losses.video_motion import (
            precompute_target_motion_features,
        )

        # The helper enforces the HBM budget itself (None past it — a long
        # video would OOM at startup; we then recompute per window).
        motion_feats = precompute_target_motion_features(
            msoe, target_video, loss_cfg.motion_img_size
        )
        if motion_feats is None:
            print("[vsnca_tpu] skipping motion-feature precompute: video "
                  "too long for the HBM budget; recomputing per window")

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    for i in range(train_cfg.max_iterations):
        inputs = {"target_style": style}
        if style_feats is not None:
            inputs["target_style_features"] = style_feats
        if target_frames is not None:
            idx = rng.choice(target_frames.shape[0], train_cfg.batch_size,
                             replace=True)
            aux = target_frames[jnp.asarray(idx)]
            inputs["aux_imgs"] = aux
            inputs["aux_gs"] = jnp.mean(aux, axis=-1, keepdims=True)

        iter_kw = {}
        if loss_cfg.video_motion_weight:
            # Reference tap schedule (fit_video_motion.py:229-235): frames
            # after steps 1, 65, ... of a step_n-step rollout + frameless
            # tail; 2-3 frames for the default [80,144) step range.
            from vsnca_tpu.models.dynca import tap_schedule

            step_n = max(trainer.sample_step_n(), 65)  # >= 2 tapped frames
            chunks, tail = tap_schedule(step_n, 64)
            nf = len(chunks)
            iter_kw = dict(step_n=step_n, tap_chunks=chunks, tail_steps=tail)
            start = rng.randint(0, max(target_video.shape[0] - nf, 1))
            if motion_feats is not None:
                inputs["target_motion_features"] = motion_feats[
                    start : start + nf - 1
                ]
            else:
                inputs["target_motion_frames"] = jnp.stack(
                    [
                        jnp.broadcast_to(
                            target_video[start + k],
                            (train_cfg.batch_size,) + target_video.shape[1:],
                        )
                        for k in range(nf)
                    ]
                )

        sync = (i % args.log_every == 0) or (i == train_cfg.max_iterations - 1)
        log = trainer.train_iteration(inputs, sync=sync, **iter_kw)

        if sync and i % args.log_every == 0:
            rate = (i + 1) / (time.time() - t0)
            terms = " ".join(f"{k}={v:.4f}" for k, v in log.logs.items())
            print(f"iter {i:5d} loss={log.loss:.4f} {terms} ({rate:.2f} it/s)")
            logger.log_scalars(i, {"loss": log.loss, "it_per_sec": rate,
                                   **log.logs})

        if train_cfg.save_every and i % train_cfg.save_every == 0:
            # visual artifact dump (SURVEY.md §4: the reference's test strategy)
            from vsnca_tpu.models.dynca import dynca_rollout, dynca_seed, make_conditioning
            from vsnca_tpu.utils.display import save_train_artifacts

            seed_img = dynca_seed(nca_cfg, 1, hw, key=jnp.asarray([0, 1], jnp.uint32))
            if nca_cfg.n_seed_channels < nca_cfg.c_in:
                seed_img = jnp.concatenate(
                    [seed_img, inputs.get("aux_gs", jnp.zeros(seed_img.shape[:3] + (1,)))[:1]],
                    axis=-1,
                )
            cond_p = make_conditioning(
                nca_cfg, hw,
                cond_img=inputs.get("aux_gs", jnp.zeros((1,) + hw + (1,)))[:1]
                if nca_cfg.conditioning == "edges" else None,
                batch=1,
            )
            _, preview = dynca_rollout(
                trainer.params, seed_img, jnp.asarray([0, 2], jnp.uint32),
                nca_cfg, 64, cond=cond_p, remat="none",
            )
            save_train_artifacts(
                os.path.join(args.out, "artifacts"), i,
                generated=np.asarray((jnp.clip(preview, -1, 1) + 1) / 2),
                loss_log=[h.loss for h in trainer.history],
            )
            save_checkpoint(
                os.path.join(args.out, "checkpoint"),
                {
                    "params": trainer.params,
                    "opt_state": trainer.opt_state,
                    "pool": trainer.pool.states,
                    "iteration": trainer.iteration,
                },
                metadata={"nca": dataclasses.asdict(nca_cfg)},
            )

    save_checkpoint(
        os.path.join(args.out, "checkpoint"),
        {
            "params": trainer.params,
            "opt_state": trainer.opt_state,
            "pool": trainer.pool.states,
            "iteration": trainer.iteration,
        },
        metadata={"nca": dataclasses.asdict(nca_cfg)},
    )
    print(f"done: {trainer.iteration} iterations, final loss {trainer.history[-1].loss:.4f}")

    if args.make_videos:
        from vsnca_tpu.utils.video_writer import (
            evaluate_folder_of_videos,
            generate_control_videos,
        )

        video_dir = os.path.join(args.out, "videos")
        generate_control_videos(
            video_dir, trainer.params, nca_cfg,
            np.asarray((style[0] + 1.0) / 2.0),
            step_n=loss_cfg.nca_base_num_steps,
        )
        if args.eval_videos:
            evaluate_folder_of_videos(
                args.eval_videos, video_dir, trainer.params, nca_cfg, hw,
                step_n=loss_cfg.nca_base_num_steps,
            )
        print(f"videos written to {video_dir}")


if __name__ == "__main__":
    main()
