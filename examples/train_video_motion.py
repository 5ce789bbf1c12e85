#!/usr/bin/env python
"""Dynamic-texture video fit with the full fit_video_motion protocol
(BASELINE config 3): warmup → motion-weight calibration → reinit → main
phase → quantitative eval.

Example:
    python examples/train_video_motion.py --video flames.mp4 --out out/vm
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default="synthetic")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--iterations", type=int, default=5000)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--out", default="out/video_motion")
    args = p.parse_args()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from vsnca_tpu.data.preprocess import (
        compute_flow_strengths,
        preprocess_video,
        select_appearance_frame,
        synthetic_video,
    )
    from vsnca_tpu.export.checkpoint import save_checkpoint
    from vsnca_tpu.models.msoe import load_msoe
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.presets import video_motion
    from vsnca_tpu.train.video_motion_protocol import (
        VideoMotionProtocol,
        synthesize_and_score,
    )

    nca_cfg, loss_cfg, train_cfg = video_motion(args.img_size)
    train_cfg = dataclasses.replace(train_cfg, max_iterations=args.iterations)

    hw = train_cfg.img_size
    if args.video == "synthetic":
        video = synthetic_video(hw, 16)
        img_name = None
    else:
        video = preprocess_video(args.video, hw)
        img_name = os.path.basename(args.video).split(".")[0]
    video = jnp.asarray(video)

    vgg, _ = load_vgg16()
    msoe, _ = load_msoe()

    # appearance frame = max-flow-strength frame (preprocess_texture.py:116-149)
    strengths = compute_flow_strengths(msoe, video)
    frame_idx = select_appearance_frame(strengths)
    style = jnp.broadcast_to(
        video[frame_idx], (train_cfg.batch_size,) + video.shape[1:]
    )
    print(f"appearance frame: {frame_idx} (of {video.shape[0]})")

    proto = VideoMotionProtocol(
        nca_cfg, loss_cfg, train_cfg, video, style,
        warmup_iters=args.warmup, img_name=img_name,
    )
    trainer = proto.run(
        vgg, msoe,
        callback=lambda ph, i, log: print(f"[{ph}] {i} loss={log.loss:.4f}"),
    )

    save_checkpoint(os.path.join(args.out, "checkpoint"),
                    {"params": trainer.params, "iteration": trainer.iteration})
    scores = synthesize_and_score(trainer, video, args.out)
    print("final eval:", scores)


if __name__ == "__main__":
    main()
