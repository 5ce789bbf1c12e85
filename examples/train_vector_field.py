#!/usr/bin/env python
"""Train a DyNCA on a style image with a synthetic vector-field motion
target (BASELINE config 2), then roll a control video.

Example:
    python examples/train_vector_field.py --style style.jpg \
        --field circular --iterations 2000 --out out/vf
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--style", default="synthetic")
    p.add_argument("--field", default="circular")
    p.add_argument("--img-size", type=int, default=128)
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--out", default="out/vector_field")
    args = p.parse_args()

    import jax.numpy as jnp

    from vsnca_tpu.data.preprocess import preprocess_style_image, synthetic_style_image
    from vsnca_tpu.export.checkpoint import save_checkpoint
    from vsnca_tpu.models.msoe import load_msoe
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.presets import vector_field_motion
    from vsnca_tpu.train.trainer import DyNCATrainer
    from vsnca_tpu.utils.logging import MetricsLogger
    from vsnca_tpu.utils.video_writer import generate_control_videos

    nca_cfg, loss_cfg, train_cfg = vector_field_motion(args.img_size, args.field)
    import dataclasses

    train_cfg = dataclasses.replace(train_cfg, max_iterations=args.iterations)

    hw = train_cfg.img_size
    if args.style == "synthetic":
        style01 = synthetic_style_image(hw, train_cfg.batch_size)
    else:
        style01 = preprocess_style_image(args.style, hw, train_cfg.batch_size)
    style = jnp.asarray(style01 * 2.0 - 1.0)

    vgg, _ = load_vgg16()
    msoe, _ = load_msoe()
    trainer = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg,
                           msoe_params=msoe)
    logger = MetricsLogger(args.out)

    for i in range(train_cfg.max_iterations):
        log = trainer.train_iteration({"target_style": style})
        if i % 10 == 0:
            logger.log_scalars(i, {"loss": log.loss, **log.logs})
            print(f"iter {i} loss={log.loss:.4f}")

    save_checkpoint(os.path.join(args.out, "checkpoint"),
                    {"params": trainer.params, "iteration": trainer.iteration})
    generate_control_videos(
        os.path.join(args.out, "videos"), trainer.params, nca_cfg,
        style01[0], step_n=loss_cfg.nca_base_num_steps,
    )
    logger.close()


if __name__ == "__main__":
    main()
