"""EncoderConditioning training CLI (parity: EncoderConditioning/train.py).

Usage:
    python -m vsnca_tpu.train.encoder_cli --image-dir data/targets \
        --style-image style.jpg --epochs 1000 --out out/enc_run
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
    p = argparse.ArgumentParser(description="vsnca_tpu encoder-conditioned trainer")
    p.add_argument("--image-dir", default=None,
                   help="conditioning image folder; default synthetic")
    p.add_argument("--style-image", default="synthetic")
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--num-hidden-channels", type=int, default=16)
    p.add_argument("--epochs", type=int, default=100_000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--pool-size", type=int, default=1024)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--num-damaged", type=int, default=0)
    p.add_argument("--damage-radius", type=int, default=3)
    p.add_argument("--appearance-loss-type", default="OT")
    p.add_argument("--appearance-loss-weight", type=float, default=1.0)
    p.add_argument("--content-loss-weight", type=float, default=0.1)
    p.add_argument("--overflow-loss-weight", type=float, default=1.0)
    p.add_argument("--min-steps", type=int, default=48)
    p.add_argument("--max-steps", type=int, default=96)
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="out/encoder_run")
    return p.parse_args()


def main():
    args = setup_args()

    from vsnca_tpu.config import ConditionedNCAConfig
    from vsnca_tpu.data.dataset import ConditioningDataset
    from vsnca_tpu.data.preprocess import (
        preprocess_style_image,
        synthetic_style_image,
        synthetic_video,
    )
    from vsnca_tpu.export.checkpoint import save_checkpoint
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.encoder_trainer import ConditionedNCATrainer

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    s = args.image_size
    if args.image_dir:
        dataset = ConditioningDataset.from_folder(args.image_dir, s)
    else:
        dataset = ConditioningDataset((np.asarray(synthetic_video((s, s), 8)) + 1.0) / 2.0)
    if args.style_image == "synthetic":
        style = jnp.asarray(synthetic_style_image((s, s), 1))
    else:
        style = jnp.asarray(preprocess_style_image(args.style_image, (s, s), 1))

    vgg, pretrained = load_vgg16()
    print(f"VGG16 weights: {'pretrained' if pretrained else 'RANDOM FALLBACK'}")

    cfg = ConditionedNCAConfig(
        image_size=s, num_hidden_channels=args.num_hidden_channels
    )
    trainer = ConditionedNCATrainer(
        cfg, dataset, style, vgg,
        nca_steps=(args.min_steps, args.max_steps),
        lr=args.lr, pool_size=args.pool_size,
        num_damaged=args.num_damaged, damage_radius=args.damage_radius,
        appearance_loss_type=args.appearance_loss_type,
        appearance_weight=args.appearance_loss_weight,
        content_weight=args.content_loss_weight,
        overflow_weight=args.overflow_loss_weight,
        seed=args.seed,
    )

    def save(tag="checkpoint"):
        save_checkpoint(
            os.path.join(args.out, tag),
            {
                "params": trainer.params,
                "opt_state": trainer.opt_state,
                "iteration": trainer.iteration,
            },
            metadata={"cfg": dataclasses.asdict(cfg)},
        )

    t0 = time.time()
    try:
        for i in range(args.epochs):
            loss, metrics = trainer.train_iteration(batch_size=args.batch_size)
            if i % args.log_every == 0:
                rate = (i + 1) / (time.time() - t0)
                terms = " ".join(
                    f"{k}={v:.4f}" for k, v in metrics.items() if k != "log10loss"
                )
                print(f"epoch {i:6d} loss={loss:.4f} {terms} ({rate:.2f} it/s)")
            if args.save_every and i and i % args.save_every == 0:
                save()
    except (KeyboardInterrupt, FloatingPointError) as e:
        # crash-resilient checkpoint (train.py:131-137)
        print(f"{type(e).__name__}: {e}; saving latest checkpoint...")
    save()
    print(f"done at epoch {trainer.iteration}")


if __name__ == "__main__":
    main()
