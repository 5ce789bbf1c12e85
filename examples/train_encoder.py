#!/usr/bin/env python
"""Encoder-conditioned multi-style training (BASELINE config 5) with
preview grids (train.ipynb / visualisation.ipynb equivalent).

Example:
    python examples/train_encoder.py --image-dir goals/ --style style.jpg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-dir", default=None)
    p.add_argument("--style", default="synthetic")
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=5000)
    p.add_argument("--out", default="out/encoder")
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

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
    from vsnca_tpu.utils.display import save_image_grid

    s = args.image_size
    if args.image_dir:
        dataset = ConditioningDataset.from_folder(args.image_dir, s)
    else:
        dataset = ConditioningDataset((np.asarray(synthetic_video((s, s), 8)) + 1.0) / 2.0)
    style = jnp.asarray(
        synthetic_style_image((s, s), 1)
        if args.style == "synthetic"
        else preprocess_style_image(args.style, (s, s), 1)
    )

    vgg, _ = load_vgg16()
    cfg = ConditionedNCAConfig(image_size=s)
    trainer = ConditionedNCATrainer(cfg, dataset, style, vgg,
                                    content_weight=0.1)

    for i in range(args.epochs):
        loss, metrics = trainer.train_iteration(batch_size=8)
        if i % 50 == 0:
            print(f"epoch {i} loss={loss:.4f}")
            goals = dataset.sample(np.random.RandomState(i), 4)
            preview = trainer.grow_preview(goals)
            save_image_grid(
                np.asarray(preview),
                os.path.join(args.out, f"preview_{i}.png"),
            )

    save_checkpoint(os.path.join(args.out, "checkpoint"),
                    {"params": trainer.params, "iteration": trainer.iteration})


if __name__ == "__main__":
    main()
