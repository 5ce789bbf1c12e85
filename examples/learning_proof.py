#!/usr/bin/env python
"""One-command reproduction of the committed visual learning proof
(assets/demo/): train the ExtraChannels variant with the MSE auxiliary loss
to reproduce video content through its grayscale conditioning channel, then
stylize an UNSEEN drifting test video with the persistent-state stylizer and
write the three demo artifacts.

Runs on whatever backend JAX selects (the real TPU under axon; CPU with
JAX_PLATFORMS=cpu). Defaults reproduce assets/demo (256 px, 800 iters,
~50 s of train time on one v5e after the first-compile warmup):

    python examples/learning_proof.py --out assets/demo
    python examples/learning_proof.py --size 32 --iters 150   # CPU-sized
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--fc-dim", type=int, default=96)
    ap.add_argument("--out", default="out/learning_proof")
    ap.add_argument("--test-frames", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vsnca_tpu.config import LossConfig, NCAConfig, TrainConfig
    from vsnca_tpu.data.preprocess import synthetic_video
    from vsnca_tpu.infer.stylize import VideoStylizer
    from vsnca_tpu.train.trainer import DyNCATrainer
    from vsnca_tpu.utils.display import plot_losses, to_uint8

    os.makedirs(args.out, exist_ok=True)
    s = args.size
    nca = NCAConfig(c_in=13, seed_channels=12, fc_dim=args.fc_dim,
                    padding_mode="circular")
    loss = LossConfig(overflow_weight=100.0, auxiliary_weight=10.0,
                      auxiliary_loss_type="MSE")
    train = TrainConfig(
        img_size=(s, s), batch_size=4, pool_size=64,
        step_range=(16, 49), step_buckets=(16, 32, 48), inject_seed_every=8,
        lr=2e-3, lr_decay_steps=(max(args.iters // 2, 1),),
        max_iterations=args.iters,
    )
    trainer = DyNCATrainer(nca, loss, train)
    video = jnp.asarray(synthetic_video((s, s), 8))
    rng = np.random.RandomState(0)

    losses = []
    t0 = time.time()
    for i in range(args.iters):
        idx = rng.choice(8, train.batch_size)
        aux = video[jnp.asarray(idx)]
        inputs = {"aux_imgs": aux, "aux_gs": jnp.mean(aux, -1, keepdims=True)}
        sync = i % 25 == 0 or i == args.iters - 1
        log = trainer.train_iteration(inputs, sync=sync)
        if sync:
            losses.append(log.loss)
            print(f"iter {i:5d} loss={log.loss:.4f} "
                  f"({(i + 1) / (time.time() - t0):.1f} it/s)", flush=True)
    plot_losses(losses, os.path.join(args.out, "training_loss.png"))

    # --- inference on UNSEEN content (persistent-state stylizer) ---
    styl = VideoStylizer(trainer.params, nca, s, step_n=24)
    test = synthetic_video((s, s), args.test_frames, seed=3)
    rows, gif_frames, errs = [], [], []
    for f in test:
        out = np.asarray(styl.step_frame(jnp.asarray(f)[None]))[0]
        content = (f + 1.0) / 2.0
        err = np.abs(out - content)
        errs.append(float((err ** 2).mean()))
        rows.append(np.concatenate(
            [content, out, np.clip(err * 4.0, 0, 1)], axis=1))
        gif_frames.append(np.concatenate([content, out], axis=1))
    grid = to_uint8(np.concatenate(rows, axis=0))
    Image.fromarray(grid).save(
        os.path.join(args.out, "content_output_error.png"))
    frames = [Image.fromarray(to_uint8(g)) for g in gif_frames]
    frames[0].save(
        os.path.join(args.out, "content_vs_output.gif"), save_all=True,
        append_images=frames[1:], duration=250, loop=0)

    baseline = float((((test[-1] + 1) / 2 - 0.5) ** 2).mean())
    print(f"final train loss {losses[-1]:.4g}; unseen-content MSE "
          f"{errs[-1]:.4g} (gray baseline {baseline:.4g})")
    print(f"artifacts in {args.out}/")
    if errs[-1] >= baseline * 0.25:
        print("WARNING: generalization below the committed demo quality")


if __name__ == "__main__":
    main()
