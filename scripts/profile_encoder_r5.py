"""Marginal costs of the EncoderConditioning training iteration (r5).

The encoder trainer (train/encoder_trainer.py) was never profiled; at
BENCH_r04 it runs 1.99 it/s (~500 ms/iter) at 64px batch 8 — ~25x slower
per-iteration than static texture at 128px. Hypotheses to split:

- HOST<->DEVICE POOL TRAFFIC: every iteration uploads the sampled batch
  (8x64x64x20 fp32 = 2.6 MB) and fetches the grown outputs back for the
  host ListPool (another 2.6 MB) over the ~13 MB/s axon tunnel => ~400 ms
  of pure transfer if the tunnel is the path.
- DISPATCH FLOOR: 2 jit dispatches (train-twice) + scalar fetch + output
  fetch, ~29 ms floor each.
- COMPUTE: 64 grow steps (b8 64px c20) + VGG OT appearance + VGG content
  + overflow, forward+backward, TWICE.

Method: production-depth chained loops (dispatches queue, one fence at the
end), per-term loss ablations via zero weights (make_encoder_loss_fn drops
zero-weight subgraphs at trace time), and an explicit transfer micro-bench.
Not part of the library — a dev tool.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _fence(x):
    return float(np.asarray(jax.device_get(jnp.sum(x))))


def main():
    import os

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    _fence(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    print(f"warmup jit: {time.perf_counter()-t0:.1f}s", flush=True)

    from vsnca_tpu.config import ConditionedNCAConfig
    from vsnca_tpu.data.dataset import ConditioningDataset
    from vsnca_tpu.data.preprocess import synthetic_video, synthetic_style_image
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.encoder_trainer import ConditionedNCATrainer

    cfg = ConditionedNCAConfig(image_size=64)
    dataset = ConditioningDataset(
        (np.asarray(synthetic_video((64, 64), 8)) + 1.0) / 2.0
    )
    style = jnp.asarray(synthetic_style_image((64, 64), 1))
    vgg, _ = load_vgg16()

    def make_trainer(**kw):
        kw.setdefault("step_buckets", (64,))
        return ConditionedNCATrainer(
            cfg, dataset, style, vgg, pool_size=64, **kw
        )

    import os
    ITERS = int(os.environ.get("PROF_ITERS", "8"))
    out = {}

    # ---- production path (host ListPool io cycle), the BENCH_r04 number
    tr = make_trainer()
    tr.train_iteration(batch_size=8, num_steps=64)
    tr.train_iteration(batch_size=8, num_steps=64)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        tr.train_iteration(batch_size=8, num_steps=64)
    out["production_ms"] = 1000 * (time.perf_counter() - t0) / ITERS
    print(f"production (io cycle): {out['production_ms']:.1f} ms/iter",
          flush=True)

    # ---- device-resident chained loops: batch never leaves the device ----
    rng = np.random.RandomState(0)
    targets = dataset.sample(rng, 8)
    key = jax.random.PRNGKey(1)

    def chained(trainer, n_steps_per_iter, iters=ITERS, num_steps=64):
        """iters x (n steps) with params/opt/batch threaded device-side;
        single fence at the end. Returns ms per ITERATION."""
        step = trainer._train_batch_fn(num_steps)
        from vsnca_tpu.models.conditioned_nca import conditioned_nca_seed

        batch = conditioned_nca_seed(trainer.cfg, 8)
        params, opt_state = trainer.params, trainer.opt_state
        k = jax.random.PRNGKey(2)
        # warm compile + one settle run
        for _ in range(2):
            p, o, b = params, opt_state, batch
            for _ in range(n_steps_per_iter):
                k, sub = jax.random.split(k)
                p, o, b, loss, _ = step(p, o, b, targets, sub)
            _fence(loss)
        t0 = time.perf_counter()
        p, o, b = params, opt_state, batch
        for _ in range(iters):
            for _ in range(n_steps_per_iter):
                k, sub = jax.random.split(k)
                p, o, b, loss, _ = step(p, o, b, targets, sub)
        _fence(loss)
        return 1000 * (time.perf_counter() - t0) / iters

    tr = make_trainer()
    out["device_x2_ms"] = chained(tr, 2)
    print(f"device-resident, train-twice: {out['device_x2_ms']:.1f} ms/iter",
          flush=True)
    out["device_x1_ms"] = chained(tr, 1)
    print(f"device-resident, single step: {out['device_x1_ms']:.1f} ms/iter",
          flush=True)
    out["pool_io_marginal_ms"] = out["production_ms"] - out["device_x2_ms"]

    # ---- loss-term marginals (zero weight drops the subgraph) ----
    for name, kw in [
        ("no_appearance", dict(appearance_weight=0.0)),
        ("no_content", dict(content_weight=0.0)),
        ("no_overflow", dict(overflow_weight=0.0)),
        ("rollout_only", dict(appearance_weight=0.0, content_weight=0.0,
                              overflow_weight=0.0)),
        ("appearance_gram", dict(appearance_loss_type="Gram")),
    ]:
        ms = chained(make_trainer(**kw), 2)
        out[f"{name}_ms"] = ms
        print(f"{name}: {ms:.1f} ms/iter", flush=True)

    # ---- grow-step scaling: 32 vs 64 steps (per-NCA-step cost) ----
    out["device_x2_s32_ms"] = chained(make_trainer(step_buckets=(32,)), 2,
                                      num_steps=32)
    print(f"device-resident x2, 32 grow steps: "
          f"{out['device_x2_s32_ms']:.1f} ms/iter", flush=True)

    # ---- BPTT remat A/B: live activations vs per-step recompute ----
    out["device_x2_remat_none_ms"] = chained(
        make_trainer(grow_remat="none"), 2
    )
    print(f"device-resident x2, remat=none: "
          f"{out['device_x2_remat_none_ms']:.1f} ms/iter", flush=True)

    # ---- transfer micro: the pool io legs in isolation ----
    host_batch = np.zeros((8, 64, 64, cfg.num_channels), np.float32)
    dev = jnp.asarray(host_batch)
    _fence(dev)
    t0 = time.perf_counter()
    for _ in range(4):
        dev = jnp.asarray(host_batch)
        _fence(dev)
    out["upload_fence_ms"] = 1000 * (time.perf_counter() - t0) / 4
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(jax.device_get(dev))
    out["download_ms"] = 1000 * (time.perf_counter() - t0) / 4
    print(f"upload+fence {out['upload_fence_ms']:.1f} ms, "
          f"download {out['download_ms']:.1f} ms  "
          f"({host_batch.nbytes/1e6:.1f} MB each)", flush=True)

    full = out["device_x2_ms"]
    out["appearance_marginal_ms"] = full - out["no_appearance_ms"]
    out["content_marginal_ms"] = full - out["no_content_ms"]
    out["overflow_marginal_ms"] = full - out["no_overflow_ms"]
    out["loss_all_marginal_ms"] = full - out["rollout_only_ms"]
    out["ot_vs_gram_ms"] = full - out["appearance_gram_ms"]
    out["grow_32step_marginal_ms"] = full - out["device_x2_s32_ms"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
