"""Hardware A/B of the flat-layout kernel vs the 'roll' kernel and XLA.

Run on the real TPU:
    python scripts/bench_flat_kernel.py [--size 256] [--steps 96]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit_chained(step, x0, warmup=2, iters=10):
    x = x0
    for _ in range(warmup):
        x = step(x)
    fetch(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    fetch(x)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--c", type=int, default=12)
    ap.add_argument("--fc", type=int, default=96)
    args = ap.parse_args()

    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import dynca_init, dynca_rollout
    from vsnca_tpu.ops.pallas_step import (
        fused_rollout_chw,
        fused_rollout_flat_chw,
        fused_rollout_stream_chw,
        fused_rollout_stream_flat_chw,
        fused_rollout_supported,
        fused_flat_supported,
        fused_stream_flat_supported,
        fused_stream_supported,
    )

    size, steps = args.size, args.steps
    cfg = NCAConfig(c_in=args.c, fc_dim=args.fc, padding_mode="circular")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, cfg.c_in, size, size)
    ) - 0.5

    print(f"backend={jax.default_backend()} size={size} steps={steps} "
          f"c={args.c} fc={args.fc}", flush=True)
    print(f"roll supported: {fused_rollout_supported(cfg, size, size)}  "
          f"flat supported: {fused_flat_supported(cfg, size, size)}",
          flush=True)

    # -- hardware parity: deterministic masks (update_rate=1.0) vs XLA --
    cfg1 = NCAConfig(c_in=args.c, fc_dim=args.fc, padding_mode="circular",
                     update_rate=1.0)
    xh = jnp.transpose(x, (0, 2, 3, 1))
    ref, _ = dynca_rollout(params, xh, jax.random.PRNGKey(3), cfg1, 5,
                           remat="none")
    flat_fn = (
        fused_rollout_flat_chw
        if fused_flat_supported(cfg, size, size)
        else fused_rollout_stream_flat_chw
    )
    t0 = time.perf_counter()
    out = flat_fn(params, x, jnp.int32(0), cfg1, 5)
    fetch(out)
    print(f"flat compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    out = jnp.transpose(out, (0, 2, 3, 1))
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"hardware parity (rate=1.0, 5 steps) vs XLA: flat={err:.3e}",
          flush=True)
    # 1-step parity isolates per-step numerics from chaotic growth.
    ref1, _ = dynca_rollout(params, xh, jax.random.PRNGKey(3), cfg1, 1,
                            remat="none")
    out1 = jnp.transpose(
        flat_fn(params, x, jnp.int32(0), cfg1, 1), (0, 2, 3, 1)
    )
    d1 = jnp.abs(out1 - ref1)
    err1, mean1 = float(jnp.max(d1)), float(jnp.mean(d1))
    print(f"1-step parity vs XLA: flat max={err1:.3e} mean={mean1:.3e}",
          flush=True)
    # Interpret mode is exact (tests/test_pallas.py); on hardware the padded
    # K layout reorders the MXU accumulation: ~1e-5 f32 noise plus sparse
    # ~1e-4 spikes where a ReLU argument sits within rounding of zero
    # (verified: spikes are scattered, band/tile boundaries are exactly 0).
    assert mean1 < 1e-7 and err1 < 1e-3, "flat kernel deviates from XLA"

    # -- mask fraction sanity at rate=0.5: fraction of changed cells --
    out5 = flat_fn(params, x, jnp.int32(7), cfg, 1)
    changed = float(jnp.mean(jnp.any(out5 != x, axis=1)))
    print(f"mask fraction @rate=0.5 (1 step): {changed:.4f}", flush=True)

    # -- timings --
    for name, fn in [
        ("flat f32", lambda s, i: fused_rollout_flat_chw(
            params, s, jnp.int32(i), cfg, steps)),
        ("flat bf16", lambda s, i: fused_rollout_flat_chw(
            params, s, jnp.int32(i), cfg, steps, compute_dtype="bfloat16")),
        ("roll f32", lambda s, i: fused_rollout_chw(
            params, s, jnp.int32(i), cfg, steps)),
        ("roll bf16", lambda s, i: fused_rollout_chw(
            params, s, jnp.int32(i), cfg, steps, compute_dtype="bfloat16")),
        ("sflat f32", lambda s, i: fused_rollout_stream_flat_chw(
            params, s, jnp.int32(i), cfg, steps)),
        ("schw f32", lambda s, i: fused_rollout_stream_chw(
            params, s, jnp.int32(i), cfg, steps)),
    ]:
        if name.startswith("roll") and not fused_rollout_supported(
                cfg, size, size):
            continue
        if name.startswith("flat") and not fused_flat_supported(
                cfg, size, size):
            continue
        if name.startswith("sflat") and not fused_stream_flat_supported(
                cfg, size, size):
            continue
        if name.startswith("schw") and not fused_stream_supported(
                cfg, size, size):
            continue
        i = [0]

        def step(s, fn=fn):
            i[0] += 1
            return fn(s, i[0])

        t = timeit_chained(step, x)
        print(f"{name:10s}: {1000*t/steps:.4f} ms/step "
              f"({steps/t/24:.0f} fps @24spf)", flush=True)

    # XLA reference
    key = jax.random.PRNGKey(2)

    def xla_step(s):
        out, _ = dynca_rollout(params, s, key, cfg, steps, remat="none")
        return out

    t = timeit_chained(xla_step, xh)
    print(f"{'xla':10s}: {1000*t/steps:.4f} ms/step "
          f"({steps/t/24:.0f} fps @24spf)", flush=True)


if __name__ == "__main__":
    main()
