"""A/B the MSOE contrast_norm lowering inside the full video_motion iteration.

The r4 prefix-stub split (scripts/profile_vm_r4d.py) charged ~5.6 ms of the
video_motion marginal to contrast_norm — suspiciously large for ~3 MB of
data, so it is presumed fixed-overhead (reduce-stage dispatch / fusion
barriers), not bandwidth. Candidate: a one-pass variant that computes
sum(x) and sum(x*x) over the same read (var = (s2 - s1*mean)/(n-1)) instead
of the two-pass mean-then-centered-variance, halving the reduction stages in
the forward and simplifying the VJP's reductions.

Methodology: production `benchmark_train_step` runs (full-iteration
differences; per-call micro-benches are floor-poisoned on axon — see
scripts/profile_vm_r4.py). Runs, in order:
  stock      — committed two-pass contrast_norm
  onepass    — monkeypatched one-pass variant
  nonorm     — contrast_norm = identity (upper bound on the whole stage)

Not part of the library — a dev tool.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def contrast_norm_onepass(x):
    """One-read mean/var: var = (sum(x^2) - sum(x)*mean) / (n-1), clamped
    at 0 (the difference form can go epsilon-negative on near-constant
    frames, e.g. the black control image)."""
    axes = tuple(range(1, x.ndim))
    n = int(np.prod([x.shape[a] for a in axes]))
    s1 = jnp.sum(x, axis=axes, keepdims=True)
    s2 = jnp.sum(x * x, axis=axes, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 - s1 * mean, 0.0) / max(n - 1, 1)
    return (x - mean) / jnp.sqrt(var + 1e-12)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones(8))))
    print(f"warmup jit: {time.perf_counter()-t0:.1f}s", flush=True)

    from vsnca_tpu.models import msoe
    from vsnca_tpu.infer.benchmark import benchmark_train_step

    # Value check first (CPU-safe too): parity on a realistic pair.
    key = jax.random.PRNGKey(0)
    pair = jax.random.uniform(key, (3, 64, 64, 2))
    a = msoe.contrast_norm(pair)
    b = contrast_norm_onepass(pair)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"value parity max|diff|: {err:.2e}", flush=True)
    assert err < 1e-4

    stock = msoe.contrast_norm
    variants = [
        ("stock", stock),
        ("onepass", contrast_norm_onepass),
        ("nonorm", lambda x: x),
    ]
    out = {}
    for name, fn in variants:
        msoe.contrast_norm = fn
        try:
            r = benchmark_train_step(
                "video_motion", iters=8, step_n=128, precompute_targets=True,
            )
            out[name] = r["sec_per_train_iter"]
            print(f"{name}: {1000*r['sec_per_train_iter']:.1f} ms/iter "
                  f"({r['train_iters_per_sec']:.2f} it/s)", flush=True)
        finally:
            msoe.contrast_norm = stock

    print(json.dumps({
        "stock_ms": 1000 * out["stock"],
        "onepass_ms": 1000 * out["onepass"],
        "nonorm_ms": 1000 * out["nonorm"],
        "onepass_saving_ms": 1000 * (out["stock"] - out["onepass"]),
        "whole_stage_ms": 1000 * (out["stock"] - out["nonorm"]),
    }), flush=True)


if __name__ == "__main__":
    main()
