"""Full-iteration marginal costs of the video_motion loss terms (r4).

Per-call micro-benches mis-measure on this platform (each separate
dispatch+fetch carries a ~29 ms floor — scripts/profile_vm_r3.py measured
optimizer-only at 28.9 ms), so every number here is a PRODUCTION
`benchmark_train_step` run (iters deep, sync only on the last iteration)
and term costs are DIFFERENCES between runs with loss weights zeroed
(zero weight removes the term's subgraph from the jitted program —
losses/orchestrator.py builds the mapper from nonzero weights only).

Not part of the library — a dev tool.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


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
    import numpy as np

    np.asarray(jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones(8))))
    print(f"warmup jit: {time.perf_counter()-t0:.1f}s", flush=True)

    from vsnca_tpu.infer.benchmark import benchmark_train_step

    runs = [
        ("full", dict()),
        ("no_appearance", dict(loss_overrides={"appearance_weight": 0.0})),
        ("no_video_motion", dict(loss_overrides={"video_motion_weight": 0.0})),
        ("rollout_only", dict(loss_overrides={
            "appearance_weight": 0.0, "video_motion_weight": 0.0})),
        # Same MSOE fwd+bwd, Gram metric instead of OT: splits the
        # video_motion marginal into MSOE-vs-OT shares
        # (gram_ms = full - vm_gram ≈ the OT-minus-Gram metric cost).
        ("vm_gram", dict(loss_overrides={
            "video_motion_loss_type": "MotionGram"})),
        ("full_xla", dict(rollout_path="xla")),
    ]
    out = {}
    for name, kw in runs:
        r = benchmark_train_step(
            "video_motion", iters=8, step_n=128,
            precompute_targets=True, **kw,
        )
        out[name] = r["sec_per_train_iter"]
        print(f"{name}: {1000*r['sec_per_train_iter']:.1f} ms/iter "
              f"({r['train_iters_per_sec']:.2f} it/s)", flush=True)

    full = out["full"]
    print(json.dumps({
        "full_ms": 1000 * full,
        "appearance_marginal_ms": 1000 * (full - out["no_appearance"]),
        "video_motion_marginal_ms": 1000 * (full - out["no_video_motion"]),
        "loss_both_marginal_ms": 1000 * (full - out["rollout_only"]),
        "rollout_only_ms": 1000 * out["rollout_only"],
        "ot_vs_gram_metric_ms": 1000 * (full - out["vm_gram"]),
        "xla_full_ms": 1000 * out["full_xla"],
    }), flush=True)


if __name__ == "__main__":
    main()
