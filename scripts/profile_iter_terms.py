"""Marginal per-term cost of the video_motion train iteration, measured at
the FULL-ITERATION level (same jit program shape, one term zeroed at a
time). Isolated per-term micro-benches mis-measure on this platform: each
separate dispatch adds the ~28 ms floor and any non-scalar fetch rides the
~13 MB/s tunnel — full-iteration differences are the honest split
(docs/ROUND4.md).

Variants:
  full                 the production iteration (reference tap schedule)
  no_appearance        appearance_weight=0 (taps + motion kept)
  no_motion            video_motion_weight=0 (drops the motion term AND the
                       tapped-rollout shape -> marginal motion+taps cost)
  rollout_only         both 0: rollout + overflow + optimizer skeleton
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax


def main():
    import os

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    import jax.numpy as jnp
    import numpy as np
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones(())))
    print(f"warmup {time.perf_counter()-t0:.0f}s", flush=True)

    from vsnca_tpu.infer.benchmark import benchmark_train_step

    variants = [
        ("full", None),
        ("no_appearance", {"appearance_weight": 0.0}),
        ("no_motion", {"video_motion_weight": 0.0}),
        ("rollout_only", {"appearance_weight": 0.0,
                          "video_motion_weight": 0.0}),
    ]
    results = {}
    for name, ov in variants:
        r = benchmark_train_step(
            "video_motion", iters=8, step_n=128, rollout_path="auto",
            precompute_targets=True, loss_overrides=ov,
        )
        results[name] = r["sec_per_train_iter"]
        print(f"{name:14s}: {1000*r['sec_per_train_iter']:7.2f} ms/iter "
              f"({r['train_iters_per_sec']:.2f} it/s)", flush=True)

    f = results["full"]
    print(f"\nMARGINALS: appearance {1000*(f-results['no_appearance']):.1f} ms"
          f" | motion+taps {1000*(f-results['no_motion']):.1f} ms"
          f" | rollout+overflow+opt skeleton "
          f"{1000*results['rollout_only']:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
