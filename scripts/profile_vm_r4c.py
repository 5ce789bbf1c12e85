"""Stage split of the video_motion term via debug-metric marginals (r4c).

Same full-iteration difference methodology as profile_vm_r4.py (per-call
micro-benches carry a ~29 ms dispatch+fetch floor on this platform), but
with profiling-only metric stubs that keep successively deeper prefixes of
the term's subgraph:

  no_video_motion   term absent                         (drift anchor)
  vm_pairmean       + pair construction (resize/luma) fwd+bwd
  vm_mean           + generated-side MSOE fwd+bwd
  full              + target features + the real statistics metric

and a trace-time A/B of the stride-1 max-pool lowering (shift-max vs
reduce_window/select_and_scatter) on the two runs that contain MSOE.

Not part of the library — a dev tool.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
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
    from vsnca_tpu.ops import conv as conv_mod

    runs = [
        ("no_video_motion", dict(loss_overrides={"video_motion_weight": 0.0}), True),
        ("vm_pairmean", dict(loss_overrides={
            "video_motion_loss_type": "MotionPairMean"}), True),
        ("vm_mean", dict(loss_overrides={
            "video_motion_loss_type": "MotionMean"}), True),
        ("full", dict(), True),
        ("vm_mean_rw", dict(loss_overrides={
            "video_motion_loss_type": "MotionMean"}), False),
        ("full_rw", dict(), False),
    ]
    out = {}
    for name, kw, shiftmax in runs:
        conv_mod._POOL_SHIFTMAX = shiftmax
        r = benchmark_train_step(
            "video_motion", iters=8, step_n=128,
            precompute_targets=True, **kw,
        )
        out[name] = r["sec_per_train_iter"]
        print(f"{name}: {1000*r['sec_per_train_iter']:.1f} ms/iter "
              f"({r['train_iters_per_sec']:.2f} it/s)", flush=True)
    conv_mod._POOL_SHIFTMAX = True

    ms = {k: 1000 * v for k, v in out.items()}
    print(json.dumps({
        "pairs_marginal_ms": ms["vm_pairmean"] - ms["no_video_motion"],
        "msoe_marginal_ms": ms["vm_mean"] - ms["vm_pairmean"],
        "metric_marginal_ms": ms["full"] - ms["vm_mean"],
        "msoe_marginal_rw_ms": ms["vm_mean_rw"] - ms["vm_pairmean"],
        "pool_ab_full_ms": ms["full"] - ms["full_rw"],
        **{k + "_ms": v for k, v in ms.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
