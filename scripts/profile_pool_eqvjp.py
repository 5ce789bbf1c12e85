"""A/B the stride-1 max-pool lowering inside the video_motion iteration.

r4d pinned the pool at 25.5 ms/iter of the MSOE marginal (the
select_and_scatter backward; scripts/profile_vm_r4d.py). This measures the
production full iteration under three pool paths:

  rw     reduce_window forward + select_and_scatter VJP (old default)
  eq     separable reduce_window forward + equality-mask custom VJP (new)
  eq2    eq re-run (platform-drift canary)

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
    import vsnca_tpu.ops.conv as conv_mod

    out = {}

    def run(name, eq):
        conv_mod._POOL_EQ_VJP = eq
        try:
            r = benchmark_train_step(
                "video_motion", iters=8, step_n=128,
                precompute_targets=True,
            )
        finally:
            conv_mod._POOL_EQ_VJP = True
        out[name] = 1000 * r["sec_per_train_iter"]
        print(f"{name}: {out[name]:.1f} ms/iter "
              f"({1000/out[name]:.2f} it/s)", flush=True)

    run("rw", False)
    run("eq", True)
    run("eq2", True)
    out["eq_minus_rw_ms"] = out["eq"] - out["rw"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
