"""Round-5 session-3 hardware step A (one process, one axon warmup):

1. vm-term remat A/B (the batch-10 probe that was cut by a machine
   recycle) — scripts/probe_vm_remat_r5.py inline.
2. bench.py::bench_encoder_training() in the SAME context bench.py uses —
   confirms the driver's round-end bench rides the fused cnca pair
   (rollout_path='auto' now selects ops/pallas_cnca.py::fused_cnca_train
   on TPU) and records the it/s it will see.

Not part of the library — a dev tool.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

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

    # ---- step 1: vm remat A/B (probe_vm_remat_r5 logic, inline) ----
    import vsnca_tpu.losses.video_motion as vm
    from vsnca_tpu.infer.benchmark import benchmark_train_step

    out = {}
    t0 = time.perf_counter()
    r = benchmark_train_step("video_motion", iters=8, step_n=128,
                             precompute_targets=True)
    out["stock_ms"] = 1000 * r["sec_per_train_iter"]
    print(f"stock: {out['stock_ms']:.1f} ms/iter "
          f"(+{time.perf_counter()-t0:.0f}s)", flush=True)

    orig = vm.video_motion_loss

    def remat_vm(msoe_params, generated_frames, target_frames, *a, **kw):
        gen = list(generated_frames)

        def inner(gen_tuple):
            l, _ = orig(msoe_params, list(gen_tuple), target_frames, *a, **kw)
            return l

        l = jax.checkpoint(inner)(tuple(gen))
        return l, (None, None)

    import vsnca_tpu.losses.orchestrator as orch

    saved = orch.video_motion_loss if hasattr(orch, "video_motion_loss") else None
    vm.video_motion_loss = remat_vm
    if saved is not None:
        orch.video_motion_loss = remat_vm
    try:
        t0 = time.perf_counter()
        r = benchmark_train_step("video_motion", iters=8, step_n=128,
                                 precompute_targets=True)
        out["remat_vm_ms"] = 1000 * r["sec_per_train_iter"]
        print(f"remat vm term: {out['remat_vm_ms']:.1f} ms/iter "
              f"(+{time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:  # keep going to step 2 on any failure
        print("remat probe failed:", repr(e), flush=True)
    finally:
        vm.video_motion_loss = orig
        if saved is not None:
            orch.video_motion_loss = saved

    out["saving_ms"] = out["stock_ms"] - out.get("remat_vm_ms", out["stock_ms"])
    print("REMAT_AB", json.dumps(out), flush=True)

    # ---- step 2: the bench's encoder row, as bench.py will run it ----
    import bench

    t0 = time.perf_counter()
    try:
        it_s = bench.bench_encoder_training()
        print(f"bench encoder row: {it_s:.2f} it/s "
              f"(+{time.perf_counter()-t0:.0f}s)", flush=True)
        print("ENCODER_ROW", json.dumps({"train_iters_per_sec_encoder": it_s}),
              flush=True)
    except Exception as e:
        print("encoder bench failed:", repr(e), flush=True)
        raise


if __name__ == "__main__":
    main()
