"""A/B: jax.checkpoint around the video-motion loss term (r5).

The vm term's MSOE fwd+bwd costs ~25-31 ms in-iteration vs 6-7 ms
standalone (docs/hw_r5/msoe_split*.log) — a program-interaction cost.
Rematerializing the term (recompute MSOE in the backward instead of
holding its activations across the fused-rollout backward) changes the
scheduling/liveness structure; this probe measures whether that melts the
interaction cost. Monkeypatched — lands as config only if it wins.

Not part of the library — a dev tool.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


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
    np.asarray(jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones(8))))
    print(f"warmup jit: {time.perf_counter()-t0:.1f}s", flush=True)

    import vsnca_tpu.losses.video_motion as vm
    from vsnca_tpu.infer.benchmark import benchmark_train_step

    out = {}
    r = benchmark_train_step("video_motion", iters=8, step_n=128,
                             precompute_targets=True)
    out["stock_ms"] = 1000 * r["sec_per_train_iter"]
    print(f"stock: {out['stock_ms']:.1f} ms/iter", flush=True)

    orig = vm.video_motion_loss

    def remat_vm(msoe_params, generated_frames, target_frames, *a, **kw):
        gen = list(generated_frames)

        def inner(gen_tuple):
            l, _ = orig(msoe_params, list(gen_tuple), target_frames, *a, **kw)
            return l

        l = jax.checkpoint(inner)(tuple(gen))
        return l, (None, None)

    # The orchestrator imports the symbol at call time from the module.
    import vsnca_tpu.losses.orchestrator as orch

    saved = orch.video_motion_loss if hasattr(orch, "video_motion_loss") else None
    vm.video_motion_loss = remat_vm
    if saved is not None:
        orch.video_motion_loss = remat_vm
    try:
        r = benchmark_train_step("video_motion", iters=8, step_n=128,
                                 precompute_targets=True)
        out["remat_vm_ms"] = 1000 * r["sec_per_train_iter"]
        print(f"remat vm term: {out['remat_vm_ms']:.1f} ms/iter", flush=True)
    finally:
        vm.video_motion_loss = orig
        if saved is not None:
            orch.video_motion_loss = saved

    out["saving_ms"] = out["stock_ms"] - out.get("remat_vm_ms", out["stock_ms"])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
