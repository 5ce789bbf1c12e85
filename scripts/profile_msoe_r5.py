"""Split the video-motion MSOE marginal (r5).

profile_vm_r4.py (docs/hw_r5/vm_marginals.log) says the video_motion term
costs ~47 ms/iter while the OT-vs-Gram metric share is ~0 ms — so the term
is MSOE fwd+bwd + pair assembly. This script splits those with the
loss_type profiling stubs (MotionMean keeps MSOE fwd+bwd, drops target
broadcast + metric; MotionPairMean keeps only resize/luma pair assembly),
then micro-benches the MSOE fwd+bwd alone at the production stacked-pair
batch in fp32 vs bf16 params/activations to bound a precision lever.

Not part of the library — a dev tool.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


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
    _fetch(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    print(f"warmup jit: {time.perf_counter()-t0:.1f}s", flush=True)

    from vsnca_tpu.infer.benchmark import benchmark_train_step

    out = {}
    for name, kw in [
        ("full", dict()),
        ("vm_motionmean", dict(loss_overrides={
            "video_motion_loss_type": "MotionMean"})),
        ("vm_pairmean", dict(loss_overrides={
            "video_motion_loss_type": "MotionPairMean"})),
        ("no_video_motion", dict(loss_overrides={
            "video_motion_weight": 0.0})),
    ]:
        r = benchmark_train_step(
            "video_motion", iters=8, step_n=128,
            precompute_targets=True, **kw,
        )
        out[name] = 1000 * r["sec_per_train_iter"]
        print(f"{name}: {out[name]:.1f} ms/iter", flush=True)

    out["msoe_fwdbwd_marginal_ms"] = out["vm_motionmean"] - out["vm_pairmean"]
    out["pair_assembly_marginal_ms"] = (
        out["vm_pairmean"] - out["no_video_motion"]
    )
    out["target_bcast_plus_metric_ms"] = out["full"] - out["vm_motionmean"]

    # ---- MSOE fwd+bwd micro at the production stacked shape ----
    from vsnca_tpu.models.msoe import load_msoe, msoe_forward

    msoe, _ = load_msoe()
    # reference iteration: batch 3, 2 tapped frames -> 1 pair... measured
    # from the stacked pair batch the loss actually builds: probe both 3
    # and 6 stacked pairs at 128^2.
    for nb in (3, 6):
        pair = jax.random.uniform(
            jax.random.PRNGKey(0), (nb, 128, 128, 2), jnp.float32)

        def mk(params, dtype):
            p = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

            def loss(x):
                f, feats = msoe_forward(p, x.astype(dtype),
                                        return_features=True)
                return jnp.sum(feats[0].astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss))
            _fetch(g(pair))

            def round_():
                t0 = time.perf_counter()
                for _ in range(8):
                    gr = g(pair)
                _fetch(gr)
                return (time.perf_counter() - t0) / 8 * 1e3

            return min(round_(), round_())

        out[f"msoe_grad_fp32_b{nb}_ms"] = mk(msoe, jnp.float32)
        print(f"msoe grad fp32 b{nb}: {out[f'msoe_grad_fp32_b{nb}_ms']:.2f} ms",
              flush=True)
        out[f"msoe_grad_bf16_b{nb}_ms"] = mk(msoe, jnp.bfloat16)
        print(f"msoe grad bf16 b{nb}: {out[f'msoe_grad_bf16_b{nb}_ms']:.2f} ms",
              flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
