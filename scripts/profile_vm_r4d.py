"""Intra-MSOE stage split via prefix stubs (r4d).

profile_vm_r4c.py pinned the video_motion term's fat to the MSOE fwd+bwd
itself (28.6 ms/iter of the 170.5 ms full iteration with the production
reduce_window pool; pairs 5.8, metric 6.2). This script splits the MSOE
cost by monkeypatching ``msoe_forward`` with successively deeper PREFIXES
of the real network (each ending in per-level means so every level's
compute and gradient stays alive), and measuring full-iteration deltas
between consecutive depths:

  d0  term absent                      (no_video_motion anchor)
  d1  contrast_norm
  d2  + 4 pyramid blurs
  d3  + symmetric_pad + conv1 (5 levels)
  d4  + square + 5x5 stride-1 maxpool
  d5  + conv2 + L1 normalize
  d6  full MSOE incl. upsample + concat (= vm_mean)

Not part of the library — a dev tool.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def make_prefix_forward(msoe_mod, depth):
    from vsnca_tpu.ops.conv import conv2d, max_pool_2d
    from vsnca_tpu.ops.padding import symmetric_pad_2d

    def fwd(params, pair, return_features=False):
        x0 = msoe_mod.contrast_norm(pair)
        levels = [x0]
        if depth >= 2:
            for _ in range(msoe_mod.N_SCALES - 1):
                levels.append(msoe_mod._pyramid_blur(levels[-1]))
        outs = []
        for lv in levels:
            y = lv
            if depth >= 3:
                y = symmetric_pad_2d(y, (5, 5, 5, 5))
                y = conv2d(y, params["conv1_w"], params["conv1_b"],
                           padding="VALID")
            if depth >= 4:
                y = jnp.square(y)
                y = max_pool_2d(y, 5, 1, 2)
            if depth >= 5:
                y = conv2d(y, params["conv2_w"], params["conv2_b"])
                norm = jnp.sum(jnp.abs(y), axis=-1, keepdims=True)
                y = y / jnp.maximum(norm, 1e-12)
            outs.append(jnp.mean(y, axis=(1, 2, 3), keepdims=True))
        z = outs[0]
        for o in outs[1:]:
            z = z + o
        flow = jnp.zeros(pair.shape[:3] + (2,), pair.dtype)
        if return_features:
            return flow, [z]
        return flow

    return fwd


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
    import vsnca_tpu.models.msoe as msoe_mod

    orig = msoe_mod.msoe_forward
    out = {}

    def run(name, depth):
        if depth == 0:
            kw = dict(loss_overrides={"video_motion_weight": 0.0})
            msoe_mod.msoe_forward = orig
        elif depth == 6:
            kw = dict(loss_overrides={"video_motion_loss_type": "MotionMean"})
            msoe_mod.msoe_forward = orig
        else:
            kw = dict(loss_overrides={"video_motion_loss_type": "MotionMean"})
            msoe_mod.msoe_forward = make_prefix_forward(msoe_mod, depth)
        try:
            r = benchmark_train_step(
                "video_motion", iters=8, step_n=128,
                precompute_targets=True, **kw,
            )
        finally:
            msoe_mod.msoe_forward = orig
        out[name] = 1000 * r["sec_per_train_iter"]
        print(f"{name}: {out[name]:.1f} ms/iter", flush=True)

    run("d0_absent", 0)
    run("d1_contrast", 1)
    run("d2_pyramid", 2)
    run("d3_conv1", 3)
    run("d4_pool", 4)
    run("d5_conv2_norm", 5)
    run("d6_full", 6)

    names = ["d0_absent", "d1_contrast", "d2_pyramid", "d3_conv1",
             "d4_pool", "d5_conv2_norm", "d6_full"]
    deltas = {f"{b}-{a}_ms": out[b] - out[a]
              for a, b in zip(names, names[1:])}
    print(json.dumps({**deltas, **{k + "_ms": v for k, v in out.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
