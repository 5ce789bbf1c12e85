"""Roofline measurement for the fused ConditionedNCA kernel (r5).

docs/ROOFLINE.md §3 needs a measured ms/step for ops/pallas_cnca.py at the
EncoderConditioning shapes (64², c=20, d=64) at b=1 (interactive grower)
and b=8 (training/serving batch), plus the XLA grow for the same shapes as
the like-for-like comparison. Chained timing (iters rollouts in ONE jitted
program, single fetch fence) — the bench.py methodology.

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
    np.asarray(jax.device_get(x.ravel()[0]))


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

    from vsnca_tpu.config import ConditionedNCAConfig
    from vsnca_tpu.models.conditioned_nca import (
        conditioned_nca_grow,
        conditioned_nca_init,
        conditioned_nca_seed,
        encode_goal,
    )
    from vsnca_tpu.ops.pallas_cnca import fused_cnca_rollout, fused_cnca_supported

    cfg = ConditionedNCAConfig(image_size=64)
    params = conditioned_nca_init(jax.random.PRNGKey(0), cfg)
    n_steps, iters = 96, 10
    out = {"n_steps": n_steps}

    for b in (1, 8):
        x = conditioned_nca_seed(cfg, b)
        goal_img = jax.random.uniform(
            jax.random.PRNGKey(1), (b, 64, 64, 3), jnp.float32)
        goal = jax.jit(encode_goal, static_argnames="cfg")(
            params, cfg, goal_img)
        assert fused_cnca_supported(cfg, 64, 64)

        @jax.jit
        def chain_fused(s):
            for i in range(iters):
                s = fused_cnca_rollout(params, s, goal, jnp.int32(i), cfg,
                                       n_steps)
            return s

        s = chain_fused(x)
        _fetch(s)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            s = chain_fused(s)
            _fetch(s)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        out[f"fused_us_per_step_b{b}"] = 1e6 * best / n_steps
        print(f"fused b={b}: {1e6*best/n_steps:.2f} us/step "
              f"({1e3*best:.2f} ms per {n_steps}-step rollout)", flush=True)

        @jax.jit
        def chain_xla(s, key):
            for _ in range(iters):
                key, sub = jax.random.split(key)
                s = conditioned_nca_grow(params, s, goal_img, sub, cfg,
                                         n_steps, remat="none")
            return s

        s = chain_xla(x, jax.random.PRNGKey(2))
        _fetch(s)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            s = chain_xla(s, jax.random.PRNGKey(3))
            _fetch(s)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        out[f"xla_us_per_step_b{b}"] = 1e6 * best / n_steps
        print(f"xla   b={b}: {1e6*best/n_steps:.2f} us/step", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
