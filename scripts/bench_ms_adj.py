"""A/B the ms fused pair grad at the flagship shape (256^2 c16/fc128 b3,
64 steps) — run before/after an adjoint change (same process methodology as
scripts/profile_vm_r3.py; numbers carry the ~28 ms dispatch+fetch floor,
docs/ROUND3.md)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[0]


def timeit(fn, iters=6, warmup=2):
    for _ in range(warmup):
        fetch(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    fetch(jax.jit(lambda x: x + 1)(jnp.ones(8)))

    from vsnca_tpu.models.dynca import dynca_init, dynca_seed, make_conditioning
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat,
        plan_flat_train,
    )
    from vsnca_tpu.train.presets import PRESETS

    nca_cfg, _, train_cfg = PRESETS["video_motion"]()
    b, size, steps = 3, 256, 64
    print("plan:", plan_flat_train(nca_cfg, size, size, steps,
                                   need_dcond=False), flush=True)
    params = dynca_init(jax.random.PRNGKey(0), nca_cfg)
    x = dynca_seed(nca_cfg, b, (size, size))
    cond = make_conditioning(nca_cfg, (size, size), batch=b)

    @jax.jit
    def pair_fwd(x):
        s, r = fused_rollout_train_flat(
            params, x, jnp.float32(7.0), nca_cfg, steps,
            cond_nhwc=cond, cond_no_grad=True,
        )
        return jnp.sum(r)

    t0 = time.perf_counter()
    t = timeit(lambda: pair_fwd(x))
    print(f"fused fwd_call {steps}st b{b}: {1000*t:.1f} ms "
          f"(first-call wall {time.perf_counter()-t0:.0f}s)", flush=True)

    @jax.jit
    def pair_grad(p, x):
        def obj(p):
            s, r = fused_rollout_train_flat(
                p, x, jnp.float32(7.0), nca_cfg, steps,
                cond_nhwc=cond, cond_no_grad=True,
            )
            return jnp.sum(r) + jnp.sum(s)
        return jax.grad(obj)(p)

    t0 = time.perf_counter()
    t = timeit(lambda: pair_grad(params, x))
    print(f"fused grad {steps}st b{b}: {1000*t:.1f} ms "
          f"(first-call wall {time.perf_counter()-t0:.0f}s)", flush=True)

    # hardware sanity: fused grad vs XLA grad direction (loose — RNG
    # streams differ; checks magnitude/finiteness, not parity)
    g = pair_grad(params, x)
    for k, v in g.items():
        arr = np.asarray(jax.device_get(v))
        assert np.isfinite(arr).all(), k
    print("grads finite:", {k: float(np.linalg.norm(np.asarray(v)))
                            for k, v in g.items()}, flush=True)


if __name__ == "__main__":
    main()
