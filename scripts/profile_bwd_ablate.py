"""Per-stage hardware timing of the tiled flat VJP backward via the
Python-staged ``ablate`` hook (outputs are wrong under ablation — timing
only). Splits the backward into:

  recompute+misc  = time with {dw, adj, gp} all ablated
  + gp matmul     = t({dw, adj}) - t({dw, adj, gp})
  + adjoint       = t({dw}) - t({dw, adj})
  + dw/db accum   = t(full) - t({dw})

Shapes: the two flagship 256-px training shapes (video-motion ms c16 b3 and
edge-conditioned c12 b2, 64 steps). Methodology: same-process, min-of-N
single-dispatch timings with a scalar fetch fence (the ~28 ms dispatch+fetch
floor cancels in the subtractions; docs/ROUND3.md)."""

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


def timeit(fn, iters=8, warmup=2):
    for _ in range(warmup):
        fetch(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


ABLATIONS = [
    frozenset(),
    frozenset({"dw"}),
    frozenset({"dw", "adj"}),
    frozenset({"dw", "adj", "gp"}),
    frozenset({"adj"}),  # gp kept live only via dw accums? no — dcond; DCE probe
]


def profile_shape(label, nca_cfg, b, size, steps, cond_img=None):
    from vsnca_tpu.models.dynca import dynca_init, dynca_seed, make_conditioning
    from vsnca_tpu.ops.pallas_train import (
        _bwd_call_flat_tiled,
        _flat_shapes,
        _fwd_call_flat,
        plan_flat_train,
    )

    plan = plan_flat_train(nca_cfg, size, size, steps, need_dcond=False,
                           force_mode="tiled")
    assert plan is not None, f"no tiled plan for {label}"
    segment, mode, tile_rows = plan
    compute_dtype = "float32"
    print(f"[{label}] plan: mode={mode} segment={segment} "
          f"tile_rows={tile_rows}", flush=True)

    params = dynca_init(jax.random.PRNGKey(0), nca_cfg)
    x = dynca_seed(nca_cfg, b, (size, size))
    cond = make_conditioning(nca_cfg, (size, size), batch=b,
                             cond_img=cond_img)
    c, cp, cc, ccp = _flat_shapes(nca_cfg, cond is not None)
    xf = jnp.pad(jnp.transpose(x, (0, 3, 1, 2)),
                 ((0, 0), (0, cp - c), (0, 0), (0, 0))).reshape(
        b, cp, size * size)
    condf = None
    if cond is not None:
        condf = jnp.pad(jnp.transpose(cond, (0, 3, 1, 2)),
                        ((0, 0), (0, ccp - cc), (0, 0), (0, 0))).reshape(
            b, ccp, size * size).astype(jnp.float32)

    fwd = jax.jit(lambda xf, condf: _fwd_call_flat(
        params, xf, condf, jnp.int32(7), nca_cfg, steps, segment,
        compute_dtype, False, size, size, tile_rows))
    y, ckpt = fwd(xf, condf)
    gy = jnp.ones_like(y)

    results = {}
    for ab in ABLATIONS:
        bwd = jax.jit(lambda ckpt, gy, ab=ab: _bwd_call_flat_tiled(
            params, ckpt, condf, jnp.int32(7), gy, nca_cfg, steps, segment,
            compute_dtype, False, size, size, tile_rows, False, ablate=ab))
        t0 = time.perf_counter()
        t = timeit(lambda: bwd(ckpt, gy))
        name = "+".join(sorted(ab)) or "full"
        results[name] = t
        print(f"[{label}] bwd ablate={name:13s}: {1000*t:7.2f} ms "
              f"(first wall {time.perf_counter()-t0:.0f}s)", flush=True)

    if {"full", "dw", "adj+dw", "adj+dw+gp"} <= set(results):
        full = results["full"]
        no_dw = results["dw"]
        no_dw_adj = results["adj+dw"]
        base = results["adj+dw+gp"]
        print(f"[{label}] SPLIT: recompute+misc {1000*base:.1f} ms | "
              f"gp {1000*(no_dw_adj-base):.1f} | "
              f"adj {1000*(no_dw-no_dw_adj):.1f} | "
              f"dw/db {1000*(full-no_dw):.1f} | total {1000*full:.1f}",
              flush=True)
    return results


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    fetch(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    print(f"warmup {time.perf_counter()-t0:.0f}s", flush=True)

    from vsnca_tpu.train.presets import PRESETS

    vm_cfg, _, _ = PRESETS["video_motion"]()
    profile_shape("256ms_c16_b3", vm_cfg, 3, 256, 64)

    edge_cfg, _, _ = PRESETS["edge_conditioned"]()
    cond_img = jax.random.uniform(jax.random.PRNGKey(9), (2, 256, 256, 1))
    profile_shape("256_c12_b2", edge_cfg, 2, 256, 64, cond_img=cond_img)


if __name__ == "__main__":
    main()
