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
    frozenset({"dw", "adjc"}),  # adj compute zeroed, scatter kept
    frozenset({"dw", "adj"}),
    frozenset({"dw", "adj", "gp"}),
    # in-adjoint stage stubs (ms only): marginal cost of each transpose
    # stage measured INSIDE the production kernel (register pressure and
    # pipelining effects included — the isolated micro-bench showed the
    # same stages nearly free out of context, scripts/bench_adj_micro.py)
    frozenset({"dw", "adj_ut"}),
    frozenset({"dw", "adj_st"}),
    frozenset({"dw", "adj_dt"}),
    frozenset({"dw", "adj_sc0"}),
    frozenset({"dw", "adj_ut", "adj_st", "adj_dt", "adj_sc0"}),
]


def profile_shape(label, nca_cfg, b, size, steps, cond_img=None):
    from vsnca_tpu.models.dynca import dynca_init, dynca_seed, make_conditioning
    from vsnca_tpu.ops.pallas_train import (
        _bwd_call_flat_tiled,
        _flat_shapes,
        _fwd_call_flat,
        plan_flat_train,
    )

    plan = plan_flat_train(nca_cfg, size, size, steps, need_dcond=False)
    assert plan is not None, f"no flat plan for {label}"
    segment, mode, tile_rows = plan
    if mode != "tiled":
        print(f"[{label}] auto plan is mode={mode}, not tiled — the ablate "
              "hook only instruments the tiled backward; skipping", flush=True)
        return {}
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
        adjsplit = ""
        if "adjc+dw" in results:
            adjsplit = (f" [adj compute {1000*(no_dw-results['adjc+dw']):.1f}"
                        f" + scatter {1000*(results['adjc+dw']-no_dw_adj):.1f}]")
        print(f"[{label}] SPLIT: recompute+misc {1000*base:.1f} ms | "
              f"gp {1000*(no_dw_adj-base):.1f} | "
              f"adj {1000*(no_dw-no_dw_adj):.1f}{adjsplit} | "
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

    # NOTE: the edge c12+cond 256² shape is excluded: the direct
    # _fwd_call_flat wrapper OOMs scoped vmem by 57 KB on the current
    # compiler even though the production train-step program (same plan)
    # compiles and runs (verified: benchmark_train_step edge fused
    # 15.0 it/s) — profile that shape through benchmark_train_step
    # loss_overrides instead.


if __name__ == "__main__":
    main()
