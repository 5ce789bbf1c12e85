#!/usr/bin/env python
"""Benchmark entry point — prints ONE JSON line.

Primary metric (BASELINE.json): NCA cell-updates/sec on the stylization
rollout at 256px (single chip), using the best available path (fused Pallas
VMEM-resident kernel when supported, else the XLA scan). ``vs_baseline``
compares the 512px rollout against the north-star 30 fps @ 512px with 24
NCA steps/frame (= 1.89e8 cell-updates/sec); > 1.0 beats the target.
"""

import json
import sys
import time

sys.path.insert(0, ".")


def _fetch(x):
    import numpy as np
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def bench_fused(size: int, n_steps: int = 96, iters: int = 10):
    """Returns (chained_sec, unchained_sec) per n_steps-rollout, or None.

    chained: the whole iters-deep rollout chain runs as ONE jitted program
    (one dispatch per measurement) — per-dispatch tunnel latency on this
    stack drifts 1 -> 5+ ms within a session (docs/ROUND3.md), which at
    ~4 ms/call of compute would masquerade as a 2x kernel regression;
    serving pipelines dispatches, so device throughput is the honest
    primary metric. min-of-3 rounds on top (one-sided host noise).

    unchained: independent same-arg calls + one final fetch — the r1/r2
    methodology, kept as the permanent platform-drift canary (a chained/
    unchained divergence flags dispatch-latency drift, not kernel change).
    """
    import jax
    import jax.numpy as jnp

    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import dynca_init
    from vsnca_tpu.ops.pallas_step import ROLLOUT_KERNELS, select_rollout_kernel

    cfg = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular")
    kernel = select_rollout_kernel(cfg, size, size)
    if kernel is None:
        return None
    fn = ROLLOUT_KERNELS[kernel]
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, cfg.c_in, size, size)) - 0.5

    @jax.jit
    def chain(s):
        for i in range(iters):
            s = fn(params, s, jnp.int32(i), cfg, n_steps,
                   compute_dtype="bfloat16")
        return s

    one = jax.jit(
        lambda s, i: fn(params, s, i, cfg, n_steps, compute_dtype="bfloat16")
    )

    s = chain(x)
    _fetch(s)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        s = chain(s)
        _fetch(s)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)

    r = one(x, jnp.int32(0))
    _fetch(r)
    best_u = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            r = one(x, jnp.int32(i))
        _fetch(r)
        dt = (time.perf_counter() - t0) / iters
        best_u = dt if best_u is None else min(best_u, dt)
    return best, best_u


def bench_xla(size: int, n_steps: int = 96, iters: int = 10):
    """(chained_sec, unchained_sec) per rollout for the XLA scan — see
    bench_fused for the two-methodology rationale."""
    import jax

    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import dynca_init, dynca_rollout

    cfg = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, size, size, cfg.c_in)) - 0.5
    key = jax.random.PRNGKey(2)

    @jax.jit
    def chain(x):
        for _ in range(iters):
            x, _ = dynca_rollout(params, x, key, cfg, n_steps, remat="none")
        return x

    one = jax.jit(
        lambda x: dynca_rollout(params, x, key, cfg, n_steps, remat="none")[0]
    )

    s = chain(x)
    _fetch(s)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        s = chain(s)
        _fetch(s)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)

    r = one(x)
    _fetch(r)
    best_u = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = one(x)
        _fetch(r)
        dt = (time.perf_counter() - t0) / iters
        best_u = dt if best_u is None else min(best_u, dt)
    return best, best_u


def _bench_fused_subprocess(timeout_s: int = 1200):
    import subprocess

    code = (
        "import sys; sys.path.insert(0, '.');"
        "from vsnca_tpu.infer.benchmark import benchmark_train_step;"
        "r = benchmark_train_step('static_texture', iters=5, step_n=64,"
        " rollout_path='fused');"
        "print('RESULT', r['train_iters_per_sec'])"
    )
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                return float(line.split()[1])
        return None
    except Exception:  # pragma: no cover - timeout/compile failure
        return None


def bench_grad_pair(size, c_in, fc_dim, steps=64, batch=2, iters=8,
                    scales=(0,)):
    """Same-process paired XLA-vs-fused rollout-grad ms at one shape.
    Resolves the r2 artifact drift between the subprocess it/s and the
    in-process A/B (VERDICT r2 'weak' #2): both numbers now ship, measured
    identically, in one process. Returns (xla_ms, fused_ms|None)."""
    import jax
    import jax.numpy as jnp

    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import dynca_init, dynca_rollout
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat,
        fused_train_flat_supported,
    )

    cfg = NCAConfig(c_in=c_in, fc_dim=fc_dim, padding_mode="circular",
                    perception_scales=scales)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (batch, size, size, c_in)) - 0.5

    def time_grad(fn):
        # UNCHAINED same-arg calls + one final fetch: per_step-remat grad
        # programs are long chains of small kernels whose dispatches only
        # amortize when calls pipeline — an input-chained loop serializes
        # them and measures axon dispatch latency instead of compute
        # (measured 1672 ms chained vs 15.3 ms unchained at 128^2 b4;
        # docs/ROUND3.md). The device stream still serializes execution,
        # so the final fetch bounds all iters.
        g = jax.jit(jax.grad(fn))
        _fetch(g(params, x))  # compile + warm

        def one_round():
            t0 = time.perf_counter()
            for _ in range(iters):
                gr = g(params, x)
            _fetch(gr["w1"])
            return (time.perf_counter() - t0) / iters * 1e3

        # min of 2 rounds: XLA-side dispatch timing on the tunneled axon
        # stack is transiently noisy (15-100 ms spread observed for the
        # same warm program); the fused single-kernel side is stable.
        return min(one_round(), one_round())

    def ls(p, xx):
        # segment:8 = the remat the production presets train with
        s, _ = dynca_rollout(p, xx, jax.random.PRNGKey(2), cfg, steps,
                             remat="segment:8")
        return jnp.sum(s ** 2)

    xla_ms = time_grad(ls)
    fused_ms = None
    if fused_train_flat_supported(cfg, size, size, steps, need_dcond=False):
        def lf(p, xx):
            s, _ = fused_rollout_train_flat(p, xx, 5.0, cfg, steps,
                                            cond_no_grad=True)
            return jnp.sum(s ** 2)

        try:
            fused_ms = time_grad(lf)
        except Exception:  # pragma: no cover - compile failure resilience
            fused_ms = None
    return xla_ms, fused_ms


def bench_encoder_training(iters: int = 5):
    """Train it/s for the EncoderConditioning preset (64px, batch 8, the
    reference train.py defaults; fixed 64-step growth for a stable shape)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsnca_tpu.config import ConditionedNCAConfig
    from vsnca_tpu.data.dataset import ConditioningDataset
    from vsnca_tpu.data.preprocess import synthetic_video, synthetic_style_image
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.encoder_trainer import ConditionedNCATrainer

    dataset = ConditioningDataset(
        (np.asarray(synthetic_video((64, 64), 8)) + 1.0) / 2.0
    )
    style = jnp.asarray(synthetic_style_image((64, 64), 1))
    vgg, _ = load_vgg16()
    trainer = ConditionedNCATrainer(
        ConditionedNCAConfig(image_size=64), dataset, style, vgg,
        step_buckets=(64,), pool_size=64,
    )
    trainer.train_iteration(batch_size=8, num_steps=64)
    trainer.train_iteration(batch_size=8, num_steps=64)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            trainer.train_iteration(batch_size=8, num_steps=64)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return 1.0 / best


def bench_fleet(iters: int = 4, n_models: int = 4):
    """Aggregate train it/s for a vmapped fleet of static-texture models
    (train/multi.py) — the multi-tenant 'style library' workload. One
    program trains all models; compare against n_models x the sequential
    single-model XLA number."""
    import dataclasses

    import jax.numpy as jnp

    from vsnca_tpu.data.preprocess import synthetic_style_image
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.multi import MultiStyleTrainer
    from vsnca_tpu.train.presets import PRESETS

    nca_cfg, loss_cfg, train_cfg = PRESETS["static_texture"]()
    # pool_size doesn't affect per-iteration compute (gather of batch_size);
    # shrink it so the stacked fleet pool stays small.
    train_cfg = dataclasses.replace(
        train_cfg, pool_size=64, rollout_path="xla"
    )
    vgg, _ = load_vgg16()
    fleet = MultiStyleTrainer(
        nca_cfg, loss_cfg, train_cfg, seeds=tuple(range(n_models)),
        vgg_params=vgg,
    )
    styles = jnp.stack([
        jnp.asarray(
            synthetic_style_image(
                train_cfg.img_size, train_cfg.batch_size, seed=m
            ) * 2 - 1
        )
        for m in range(n_models)
    ])
    inputs = {"target_style": styles}
    fleet.train_iteration(inputs, step_n=64)
    fleet.train_iteration(inputs, step_n=64)
    dt = None
    for _ in range(2):
        t0 = time.perf_counter()
        for k in range(iters):
            fleet.train_iteration(inputs, step_n=64, sync=(k == iters - 1))
        r = (time.perf_counter() - t0) / iters
        dt = r if dt is None else min(dt, r)
    return n_models / dt


def bench_training():
    """Train iters/sec for ALL five BASELINE presets plus the torch-CPU
    ratio on the SAME workload as scripts/bench_torch_cpu.py (128px,
    batch 4, 64-step BPTT, Gram) — the >=20x BASELINE target."""
    from vsnca_tpu.infer.benchmark import benchmark_train_step

    out = {}
    st = benchmark_train_step("static_texture", iters=5, step_n=64,
                              rollout_path="xla")
    out["train_iters_per_sec_static_texture"] = st["train_iters_per_sec"]

    # The custom-VJP fused path compiles its fwd+bwd Mosaic kernels in ~7
    # minutes through the axon remote compiler; run it in a subprocess with
    # a hard timeout so a stuck compile can't take the whole bench down.
    out["train_iters_per_sec_static_texture_fused"] = _bench_fused_subprocess()

    # Remaining BASELINE configs (VERDICT r3 next-round #1: every preset
    # gets an it/s row). All production-path (auto rollout, precomputed
    # target features where the trainer supports it).
    for key, kw in (
        ("train_iters_per_sec_vector_field", dict(
            preset="vector_field_motion", iters=5, step_n=64,
            precompute_targets=True)),
        ("train_iters_per_sec_edge_conditioned", dict(
            preset="edge_conditioned", iters=3, step_n=64,
            precompute_targets=True)),
        ("train_iters_per_sec_extra_channels", dict(
            preset="extra_channels", iters=3, step_n=64,
            precompute_targets=True)),
    ):
        try:
            r = benchmark_train_step(**kw)
            out[key] = r["train_iters_per_sec"]
        except Exception as e:  # pragma: no cover - bench resilience
            out[key] = None
            out[key + "_error"] = repr(e)

    try:
        # Fleet (multi-style) aggregate: 4 models, one vmapped program.
        out["train_iters_per_sec_fleet4_aggregate"] = bench_fleet()
    except Exception as e:  # pragma: no cover - bench resilience
        out["train_iters_per_sec_fleet4_aggregate"] = None
        out["fleet_error"] = repr(e)

    try:
        out["train_iters_per_sec_encoder"] = bench_encoder_training()
    except Exception as e:  # pragma: no cover - bench resilience
        out["train_iters_per_sec_encoder"] = None
        out["encoder_error"] = repr(e)

    try:
        # Primary: the reference-faithful iteration shape (step_n=128 total
        # steps, frames tapped after steps 1 and 65 + frameless tail —
        # fit_video_motion.py:229-235). The r2shape key keeps the heavier
        # 3x64-chunk workload BENCH_r01/r02 measured, for cross-round
        # comparability (docs/ROUND3.md).
        vm = benchmark_train_step("video_motion", iters=4,
                                  precompute_targets=True)
        out["train_iters_per_sec_video_motion"] = vm["train_iters_per_sec"]
        vm2 = benchmark_train_step("video_motion", iters=3,
                                   precompute_targets=True,
                                   reference_shape=False)
        out["train_iters_per_sec_video_motion_r2shape"] = (
            vm2["train_iters_per_sec"]
        )
    except Exception as e:  # pragma: no cover - bench resilience
        out.setdefault("train_iters_per_sec_video_motion", None)
        out["video_motion_error"] = repr(e)

    try:
        import contextlib

        sys.path.insert(0, "scripts")
        from bench_torch_cpu import measure

        import os as _os

        with contextlib.redirect_stdout(sys.stderr):  # keep stdout = 1 JSON line
            torch_dt = measure(iters=3)  # median-of-3 (VERDICT r4 weak #3)
        out["torch_cpu_sec_per_iter"] = torch_dt
        out["vs_torch_cpu"] = torch_dt * st["train_iters_per_sec"]
        # Box load when the baseline ran — context for run-to-run drift on
        # the shared single-core box.
        out["torch_cpu_loadavg"] = list(_os.getloadavg())
    except Exception as e:  # pragma: no cover
        out["vs_torch_cpu"] = None
        out["torch_cpu_error"] = repr(e)
    return out


def main():
    # Persistent compilation cache: kernels compiled by previous runs (or
    # the CLI) reload in seconds instead of re-running the remote Mosaic
    # compiler.
    import os

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    n_steps = 96
    results = {}
    for size in (256, 512):
        tf = bench_fused(size, n_steps)
        tx = bench_xla(size, n_steps)
        tf_c, tf_u = tf if tf is not None else (None, None)
        tx_c, tx_u = tx
        best = min(t for t in (tf_c, tx_c) if t is not None)
        results[size] = {
            # chained = primary (device throughput, one dispatch);
            # unchained = per-dispatch canary (r1/r2 methodology) — a
            # divergence between the two flags tunnel-latency drift, not a
            # kernel change (docs/ROUND3.md; ADVICE r3 #4).
            "fused_ms_per_step": 1000 * tf_c / n_steps if tf_c else None,
            "fused_ms_per_step_unchained": (
                1000 * tf_u / n_steps if tf_u else None
            ),
            "xla_ms_per_step": 1000 * tx_c / n_steps,
            "xla_ms_per_step_unchained": 1000 * tx_u / n_steps,
            "cell_updates_per_sec": size * size * n_steps / best,
            "fps_24steps": (n_steps / best) / 24.0,
        }

    train = bench_training()

    # Concurrent-serving aggregate (README headline; VERDICT r3 weak #6).
    try:
        from vsnca_tpu.infer.benchmark import benchmark_serving

        sv = benchmark_serving(size=256, n_streams=8)
        train["serving_aggregate_fps_8x256"] = sv["aggregate_fps"]
    except Exception as e:  # pragma: no cover - bench resilience
        train["serving_aggregate_fps_8x256"] = None
        train["serving_error"] = repr(e)

    # Paired same-process grad ms at the headline shapes (static-texture
    # 128px c12/fc96; flagship 256px; video-motion ms 256px c16/fc128).
    for key, kw in (
        ("grad_pair_128_c12", dict(size=128, c_in=12, fc_dim=96, batch=4)),
        ("grad_pair_256_c12", dict(size=256, c_in=12, fc_dim=96, batch=2)),
        ("grad_pair_256_ms_c16", dict(size=256, c_in=16, fc_dim=128,
                                      batch=2, scales=(0, 1))),
    ):
        try:
            xla_ms, fused_ms = bench_grad_pair(**kw)
            train[key] = {"xla_grad_ms": xla_ms, "fused_grad_ms": fused_ms}
        except Exception as e:  # pragma: no cover - bench resilience
            train[key] = {"error": repr(e)}

    target_cups = 30 * 512 * 512 * 24  # north star: 30fps @512px, 24 steps/frame
    out = {
        "metric": "nca_cell_updates_per_sec_256px",
        "value": results[256]["cell_updates_per_sec"],
        "unit": "cells*steps/s",
        "vs_baseline": results[512]["cell_updates_per_sec"] / target_cups,
        "detail": {
            "fps_256px_24steps": results[256]["fps_24steps"],
            "fps_512px_24steps": results[512]["fps_24steps"],
            "fused_ms_per_step_256": results[256]["fused_ms_per_step"],
            "fused_ms_per_step_256_unchained": results[256][
                "fused_ms_per_step_unchained"
            ],
            "fused_ms_per_step_512_unchained": results[512][
                "fused_ms_per_step_unchained"
            ],
            "xla_ms_per_step_256": results[256]["xla_ms_per_step"],
            "xla_ms_per_step_512": results[512]["xla_ms_per_step"],
            **train,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
