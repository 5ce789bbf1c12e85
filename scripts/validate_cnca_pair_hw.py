"""Hardware validation + timing of the fused cnca custom-VJP train pair.

1. fire_rate=1 equality of fused_cnca_train fwd + all grads vs the XLA
   scan AT THE PRODUCTION SHAPE (64px, c20, d64, b8, 64 steps) on the real
   chip (interpret mode diverges from hardware — CLAUDE.md).
2. Production encoder-trainer it/s A/B: rollout_path='fused' (auto on TPU)
   vs 'xla', device pool + single-program iteration in both.

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

    from vsnca_tpu.config import ConditionedNCAConfig
    from vsnca_tpu.models.conditioned_nca import (
        conditioned_nca_init,
        conditioned_nca_seed,
        conditioned_nca_step,
        encode_goal,
    )
    from vsnca_tpu.ops.pallas_cnca import (
        fused_cnca_train,
        fused_cnca_train_supported,
    )

    out = {}

    # ---- 1. hardware equality at the production shape, fire_rate=1 ----
    cfg = ConditionedNCAConfig(image_size=64, cell_fire_rate=1.0)
    assert fused_cnca_train_supported(cfg, 64, 64)
    params = conditioned_nca_init(jax.random.PRNGKey(0), cfg)
    b, n = 8, 64
    x = conditioned_nca_seed(cfg, b, 64) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (b, 64, 64, cfg.num_channels)
    )
    goal_img = jax.random.uniform(jax.random.PRNGKey(2), (b, 64, 64, 3))

    def loss_xla(p, xx):
        genc = encode_goal(p, cfg, goal_img)

        def body(carry, k):
            return conditioned_nca_step(p, carry, genc, k, cfg), None

        y, _ = jax.lax.scan(body, xx,
                            jax.random.split(jax.random.PRNGKey(3), n))
        return jnp.sum(y**2), y

    def loss_fused(p, xx):
        genc = encode_goal(p, cfg, goal_img)
        y = fused_cnca_train(p, xx, genc, jnp.float32(7.0), cfg, n)
        return jnp.sum(y**2), y

    def run_pair(nn, label):
        def lx_fn(p, xx):
            genc = encode_goal(p, cfg, goal_img)

            def body(carry, k):
                return conditioned_nca_step(p, carry, genc, k, cfg), None

            y, _ = jax.lax.scan(body, xx,
                                jax.random.split(jax.random.PRNGKey(3), nn))
            return jnp.sum(y**2), y

        def lf_fn(p, xx):
            genc = encode_goal(p, cfg, goal_img)
            y = fused_cnca_train(p, xx, genc, jnp.float32(7.0), cfg, nn)
            return jnp.sum(y**2), y

        (lx, yx), gx = jax.jit(jax.value_and_grad(
            lx_fn, argnums=(0, 1), has_aux=True))(params, x)
        yx_h = np.asarray(yx)
        (lf, yf), gf = jax.jit(jax.value_and_grad(
            lf_fn, argnums=(0, 1), has_aux=True))(params, x)
        yf_h = np.asarray(yf)
        ydiff = float(np.abs(yx_h - yf_h).max())
        gmax = 0.0
        for (pa, a), (_, bb) in zip(
            jax.tree_util.tree_flatten_with_path(gx)[0],
            jax.tree_util.tree_flatten_with_path(gf)[0],
        ):
            d = float(np.abs(np.asarray(a) - np.asarray(bb)).max())
            m = float(np.abs(np.asarray(a)).max()) + 1e-12
            gmax = max(gmax, d / m)
            print(f"[{label}] grad {jax.tree_util.keystr(pa)}: "
                  f"rel maxdiff {d/m:.3e}", flush=True)
        out[f"{label}_y_maxdiff"] = ydiff
        out[f"{label}_grad_rel_maxdiff"] = gmax
        out[f"{label}_loss_rel"] = abs(float(lx) - float(lf)) / abs(float(lx))
        print(f"[{label}] y maxdiff {ydiff:.3e}, grads {gmax:.3e}, "
              f"loss rel {out[f'{label}_loss_rel']:.3e}", flush=True)
        return yx_h, yf_h

    # Short horizon: rounding can't amplify through the discrete alive
    # gates yet — this is the STRICT kernel-correctness check.
    run_pair(8, "n8")
    # Production horizon: pointwise divergence here is chaotic
    # amplification, not kernel error — bounded by the CONTROL below.
    yx64, yf64 = run_pair(n, "n64")
    out["n64_y_stats"] = {
        "xla_mean": float(yx64.mean()), "fused_mean": float(yf64.mean()),
        "xla_std": float(yx64.std()), "fused_std": float(yf64.std()),
    }

    # CONTROL: the same XLA scan at two matmul precisions. If XLA-vs-XLA
    # diverges comparably at 64 steps, pointwise n64 parity is unattainable
    # for ANY lowering and the statistical agreement is the right bar.
    def lx_n(p, xx):
        genc = encode_goal(p, cfg, goal_img)

        def body(carry, k):
            return conditioned_nca_step(p, carry, genc, k, cfg), None

        y, _ = jax.lax.scan(body, xx,
                            jax.random.split(jax.random.PRNGKey(3), n))
        return y

    with jax.default_matmul_precision("highest"):
        y_hi = np.asarray(jax.jit(lx_n)(params, x))
    out["control_xla_prec_y_maxdiff"] = float(np.abs(y_hi - yx64).max())
    print(f"CONTROL xla default-vs-highest @n={n}: "
          f"y maxdiff {out['control_xla_prec_y_maxdiff']:.3e}", flush=True)

    # n8 precision control: bounds how much a single matmul-rounding flip
    # of the DISCRETE alive gate moves the state even at short horizon
    # (the test state deliberately puts many alphas near the threshold).
    def lx_n8(p, xx):
        genc = encode_goal(p, cfg, goal_img)

        def body(carry, k):
            return conditioned_nca_step(p, carry, genc, k, cfg), None

        y, _ = jax.lax.scan(body, xx,
                            jax.random.split(jax.random.PRNGKey(3), 8))
        return y

    y8_d = np.asarray(jax.jit(lx_n8)(params, x))
    with jax.default_matmul_precision("highest"):
        y8_h = np.asarray(jax.jit(lx_n8)(params, x))
    out["control_xla_prec_n8_y_maxdiff"] = float(np.abs(y8_h - y8_d).max())
    print(f"CONTROL xla default-vs-highest @n=8: "
          f"y maxdiff {out['control_xla_prec_n8_y_maxdiff']:.3e}", flush=True)

    # STRICT kernel check with NO discrete gates: use_living_channel=False
    # removes the alive/life thresholds, so fused-vs-XLA differences stay
    # at rounding scale and a real adjoint bug cannot hide.
    cfg_nl = ConditionedNCAConfig(image_size=64, cell_fire_rate=1.0,
                                  use_living_channel=False)
    params_nl = conditioned_nca_init(jax.random.PRNGKey(0), cfg_nl)
    x_nl = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (b, 64, 64, cfg_nl.num_channels)
    )

    def mk_losses(nn):
        def lx_fn(p, xx):
            genc = encode_goal(p, cfg_nl, goal_img)

            def body(carry, k):
                return conditioned_nca_step(p, carry, genc, k, cfg_nl), None

            y, _ = jax.lax.scan(body, xx,
                                jax.random.split(jax.random.PRNGKey(3), nn))
            return jnp.sum(y**2), y

        def lf_fn(p, xx):
            genc = encode_goal(p, cfg_nl, goal_img)
            y = fused_cnca_train(p, xx, genc, jnp.float32(7.0), cfg_nl, nn)
            return jnp.sum(y**2), y

        return lx_fn, lf_fn

    for nn in (8, 64):
        lx_fn, lf_fn = mk_losses(nn)
        (lx2, yx2), gx2 = jax.jit(jax.value_and_grad(
            lx_fn, argnums=(0, 1), has_aux=True))(params_nl, x_nl)
        (lf2, yf2), gf2 = jax.jit(jax.value_and_grad(
            lf_fn, argnums=(0, 1), has_aux=True))(params_nl, x_nl)
        yd = float(np.abs(np.asarray(yx2) - np.asarray(yf2)).max())
        gmax = 0.0
        for a, bb in zip(jax.tree_util.tree_leaves(gx2),
                         jax.tree_util.tree_leaves(gf2)):
            d = float(np.abs(np.asarray(a) - np.asarray(bb)).max())
            m = float(np.abs(np.asarray(a)).max()) + 1e-12
            gmax = max(gmax, d / m)
        out[f"nolife_n{nn}_y_maxdiff"] = yd
        out[f"nolife_n{nn}_grad_rel_maxdiff"] = gmax
        print(f"[nolife n{nn}] y maxdiff {yd:.3e}, grads rel {gmax:.3e}",
              flush=True)

    ok = (out["nolife_n8_y_maxdiff"] < 1e-3
          and out["nolife_n8_grad_rel_maxdiff"] < 1e-2
          and out["n64_loss_rel"] < 1e-2
          and out["n64_y_maxdiff"] < 2.0 * max(
              out["control_xla_prec_y_maxdiff"], 1e-6))
    print(f"HARDWARE PARITY {'OK' if ok else 'FAILED'} "
          f"(gate-free strict; gated = statistical, bounded by the XLA "
          f"precision control)", flush=True)

    # ---- 2. production trainer it/s: fused vs xla ----
    from vsnca_tpu.data.dataset import ConditioningDataset
    from vsnca_tpu.data.preprocess import synthetic_video, synthetic_style_image
    from vsnca_tpu.models.vgg import load_vgg16

    from vsnca_tpu.train.encoder_trainer import ConditionedNCATrainer

    dataset = ConditioningDataset(
        (np.asarray(synthetic_video((64, 64), 8)) + 1.0) / 2.0
    )
    style = jnp.asarray(synthetic_style_image((64, 64), 1))
    vgg, _ = load_vgg16()
    for rp in ("fused", "xla"):
        tr = ConditionedNCATrainer(
            ConditionedNCAConfig(image_size=64), dataset, style, vgg,
            step_buckets=(64,), pool_size=64, rollout_path=rp,
        )
        tr.train_iteration(batch_size=8, num_steps=64)
        tr.train_iteration(batch_size=8, num_steps=64)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(8):
                tr.train_iteration(batch_size=8, num_steps=64)
            dt = (time.perf_counter() - t0) / 8
            best = dt if best is None else min(best, dt)
        out[f"production_{rp}_ms"] = 1000 * best
        out[f"production_{rp}_it_per_sec"] = 1.0 / best
        print(f"production {rp}: {1000*best:.1f} ms/iter "
              f"({1/best:.2f} it/s)", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
