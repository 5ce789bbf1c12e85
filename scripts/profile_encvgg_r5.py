"""Isolate the encoder trainer's ~107 ms loss marginal (r5).

docs/hw_r5/encoder_marginals.log: device-resident train-twice is 143.8 ms
of which rollout_only is 36.4 — the loss path (VGG style+content fwd+bwd
at 64px b8, OT metric) costs ~107 ms while its conv FLOPs are ~40 GFLOP
(sub-ms at MXU rates). This micro times the loss subgraph alone (grad wrt
the generated batch) and ablates: OT vs Gram, content on/off, a merged
generated+targets single VGG pass, bf16 VGG, and batch scaling b1 vs b8
(batch-independent time = per-op latency floor, batch-proportional =
throughput-bound).

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


def time_grad(loss_fn, x, iters=8):
    g = jax.jit(jax.grad(loss_fn))
    _fetch(g(x))

    def round_():
        t0 = time.perf_counter()
        for _ in range(iters):
            gr = g(x)
        _fetch(gr)
        return (time.perf_counter() - t0) / iters * 1e3

    return min(round_(), round_())


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

    from vsnca_tpu.models.vgg import (
        load_vgg16,
        vgg16_content_features,
        vgg16_style_features,
    )
    from vsnca_tpu.losses.appearance import gram_loss, ot_style_loss

    vgg, _ = load_vgg16()
    key = jax.random.PRNGKey(0)
    style = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    style_feats = [
        jax.lax.stop_gradient(f) for f in vgg16_style_features(vgg, style)
    ]
    out = {}

    for b in (8, 1):
        gen = jax.random.uniform(jax.random.PRNGKey(2), (b, 64, 64, 3))
        tgt = jax.random.uniform(jax.random.PRNGKey(3), (b, 64, 64, 3))
        tiled = [jnp.repeat(f, b, axis=0) for f in style_feats]

        def loss_full(x):
            gf = vgg16_style_features(vgg, x)
            l = ot_style_loss(gf, tiled, key, 1000)
            cg = vgg16_content_features(vgg, x)
            ct = jax.lax.stop_gradient(vgg16_content_features(vgg, tgt))
            return l + jnp.mean((cg - ct) ** 2)

        def loss_app_only(x):
            gf = vgg16_style_features(vgg, x)
            return ot_style_loss(gf, tiled, key, 1000)

        def loss_gram(x):
            gf = vgg16_style_features(vgg, x)
            return gram_loss(gf, tiled)

        def loss_content_only(x):
            cg = vgg16_content_features(vgg, x)
            ct = jax.lax.stop_gradient(vgg16_content_features(vgg, tgt))
            return jnp.mean((cg - ct) ** 2)

        def loss_merged(x):
            # generated + targets through ONE stacked VGG pass: the target
            # half is constant, but the op count halves vs two passes.
            both = jnp.concatenate([x, tgt], axis=0)
            gf = vgg16_style_features(vgg, both)
            gf_gen = [f[:b] for f in gf]
            l = ot_style_loss(gf_gen, tiled, key, 1000)
            cg = vgg16_content_features(vgg, both)
            return l + jnp.mean(
                (cg[:b] - jax.lax.stop_gradient(cg[b:])) ** 2
            )

        vgg16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), vgg)

        def loss_bf16(x):
            gf = vgg16_style_features(vgg16, x.astype(jnp.bfloat16))
            gf = [f.astype(jnp.float32) for f in gf]
            l = ot_style_loss(gf, tiled, key, 1000)
            cg = vgg16_content_features(vgg16, x.astype(jnp.bfloat16))
            ct = jax.lax.stop_gradient(
                vgg16_content_features(vgg16, tgt.astype(jnp.bfloat16))
            )
            return l + jnp.mean(
                (cg.astype(jnp.float32) - ct.astype(jnp.float32)) ** 2
            )

        for name, fn in [
            ("full", loss_full), ("app_only", loss_app_only),
            ("gram", loss_gram), ("content_only", loss_content_only),
            ("merged", loss_merged), ("bf16", loss_bf16),
        ]:
            ms = time_grad(fn, gen)
            out[f"{name}_b{b}_ms"] = ms
            print(f"{name} b{b}: {ms:.2f} ms", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
