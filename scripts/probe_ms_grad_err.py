"""Per-param fused-vs-XLA ms grad errors at w=64 (lane-misaligned views)
and w=128/256 (aligned) — diagnosing the r3b hardware parity failure."""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)

    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import (
        dynca_init, dynca_rollout, make_conditioning,
    )
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat, plan_flat_train,
    )

    for hw_ in (64, 128, 256):
        cfg = NCAConfig(c_in=16, fc_dim=128, padding_mode="circular",
                        perception_scales=(0, 1), conditioning="pos_emb",
                        update_rate=1.0)
        params = dynca_init(jax.random.PRNGKey(0), cfg)
        h = w = hw_
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 16)) - 0.5
        cond = make_conditioning(cfg, (h, w), batch=1)
        plan = plan_flat_train(cfg, h, w, 8, need_dcond=False)
        print(f"size {hw_}: plan {plan}", flush=True)

        def lf(p):
            s, _ = fused_rollout_train_flat(p, x, 5.0, cfg, 8,
                                            cond_nhwc=cond,
                                            cond_no_grad=True)
            return jnp.sum(s ** 2)

        def ls(p):
            s, _ = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, 8,
                                 cond=cond, remat="per_step")
            return jnp.sum(s ** 2)

        gf = jax.jit(jax.grad(lf))(params)
        gs = jax.jit(jax.grad(ls))(params)
        for k in sorted(gf):
            scale = float(jnp.abs(gs[k]).max()) + 1e-12
            err = float(jnp.abs(gf[k] - gs[k]).max()) / scale
            print(f"  {k}: rel-max err {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
