#!/usr/bin/env python
"""Hardware validation of the custom-VJP fused rollout (ops/pallas_train.py)
under STOCHASTIC masks — the part interpret-mode tests cannot cover because
interpret-mode pltpu.prng_random_bits returns zeros (CLAUDE.md).

Checks on the real TPU:
1. determinism: same seed → bit-identical rollout;
2. mask fraction: the update rate is honored (≈ 1-(1-rate)^n cells change);
3. finite differences: analytic grads of the custom backward match central
   differences through the ACTUAL stochastic forward (same seed → same
   masks, so the function is deterministic and differentiable a.e.).

Run: python scripts/validate_fused_tpu.py    (takes a few minutes: two
Mosaic kernel compiles through the axon remote compiler)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.jit(lambda x: x + 1)(jnp.ones(4)).block_until_ready()  # axon warmup
    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import dynca_init
    from vsnca_tpu.ops.pallas_train import fused_rollout_train

    cfg = NCAConfig(c_in=8, fc_dim=16, padding_mode="circular", update_rate=0.5)
    p = dynca_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 8, 128, 8)) - 0.5

    s1, _ = fused_rollout_train(p, x, 7.0, cfg, 8)
    s2, _ = fused_rollout_train(p, x, 7.0, cfg, 8)
    det = float(jnp.abs(np.asarray(s1) - np.asarray(s2)).max())
    assert det == 0.0, f"nondeterministic: {det}"
    changed = float((np.asarray(s1) != np.asarray(x)).mean())
    expect = 1.0 - (1.0 - cfg.update_rate) ** 8
    assert abs(changed - expect) < 0.02, (changed, expect)
    print(f"determinism OK; changed-cell fraction {changed:.4f} "
          f"(expected ~{expect:.4f})")

    def f(b2):
        _, rgb = fused_rollout_train({**p, "b2": b2}, x, 7.0, cfg, 16)
        return jnp.sum(rgb ** 2)

    g = jax.grad(f)(p["b2"])
    eps = 1e-3
    scale = float(jnp.abs(g).max())
    worst = 0.0
    for i in range(int(p["b2"].shape[0])):
        e = jnp.zeros_like(p["b2"]).at[i].set(eps)
        fd = float((f(p["b2"] + e) - f(p["b2"] - e)) / (2 * eps))
        an = float(g[i])
        err = abs(an - fd) / scale
        worst = max(worst, err)
        print(f"b2[{i}]: analytic {an:12.4f}  fd {fd:12.4f}  "
              f"err/|g|max {err:.3%}")
    # tolerance is relative to the GRADIENT SCALE: central differences of an
    # f32 16-step rollout carry O(1%)-of-scale truncation/cancellation noise
    # on small coordinates (plus genuine relu-kink nonsmoothness), so a
    # per-coordinate relative test would flag near-zero entries spuriously.
    assert worst < 0.03, f"FD mismatch: {worst:.3%} of gradient scale"
    print(f"finite differences OK (worst {worst:.3%} of gradient scale) — "
          "custom VJP validated under stochastic masks on hardware")


if __name__ == "__main__":
    main()
