#!/usr/bin/env python
"""Interactive-grower demo (visualisation.ipynb equivalent): grow toward a
goal, switch goals mid-run, apply click-damage, dump a frame strip.

Example:
    python examples/interactive_growth.py --checkpoint out/encoder/checkpoint
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--out", default="out/growth")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsnca_tpu.config import ConditionedNCAConfig
    from vsnca_tpu.data.preprocess import synthetic_video
    from vsnca_tpu.export.checkpoint import load_checkpoint
    from vsnca_tpu.infer.grower import InteractiveGrower
    from vsnca_tpu.models.conditioned_nca import conditioned_nca_init
    from vsnca_tpu.utils.display import save_image_grid

    s = args.image_size
    cfg = ConditionedNCAConfig(image_size=s)
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint)["params"]
    else:
        params = conditioned_nca_init(jax.random.PRNGKey(0), cfg)

    goals = jnp.asarray(synthetic_video((s, s), 2))
    g = InteractiveGrower(params, cfg, goals[0:1])

    frames = [g.step(16) for _ in range(4)]       # grow
    g.damage(s // 2, s // 2, radius=s // 8)        # damage the center
    frames.append(g.rgb())
    frames += [g.step(16) for _ in range(2)]       # regenerate
    g.set_goal(goals[1:2])                         # switch goal
    frames += [g.step(16) for _ in range(2)]

    os.makedirs(args.out, exist_ok=True)
    save_image_grid(np.stack(frames), os.path.join(args.out, "growth_strip.png"))
    print(f"wrote {args.out}/growth_strip.png ({len(frames)} stages)")


if __name__ == "__main__":
    main()
