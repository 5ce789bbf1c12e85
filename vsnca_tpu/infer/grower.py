"""Interactive grower — the programmatic equivalent of the ipycanvas
visualizer (EncoderConditioning/visualisation.ipynb cell 8, SURVEY.md C33):
step-by-step growth with goal switching and click-to-damage, suitable for
driving from a notebook/UI loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vsnca_tpu.config import ConditionedNCAConfig
from vsnca_tpu.models.conditioned_nca import (
    conditioned_nca_seed,
    conditioned_nca_step,
    encode_goal,
)


class InteractiveGrower:
    def __init__(
        self,
        params: dict,
        cfg: ConditionedNCAConfig,
        goal_image: jnp.ndarray,
        size: Optional[int] = None,
        key: Optional[jax.Array] = None,
    ):
        self.params = params
        self.cfg = cfg
        self.size = size or cfg.image_size
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.state = conditioned_nca_seed(cfg, 1, self.size)
        self.set_goal(goal_image)
        self._step_fn = jax.jit(
            lambda p, s, g, k: conditioned_nca_step(p, s, g, k, cfg)
        )
        # Multi-step chunks route through the fused whole-rollout kernel on
        # TPU (one dispatch per chunk instead of one per step — the
        # interactive grower is dispatch-bound at 64^2).
        from vsnca_tpu.ops.pallas_cnca import fused_cnca_supported

        self._use_fused = (
            jax.default_backend() == "tpu"
            and fused_cnca_supported(cfg, self.size, self.size)
        )

    def _split(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def set_goal(self, goal_image: jnp.ndarray):
        """Switch the goal mid-growth (the notebook's goal buttons).
        goal_image: [1, H, W, 3]."""
        self.goal_encoding = encode_goal(self.params, self.cfg, goal_image)

    def reset(self):
        self.state = conditioned_nca_seed(self.cfg, 1, self.size)

    def step(self, n: int = 1) -> np.ndarray:
        if n > 1 and self._use_fused:
            from vsnca_tpu.ops.pallas_cnca import fused_cnca_rollout

            seed = int(jax.random.randint(self._split(), (), 0, 1 << 30))
            self.state = fused_cnca_rollout(
                self.params, self.state, self.goal_encoding, seed,
                self.cfg, n,
            )
            return self.rgb()
        for _ in range(n):
            self.state = self._step_fn(
                self.params, self.state, self.goal_encoding, self._split()
            )
        return self.rgb()

    def rgb(self) -> np.ndarray:
        rgb = self.state[0, ..., : self.cfg.num_target_channels]
        return np.asarray(jnp.clip(rgb, 0.0, 1.0))

    def damage(self, x: int, y: int, radius: int = 3):
        """Zero a circular patch around (x, y) — the click-to-damage brush
        (visualisation.ipynb cell 8 / docs/dynca.js paint tool)."""
        yy, xx = np.ogrid[: self.size, : self.size]
        mask = (xx - x) ** 2 + (yy - y) ** 2 <= radius**2
        keep = jnp.asarray(~mask, self.state.dtype)[None, :, :, None]
        self.state = self.state * keep
