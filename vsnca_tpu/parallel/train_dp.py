"""Data-parallel training over a mesh 'data' axis.

Parameters/optimizer state are replicated; pool states and per-batch inputs
are sharded on the batch dimension. Gradients are all-reduced automatically
by XLA: the jitted step is annotated with NamedShardings and the compiler
inserts the psum over ICI (scaling-book recipe — no hand-written
collectives needed for pure DP).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsnca_tpu.parallel.mesh import replicate, shard_along


def make_dp_train_step(train_step, mesh: Mesh, axis: str = "data"):
    """Wrap a make_train_step product with data-parallel shardings.

    Returns dp_step(params, opt_state, states, key, inputs, **static) where
    states/inputs lead with a batch dim divisible by the axis size.
    """
    batch_sharding = NamedSharding(mesh, P(axis))

    time_major_sharding = NamedSharding(mesh, P(None, axis))

    def dp_step(params, opt_state, states, key, inputs: Dict, **static):
        params = replicate(params, mesh)
        opt_state = jax.tree_util.tree_map(
            lambda x: replicate(x, mesh) if hasattr(x, "ndim") else x, opt_state
        )
        states = jax.device_put(states, batch_sharding)

        def place(k, v):
            if not hasattr(v, "ndim"):
                return v
            if k == "target_motion_frames":
                # [T, B, ...] — batch is axis 1, not 0
                return jax.device_put(v, time_major_sharding)
            if v.ndim >= 1 and v.shape[0] == states.shape[0]:
                return jax.device_put(v, batch_sharding)
            return replicate(v, mesh)

        inputs = {k: place(k, v) for k, v in inputs.items()}
        return train_step(params, opt_state, states, key, inputs, **static)

    return dp_step
