"""Device-mesh utilities (SURVEY.md §5.8).

The reference is single-GPU with no distributed backend; the TPU-native
scale-out story is:

- ``data`` axis: pool-sample/style data parallelism — params replicated,
  batch sharded, gradients all-reduced by XLA from the sharding annotations.
- ``space`` axis: spatial sharding of the H dimension for very large grids,
  with 1-row halo exchange over ICI for the 3x3 perception stencil
  (vsnca_tpu.parallel.spatial) — the NCA analogue of context parallelism.

No NCCL-style backend is built: XLA collectives over `jax.sharding.Mesh`
are the communication layer.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a Mesh; default one 'data' axis over all devices."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    assert int(np.prod(shape)) == len(devices), (
        f"mesh {axes} needs {int(np.prod(shape))} devices, have {len(devices)}"
    )
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_along(x, mesh: Mesh, axis_name: str, dim: int = 0):
    spec = [None] * getattr(x, "ndim", 1)
    spec[dim] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
