"""Checkpointing: full training state (params + optimizer + pool + RNG),
fixing the reference's whole-module pickle with no resume support
(SURVEY.md §5.4).

Backends: orbax-checkpoint (default when importable — atomic, async-safe,
sharding-aware) with a plain-pickle fallback sharing the same API.
Checkpoints are pytree-of-arrays only — no code objects — so they are
portable across versions. ``load_checkpoint`` auto-detects the backend.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    state: Dict[str, Any],
    metadata: Optional[dict] = None,
    backend: str = "auto",
):
    """state: dict of pytrees (params, opt_state, pool, key, iteration...)."""
    os.makedirs(path, exist_ok=True)
    host_state = _to_numpy_tree(state)
    use_orbax = _HAS_ORBAX if backend == "auto" else backend == "orbax"
    if use_orbax:
        ckptr = ocp.PyTreeCheckpointer()
        target = os.path.join(os.path.abspath(path), "orbax")
        ckptr.save(target, host_state, force=True)
    else:
        with open(os.path.join(path, "state.pkl"), "wb") as f:
            pickle.dump(host_state, f)
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def load_checkpoint(path: str) -> Dict[str, Any]:
    orbax_dir = os.path.join(os.path.abspath(path), "orbax")
    if _HAS_ORBAX and os.path.isdir(orbax_dir):
        return ocp.PyTreeCheckpointer().restore(orbax_dir)
    with open(os.path.join(path, "state.pkl"), "rb") as f:
        return pickle.load(f)


def load_metadata(path: str) -> Optional[dict]:
    p = os.path.join(path, "metadata.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
