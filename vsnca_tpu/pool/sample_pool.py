"""Sample pools.

Two flavors, mirroring the reference's two training styles:

- ``DevicePool`` — a single device-resident jnp array of states, indexed with
  host-side numpy draws (the DyNCA-style plain-tensor pool,
  ConditioneDyNCA/experiments.py:159,210-216,269). Gather/scatter stay on
  device; only the index vector crosses the host boundary.
- ``ListPool`` — the EncoderConditioning list-backed pool with None entries
  resampled as fresh seeds (EncoderConditioning/sample_pool.py:14-33,
  conditioned_trainer.py:101-115).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class DevicePool:
    """Device-resident state pool [P, H, W, C]."""

    def __init__(self, states: jnp.ndarray):
        self.states = states

    @property
    def size(self) -> int:
        return self.states.shape[0]

    def sample_indices(self, rng: np.random.RandomState, batch: int) -> np.ndarray:
        """Without-replacement batch draw on the host RNG (reference uses
        np.random.choice — experiments.py:210)."""
        return rng.choice(self.size, batch, replace=False)

    def gather(self, idx: np.ndarray) -> jnp.ndarray:
        return self.states[jnp.asarray(idx)]

    def scatter(self, idx: np.ndarray, new_states: jnp.ndarray, keep_channels: Optional[int] = None):
        """Write rollout results back; ``keep_channels`` strips appended
        conditioning channels (the ExtraChannels ``[:, :12]`` strip,
        experiments.py:259/269)."""
        if keep_channels is not None:
            new_states = new_states[..., :keep_channels]
        self.states = self.states.at[jnp.asarray(idx)].set(new_states)

    def inject(self, idx_slot: int, seed_state: jnp.ndarray):
        """Replace one pool slot with a fresh seed (seed injection —
        experiments.py:213-216 does this on the *batch*; we expose the batch
        variant below)."""
        self.states = self.states.at[idx_slot].set(seed_state)


def inject_seed_into_batch(batch_states: jnp.ndarray, seed_state: jnp.ndarray, n: int = 1) -> jnp.ndarray:
    """Replace the first n batch entries with fresh seeds
    (experiments.py:213-216)."""
    return batch_states.at[:n].set(seed_state[:n])


class ListPool:
    """List-backed pool of None-or-host-array entries (EncoderConditioning).

    ``get`` resamples dead/None entries via ``reseed_fn``; ``set`` writes
    grown states back.
    """

    def __init__(self, size: int):
        self.entries: List[Optional[np.ndarray]] = [None] * size

    def __len__(self) -> int:
        return len(self.entries)

    def get(
        self,
        idxs: Sequence[int],
        reseed_fn: Callable[[int], np.ndarray],
        is_dead_fn: Optional[Callable[[np.ndarray], bool]] = None,
    ) -> np.ndarray:
        out = []
        for i in idxs:
            e = self.entries[i]
            if e is None or (is_dead_fn is not None and is_dead_fn(e)):
                e = reseed_fn(1)[0]
            out.append(e)
        return np.stack(out)

    def set(self, idxs: Sequence[int], states: np.ndarray):
        for k, i in enumerate(idxs):
            self.entries[i] = np.asarray(states[k])
