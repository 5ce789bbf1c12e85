"""Fleet training: M independent DyNCA texture models in ONE program.

The reference trains one model per process (ExtraChannels/experiments.py:95-315;
a style library means running the script once per texture). A single DyNCA is
~10^4 params and a handful of small convs — far below what fills a TPU's MXU —
so the TPU-native scale-out of that *workflow* is to stack M models on a
leading axis and train them concurrently, with zero cross-model communication:

- ``mesh=None`` (single chip): ``jax.vmap`` over the model axis — the
  per-channel perception convs and 1x1 MLPs batch into M-deep convs, one
  dispatch per iteration for the whole fleet.
- ``mesh=Mesh(..., ('model',))``: ``shard_map`` over the model axis — each
  device runs its local models' full train step (with the fused Pallas
  custom-VJP rollout when M/n_devices == 1 and the shape is supported, since
  the per-device body is then exactly the single-model program); no
  collectives are needed or emitted (models are independent), so scaling is
  embarrassingly parallel over ICI.

Each model keeps its own params, Adam/LR state, sample pool, host RNG for
pool indexing, and PRNG key sequence — iteration semantics (seed injection
every K iters, without-replacement pool draws, write-back with channel strip)
are exactly ``DyNCATrainer``'s, per model (SURVEY.md §2.4; the per-model key
and RNG sequences match an independent ``DyNCATrainer(seed=seeds[m])``, which
is what the equality tests assert).

Not a reference component — a beyond-parity capability (SURVEY.md §2.7 notes
the reference's only parallelism is batch-level on one device).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vsnca_tpu.config import LossConfig, NCAConfig, TrainConfig
from vsnca_tpu.losses.orchestrator import LossState
from vsnca_tpu.models.dynca import dynca_init, dynca_seed
from vsnca_tpu.train.optim import make_optimizer
from vsnca_tpu.train.trainer import make_train_step


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def make_multi_pooled_step(train_step, m_total: int, mesh=None,
                           model_axis: Optional[str] = None):
    """Vectorize a single-model pooled train step over a leading model axis.

    ``train_step`` is ``make_train_step(...)``'s output. Returns
    ``multi_step(params, opt_state, pools, idx, seed_states, keys, inputs,
    *, step_n, inject)`` where every argument carries a leading ``[M, ...]``
    axis (``inputs`` is a pytree whose leaves all do).
    """

    def one(p, o, pl, ix, ss, k, inp, step_n, inject):
        states = pl[ix]
        if inject:
            states = states.at[:1].set(ss[:1])
        p, o, new_states, loss, logs = train_step(
            p, o, states, k, inp, step_n=step_n
        )
        pl = pl.at[ix].set(new_states)
        return p, o, pl, loss, logs

    @partial(
        jax.jit,
        static_argnames=("step_n", "inject"),
        donate_argnums=(0, 1, 2),
    )
    def multi_step(params, opt_state, pools, idx, seed_states, keys, inputs,
                   *, step_n: int, inject: bool):
        f = lambda p, o, pl, ix, ss, k, inp: one(
            p, o, pl, ix, ss, k, inp, step_n, inject
        )
        if mesh is None:
            return jax.vmap(f)(
                params, opt_state, pools, idx, seed_states, keys, inputs
            )

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        m_loc = m_total // mesh.shape[model_axis]
        spec = P(model_axis)

        def local(p, o, pl, ix, ss, k, inp):
            if m_loc == 1:
                # One model per device: run the single-model program
                # directly (no vmap wrapper), so the fused Pallas rollout
                # path stays selectable on TPU.
                sq = partial(jax.tree_util.tree_map, lambda a: a[0])
                r = f(sq(p), sq(o), sq(pl), sq(ix), sq(ss), sq(k), sq(inp))
                return jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a)[None], r
                )
            return jax.vmap(f)(p, o, pl, ix, ss, k, inp)

        return shard_map(
            local, mesh=mesh, in_specs=(spec,) * 7, out_specs=spec,
            check_vma=False,  # independent models: no collectives, no vma
        )(params, opt_state, pools, idx, seed_states, keys, inputs)

    return multi_step


@dataclasses.dataclass
class MultiTrainLog:
    iteration: int
    losses: np.ndarray  # [M] per-model loss (device array when sync=False)
    logs: Dict[str, np.ndarray]  # each [M]


class MultiStyleTrainer:
    """Concurrent trainer for M independent texture models.

    ``seeds``: one per model; model m reproduces the param init, pool seed,
    pool-index draws and per-iteration PRNG sequence of
    ``DyNCATrainer(nca_cfg, ..., seed=seeds[m])``.

    ``inputs`` at ``train_iteration`` carry a leading model axis: e.g.
    ``target_style`` is ``[M, B, H, W, 3]``; precomputed
    ``target_style_features`` lists are stacked per leaf.

    ``rollout_path=None`` resolves to ``'xla'`` in vmap mode (vmapping the
    Pallas custom-VJP pair is not a supported production path) and
    ``'auto'`` in mesh mode (each device body is the plain single-model
    program when M == n_devices).
    """

    def __init__(
        self,
        nca_cfg: NCAConfig,
        loss_cfg: LossConfig,
        train_cfg: TrainConfig,
        seeds: Sequence[int],
        vgg_params=None,
        msoe_params=None,
        mesh=None,
        rollout_path: Optional[str] = None,
    ):
        assert len(seeds) >= 1
        self.nca_cfg = nca_cfg
        self.train_cfg = train_cfg
        self.n_models = len(seeds)
        self.loss_state = LossState(
            cfg=loss_cfg, vgg_params=vgg_params, msoe_params=msoe_params
        )
        self.mesh = mesh
        self._model_axis = mesh.axis_names[0] if mesh is not None else None
        if mesh is not None:
            n_dev = mesh.shape[self._model_axis]
            assert self.n_models % n_dev == 0, (
                f"n_models {self.n_models} must divide evenly over the "
                f"{n_dev}-device '{self._model_axis}' mesh axis"
            )
        if rollout_path is None:
            rollout_path = "xla" if mesh is None else "auto"

        # Per-model host state, replicating DyNCATrainer's exact key/RNG
        # ordering (trainer.py: dynca_init <- 1st split, pool seed <- 2nd,
        # seed template <- 3rd; one split per subsequent iteration).
        self.rngs: List[np.random.RandomState] = [
            np.random.RandomState(s) for s in seeds
        ]
        self._keys = [jax.random.PRNGKey(s) for s in seeds]
        params_l, pools_l, seed_l = [], [], []
        for m in range(self.n_models):
            params_l.append(dynca_init(self._next_key(m), nca_cfg))
            pools_l.append(
                dynca_seed(
                    nca_cfg, train_cfg.pool_size, train_cfg.img_size,
                    key=self._next_key(m),
                )
            )
            seed_l.append(
                dynca_seed(nca_cfg, 1, train_cfg.img_size,
                           key=self._next_key(m))
            )
        self.params = _stack_trees(params_l)
        self.pools = jnp.stack(pools_l)
        self._seed_templates = jnp.stack(seed_l)
        self.optimizer = make_optimizer(
            train_cfg.lr, train_cfg.lr_decay_steps, train_cfg.lr_decay_gamma
        )
        self.opt_state = jax.vmap(self.optimizer.init)(self.params)

        self._train_step = make_train_step(
            nca_cfg, self.loss_state, self.optimizer, train_cfg.remat,
            rollout_path,
        )
        self._multi_step = make_multi_pooled_step(
            self._train_step, self.n_models, mesh=mesh,
            model_axis=self._model_axis,
        )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._model_sharding = NamedSharding(mesh, P(self._model_axis))
            place = lambda t: jax.tree_util.tree_map(
                lambda a: jax.device_put(a, self._model_sharding), t
            )
            self.params = place(self.params)
            self.opt_state = place(self.opt_state)
            self.pools = place(self.pools)
            self._seed_templates = place(self._seed_templates)

        self._step_rng = np.random.RandomState(train_cfg.seed)
        self.iteration = 0
        self.history: List[MultiTrainLog] = []

    def _next_key(self, m: int):
        self._keys[m], sub = jax.random.split(self._keys[m])
        return sub

    def sample_step_n(self) -> int:
        """One rollout length shared by the whole fleet this iteration
        (lengths are static per jit program), snapped to the nearest
        bucket like DyNCATrainer.sample_step_n."""
        lo, hi = self.train_cfg.step_range
        raw = self._step_rng.randint(lo, hi)
        buckets = np.asarray(self.train_cfg.step_buckets)
        return int(buckets[np.argmin(np.abs(buckets - raw))])

    def train_iteration(
        self,
        inputs: Dict[str, jnp.ndarray],
        step_n: Optional[int] = None,
        sync: bool = True,
    ) -> MultiTrainLog:
        tc = self.train_cfg
        i = self.iteration
        idx = jnp.asarray(
            np.stack([
                self.rngs[m].choice(tc.pool_size, tc.batch_size,
                                    replace=False)
                for m in range(self.n_models)
            ])
        )
        keys = jnp.stack([self._next_key(m) for m in range(self.n_models)])
        inject = bool(tc.inject_seed_every and i % tc.inject_seed_every == 0)
        step_n = step_n if step_n is not None else self.sample_step_n()

        if self.mesh is not None:
            inputs = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, self._model_sharding), inputs
            )

        (
            self.params,
            self.opt_state,
            self.pools,
            losses,
            logs,
        ) = self._multi_step(
            self.params, self.opt_state, self.pools, idx,
            self._seed_templates, keys, inputs,
            step_n=step_n, inject=inject,
        )

        self.iteration += 1
        if sync:
            # ONE host fetch for all models' loss + log terms (axon
            # round-trips cost ~1-5 ms each; see DyNCATrainer).
            names = sorted(logs)
            mat = np.asarray(
                jnp.stack([jnp.asarray(losses, jnp.float32)]
                          + [jnp.asarray(logs[k], jnp.float32)
                             for k in names])
            )
            losses_f = mat[0]
            if not np.all(np.isfinite(losses_f)):
                bad = np.nonzero(~np.isfinite(losses_f))[0].tolist()
                raise FloatingPointError(
                    f"Loss is NaN/Inf for models {bad} at iteration {i}; "
                    "training aborted (reference behavior)"
                )
            log = MultiTrainLog(
                i, losses_f, {k: mat[1 + j] for j, k in enumerate(names)}
            )
            self.history.append(log)
            return log
        return MultiTrainLog(i, losses, logs)

    def model_params(self, m: int):
        """Unstacked params for model m (for export / single-model infer)."""
        return jax.tree_util.tree_map(lambda a: np.asarray(a[m]), self.params)
