"""EncoderConditioning training harness (BASELINE config 5).

Parity targets: EncoderConditioning/conditioned_trainer.py:27-181,
trainer.py:11-88, loss/loss.py:17-76. Protocol:

- list-backed pool; None or fully-dead entries (alive-mask sum == 0) are
  resampled as fresh seeds; the first 2 batch slots are ALWAYS fresh seeds;
  each sampled batch is trained TWICE (conditioned_trainer.py:167-171).
- per train_batch: grow 48-96 steps (bucketed for jit), loss = overflow +
  appearance(style) + content(goal), per-parameter grad normalization
  (eps 1e-10 here, matching conditioned_trainer.py:136), Adam lr 2e-3,
  MultiStepLR([5000], 0.3).
- optional circular damage: random-centered radius-r disks zeroed in the
  last ``num_damaged`` batch entries (conditioned_trainer.py:92-99,
  utils/utils.py:39-56).
- loss inputs are the RAW state RGB channels and a [0,1] style image — the
  EncoderConditioning stack does NOT rescale [-1,1]→[0,1]
  (loss/appearance_loss.py:69-71 commented out).
"""

from __future__ import annotations

import math
import random
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vsnca_tpu.config import ConditionedNCAConfig
from vsnca_tpu.losses.appearance import gram_loss, ot_style_loss, sliced_wasserstein_loss
from vsnca_tpu.losses.overflow import overflow_loss
from vsnca_tpu.models.conditioned_nca import (
    conditioned_nca_grow,
    conditioned_nca_init,
    conditioned_nca_seed,
    conditioned_nca_step,
    encode_goal,
)
from vsnca_tpu.models.vgg import vgg16_content_features, vgg16_style_features
from vsnca_tpu.pool.sample_pool import ListPool
from vsnca_tpu.train.optim import multistep_lr


def create_2d_circular_mask(h, w, rng: np.random.RandomState, radius: int = 3):
    """Random-centered circular damage mask (utils/utils.py:39-56; the
    reference's missing-numpy-import bug fixed)."""
    center = (
        rng.randint(radius + 2, w - (radius + 2)),
        rng.randint(radius + 2, h - (radius + 2)),
    )
    yy, xx = np.ogrid[:h, :w]
    dist = np.sqrt((xx - center[0]) ** 2 + (yy - center[1]) ** 2)
    return dist <= radius


def make_encoder_loss_fn(
    vgg_params,
    style_image: jnp.ndarray,
    appearance_loss_type: str = "OT",
    appearance_weight: float = 1.0,
    content_weight: float = 1.0,
    overflow_weight: float = 1.0,
    ot_subsample: int = 1000,
):
    """Loss = overflow + appearance(vs style, precomputed features) +
    content(vs goal image) on raw generated RGB (loss/loss.py:17-76).

    style_image: [1, H, W, 3] in [0, 1].
    """
    style_feats = None
    if appearance_weight:
        style_feats = [
            jax.lax.stop_gradient(f)
            for f in vgg16_style_features(
                vgg_params, style_image,
                include_image_as_feat=appearance_loss_type == "SlW",
            )
        ]

    def loss_fn(nca_state, generated, targets, key):
        logs: Dict[str, jnp.ndarray] = {}
        total = jnp.asarray(0.0, jnp.float32)
        if overflow_weight:
            l = overflow_loss(nca_state) * overflow_weight
            logs["overflow"] = l
            total += l
        if appearance_weight:
            gen_feats = vgg16_style_features(
                vgg_params, generated,
                include_image_as_feat=appearance_loss_type == "SlW",
            )
            b = generated.shape[0]
            tiled = [jnp.repeat(f, b, axis=0) for f in style_feats]
            if appearance_loss_type == "Gram":
                l = gram_loss(gen_feats, tiled)
            elif appearance_loss_type == "SlW":
                key, sub = jax.random.split(key)
                l = sliced_wasserstein_loss(gen_feats, tiled, sub)
            else:
                key, sub = jax.random.split(key)
                l = ot_style_loss(gen_feats, tiled, sub, ot_subsample)
            l = l * appearance_weight
            logs["appearance"] = l
            total += l
        if content_weight:
            gf = vgg16_content_features(vgg_params, generated)
            tf_ = jax.lax.stop_gradient(vgg16_content_features(vgg_params, targets))
            l = jnp.mean((gf - tf_) ** 2) * content_weight
            logs["content"] = l
            total += l
        return total, logs

    return loss_fn


class ConditionedNCATrainer:
    def __init__(
        self,
        cfg: ConditionedNCAConfig,
        dataset,
        style_image: jnp.ndarray,
        vgg_params,
        nca_steps=(48, 96),
        step_buckets=(48, 64, 80, 96),
        lr: float = 2e-3,
        pool_size: int = 512,
        num_damaged: int = 0,
        damage_radius: int = 3,
        appearance_loss_type: str = "OT",
        appearance_weight: float = 1.0,
        content_weight: float = 1.0,
        overflow_weight: float = 1.0,
        seed: int = 0,
        recovery_patience: int = 0,
        recovery_factor: float = 3.0,
        device_pool: bool = True,
        grow_remat: str = "per_step",
        rollout_path: str = "auto",
    ):
        self.cfg = cfg
        self.dataset = dataset
        # BPTT remat policy for the grow rollout: "per_step" (O(1) rollout
        # memory, recompute in backward) or "none" (activations live; at
        # 64px b8 c20 x 96 steps that is ~720 MB — well within HBM — and
        # skips the forward recompute).
        self.grow_remat = grow_remat
        # Rollout lowering: 'auto' takes the fused custom-VJP cnca pair
        # (ops/pallas_cnca.py::fused_cnca_train) on the TPU backend when the
        # grid fits its VMEM scope — the XLA scan costs 272 us/step b8 at
        # 64^2 vs the fused forward's 56.6 us (docs/hw_r5/cnca_timing.log).
        # 'fused' forces it (tests run it under force_tpu_interpret_mode);
        # 'xla' keeps the scan. Mask streams differ between the two paths
        # (per-step on-core PRNG vs jax.random) — distributional parity,
        # bit-exact at cell_fire_rate=1.0 (tests/test_pallas_cnca.py).
        from vsnca_tpu.ops.pallas_cnca import fused_cnca_train_supported

        s = cfg.image_size
        if rollout_path == "auto":
            self._use_fused_rollout = (
                jax.default_backend() == "tpu"
                and fused_cnca_train_supported(cfg, s, s)
            )
        elif rollout_path == "fused":
            assert fused_cnca_train_supported(cfg, s, s), (
                f"fused cnca pair unsupported at {s}x{s} "
                f"c{cfg.num_channels}"
            )
            self._use_fused_rollout = True
        else:
            assert rollout_path == "xla", rollout_path
            self._use_fused_rollout = False
        self.min_steps, self.max_steps = nca_steps
        self.step_buckets = step_buckets
        self.num_damaged = num_damaged
        self.damage_radius = damage_radius

        self.rng = np.random.RandomState(seed)
        self.py_rng = random.Random(seed)
        self.key = jax.random.PRNGKey(seed)

        self.params = conditioned_nca_init(self._next_key(), cfg)
        self.optimizer = optax.chain(
            optax.stateless(
                lambda g, p: jax.tree_util.tree_map(
                    lambda x: x / (jnp.linalg.norm(x.reshape(-1)) + 1e-10), g
                )
            ),
            optax.adam(multistep_lr(lr, (5000,), 0.3)),
        )
        self.opt_state = self.optimizer.init(self.params)
        # Device-resident pool (default): the host ListPool's get/set cycle
        # moves 2x batch x H x W x C floats across the host boundary every
        # iteration — measured 623 ms of a 767 ms iteration at 64px b8 on
        # the axon tunnel (docs/hw_r5/encoder_marginals.log). Keeping the
        # pool as one [P, H, W, C] device array turns that into a device
        # gather + scatter; iteration semantics are unchanged (ListPool's
        # None entries read as fresh seeds, which is exactly the device
        # pool's seed initialization; dead entries are reseeded at gather).
        self.device_pool = device_pool
        self.pool = ListPool(pool_size)
        if device_pool:
            self.pool_states = conditioned_nca_seed(cfg, pool_size)
            # Constant 2-seed template (forced fresh seeds + dead reseeds):
            # built once — rebuilding it per iteration is several tiny
            # dispatches over the tunnel.
            self._seed2 = conditioned_nca_seed(cfg, 2)
            thr = cfg.alpha_living_threshold
            alive_ch = cfg.alive_channel
            use_living = cfg.use_living_channel

            def _assemble(pool, idx, seeds2):
                batch = pool[idx]
                if use_living:
                    amax = jnp.max(batch[..., alive_ch], axis=(1, 2))
                    dead = ~(amax > thr)
                    batch = jnp.where(
                        dead[:, None, None, None], seeds2[:1], batch
                    )
                return batch.at[:2].set(seeds2)

            self._assemble = _assemble
            self._gather = jax.jit(_assemble)

            @partial(jax.jit, donate_argnums=(0,))
            def _scatter(pool, idx, new_states):
                return pool.at[idx].set(new_states)

            self._scatter = _scatter
            self._pair_cache: Dict = {}
        self.loss_fn = make_encoder_loss_fn(
            vgg_params, style_image, appearance_loss_type,
            appearance_weight, content_weight, overflow_weight,
        )
        self._step_cache: Dict[int, callable] = {}
        self.iteration = 0
        self.history = []

        # Collapse recovery (framework aux, SURVEY 5.3 analogue): alive-
        # masked NCAs have an absorbing all-dead attractor (every cell's
        # alpha under the living threshold -> black output, constant loss,
        # ~zero gradient). The reference has no defense (it trains 100k
        # epochs and ships whichever checkpoint worked); here, when the loss
        # stays above recovery_factor x best for recovery_patience
        # consecutive epochs, training restores the best-loss params,
        # reseeds the WHOLE pool, and resets the optimizer state. Disabled
        # when recovery_patience == 0.
        self.recovery_patience = recovery_patience
        self.recovery_factor = recovery_factor
        self.best_loss = float("inf")
        self.best_iteration = -1
        self._best_params = None
        self._plateau = 0
        self.recoveries = []

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _pool_size(self) -> int:
        return (
            self.pool_states.shape[0] if self.device_pool else len(self.pool)
        )

    def _step_body(self, num_steps: int):
        """Un-jitted single train-batch step (shared by the per-step jit
        and the fused pooled-pair program)."""
        cfg = self.cfg
        loss_fn = self.loss_fn
        optimizer = self.optimizer
        remat = self.grow_remat
        use_fused = self._use_fused_rollout

        def step(params, opt_state, batch, targets, key):
            k_grow, k_loss = jax.random.split(key)

            def objective(p):
                if use_fused:
                    from vsnca_tpu.ops.pallas_cnca import fused_cnca_train

                    genc = encode_goal(p, cfg, targets)
                    seed_f = jax.random.randint(
                        k_grow, (), 0, jnp.int32(2**30 - 1)
                    ).astype(jnp.float32)
                    grown = fused_cnca_train(
                        p, batch, genc, seed_f, cfg, num_steps
                    )
                else:
                    grown = conditioned_nca_grow(
                        p, batch, targets, k_grow, cfg, num_steps,
                        remat=remat,
                    )
                generated = grown[..., : cfg.num_target_channels]
                loss, logs = loss_fn(grown, generated, targets, k_loss)
                return loss, (grown, logs)

            (loss, (grown, logs)), grads = jax.value_and_grad(
                objective, has_aux=True
            )(params)
            if cfg.use_living_channel:
                logs["alive_frac"] = jnp.mean(
                    (
                        grown[..., cfg.alive_channel]
                        > cfg.alpha_living_threshold
                    ).astype(jnp.float32)
                )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, grown, loss, logs

        return step

    def _pooled_pair_fn(self, n1: int, n2: int):
        """ONE jitted program for a full device-pool iteration: batch
        assembly (gather + dead-reseed + forced seeds) → train step n1 →
        train step n2 → pool scatter. Collapses 4 dispatches to 1 — each
        dispatch costs ms-class host latency on the tunneled backend
        (docs/hw_r5/encoder_marginals2.log: 101 ms of dispatch/fetch
        overhead above the chained device time)."""
        key = (n1, n2)
        if key not in self._pair_cache:
            assemble = self._assemble
            step1 = self._step_body(n1)
            step2 = self._step_body(n2)

            @partial(jax.jit, donate_argnums=(0, 1, 2))
            def pair(params, opt_state, pool, idx, seeds2, targets, k1, k2):
                # k1/k2 are the SAME two keys the two-dispatch path draws,
                # so both paths produce identical iterations.
                batch = assemble(pool, idx, seeds2)
                params, opt_state, batch, _, _ = step1(
                    params, opt_state, batch, targets, k1
                )
                params, opt_state, batch, loss, logs = step2(
                    params, opt_state, batch, targets, k2
                )
                pool = pool.at[idx].set(batch)
                return params, opt_state, pool, loss, logs

            self._pair_cache[key] = pair
        return self._pair_cache[key]

    def _train_batch_fn(self, num_steps: int):
        if num_steps not in self._step_cache:
            self._step_cache[num_steps] = jax.jit(self._step_body(num_steps))
        return self._step_cache[num_steps]

    def sample_num_steps(self) -> int:
        raw = self.py_rng.randint(self.min_steps, self.max_steps)
        buckets = np.asarray(self.step_buckets)
        return int(buckets[np.argmin(np.abs(buckets - raw))])

    def _is_dead(self, entry: np.ndarray) -> bool:
        """Host-side equivalent of ``sum(alive_mask) == 0``: the stride-1
        3x3 maxpool has any cell above the living threshold iff the raw
        alpha max is above it — so the check is one numpy max on the
        host-resident pool entry instead of a blocking device round-trip
        per entry (batch_size fetches/iteration over the axon tunnel)."""
        if not self.cfg.use_living_channel:
            return False
        a = np.asarray(entry)[..., self.cfg.alive_channel]
        # float32 comparison, matching the device kernel's dtype (a Python
        # double threshold would mis-classify exact-threshold alphas).
        return not bool(a.max() > np.float32(self.cfg.alpha_living_threshold))

    def damage(self, batch: jnp.ndarray) -> jnp.ndarray:
        """Zero circular patches in the LAST num_damaged entries
        (conditioned_trainer.py:92-99)."""
        size = batch.shape[0]
        s = batch.shape[1]
        for i in range(self.num_damaged):
            mask = create_2d_circular_mask(s, s, self.rng, self.damage_radius)
            idx = max(size - i - 1, 0)
            batch = batch.at[idx].set(
                batch[idx] * (~mask[:, :, None]).astype(batch.dtype)
            )
        return batch

    def train_iteration(self, batch_size: int = 8, num_steps: Optional[int] = None):
        """One epoch: sample pool batch (2 forced fresh seeds), train the
        batch TWICE, write back (conditioned_trainer.py:158-177)."""
        idxs = self.py_rng.sample(range(self._pool_size()), batch_size)
        targets = self.dataset.sample(self.rng, batch_size)
        n1 = num_steps if num_steps is not None else self.sample_num_steps()

        if self.device_pool and not self.num_damaged:
            # Fast path: the whole iteration (assemble -> train-twice ->
            # write-back) is ONE jitted program + one metrics fetch.
            n2 = (
                num_steps if num_steps is not None else self.sample_num_steps()
            )
            pair = self._pooled_pair_fn(n1, n2)
            (
                self.params,
                self.opt_state,
                self.pool_states,
                loss,
                logs,
            ) = pair(
                self.params, self.opt_state, self.pool_states,
                jnp.asarray(idxs), self._seed2, targets,
                self._next_key(), self._next_key(),
            )
            outputs = None
        else:
            if self.device_pool:
                batch = self._gather(
                    self.pool_states, jnp.asarray(idxs), self._seed2
                )
            else:
                def reseed(n):
                    return np.asarray(conditioned_nca_seed(self.cfg, n))

                batch_np = self.pool.get(
                    idxs, reseed, is_dead_fn=self._is_dead
                )
                batch = jnp.asarray(batch_np)
                batch = batch.at[:2].set(conditioned_nca_seed(self.cfg, 2))
            if self.num_damaged:
                batch = self.damage(batch)

            step1 = self._train_batch_fn(n1)
            self.params, self.opt_state, outputs, loss, logs = step1(
                self.params, self.opt_state, batch, targets, self._next_key()
            )
            n2 = (
                num_steps if num_steps is not None else self.sample_num_steps()
            )
            step2 = self._train_batch_fn(n2)
            self.params, self.opt_state, outputs, loss, logs = step2(
                self.params, self.opt_state, outputs, targets, self._next_key()
            )

            # Queue the pool write-back BEFORE the blocking metrics fetch so
            # the scatter dispatch rides the same device stream.
            if self.device_pool:
                self.pool_states = self._scatter(
                    self.pool_states, jnp.asarray(idxs), outputs
                )

        # One blocking fetch for loss + all metric scalars (per-term float()
        # is one tunnel round-trip each on the axon backend).
        names = sorted(logs)
        vec = np.asarray(
            jnp.stack(
                [jnp.asarray(loss, jnp.float32)]
                + [jnp.asarray(logs[k], jnp.float32) for k in names]
            )
        )
        loss_f = float(vec[0])
        if not np.isfinite(loss_f):
            raise FloatingPointError(f"loss NaN/Inf at epoch {self.iteration}")

        if not self.device_pool:
            self.pool.set(idxs, np.asarray(outputs))
        metrics = dict(zip(names, map(float, vec[1:])))
        metrics["log10loss"] = math.log10(loss_f + 1e-5)
        self.iteration += 1

        if loss_f < self.best_loss:
            self.best_loss = loss_f
            self.best_iteration = self.iteration
            self._plateau = 0
            # Device-side snapshot (async device copy, no host round-trip):
            # early training improves most epochs and a host fetch per
            # improvement is a blocking tunnel round-trip. Must be a real
            # COPY — the fused pair program donates the params buffers, so
            # a no-copy reference would be invalidated next iteration.
            self._best_params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a).copy(), self.params
            )
        elif self.recovery_patience and loss_f > self.recovery_factor * self.best_loss:
            self._plateau += 1
            if self._plateau >= self.recovery_patience:
                self.recover()
                metrics["recovered"] = 1.0
        else:
            self._plateau = 0

        self.history.append((self.iteration, loss_f, metrics))
        return loss_f, metrics

    def recover(self):
        """Restore the best-loss params, reseed the whole pool, reset the
        optimizer state — escape from the absorbing all-dead attractor (see
        ctor note). No-op if no best snapshot exists yet."""
        if self._best_params is None:
            return
        # COPY (not reference): the fused pair program donates self.params,
        # which must never invalidate the held best snapshot.
        self.params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).copy(), self._best_params
        )
        self.opt_state = self.optimizer.init(self.params)
        if self.device_pool:
            self.pool_states = conditioned_nca_seed(
                self.cfg, self.pool_states.shape[0]
            )
        else:
            self.pool = ListPool(len(self.pool))
        self._plateau = 0
        self.recoveries.append((self.iteration, self.best_iteration, self.best_loss))

    def grow_preview(self, goal_images: jnp.ndarray, num_steps: int = 96):
        """Grow fresh seeds toward goals; returns RGB in [0, 1] (clamped)."""
        seeds = conditioned_nca_seed(self.cfg, goal_images.shape[0])
        grown = conditioned_nca_grow(
            self.params, seeds, goal_images, self._next_key(), self.cfg, num_steps
        )
        rgb = grown[..., : self.cfg.num_target_channels]
        return jnp.clip(rgb, 0.0, 1.0)
