"""DyNCA training harness.

The jitted core (``make_train_step``) fuses: conditioning precompute,
optional content-channel append, 1-step no-grad pre-roll (flow baseline),
the main BPTT rollout (scan + per-step remat), loss, per-parameter gradient
normalization, and the Adam update — one XLA program per rollout-length
bucket.

Host side (``DyNCATrainer``) owns what the reference loop owns
(ConditioneDyNCA/experiments.py:96-325, SURVEY.md §2.4): pool sampling,
seed injection every K iters, rollout-length randomization (bucketed for
jit), NaN abort, pool write-back with channel strip, checkpointing and
metric logging.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vsnca_tpu.config import LossConfig, NCAConfig, TrainConfig
from vsnca_tpu.losses.orchestrator import LossState, make_loss_fn
from vsnca_tpu.models.dynca import (
    dynca_init,
    dynca_rollout,
    dynca_rollout_with_taps,
    dynca_seed,
    dynca_step,
    make_conditioning,
    to_rgb,
)
from vsnca_tpu.pool.sample_pool import DevicePool
from vsnca_tpu.train.optim import make_optimizer


def make_train_step(
    nca_cfg: NCAConfig,
    loss_state: LossState,
    optimizer: optax.GradientTransformation,
    remat: str = "per_step",
    rollout_path: str = "auto",
    mesh=None,
    data_axis: Optional[str] = None,
):
    """Build the jitted train step.

    ``mesh``/``data_axis``: data-parallel mode. The XLA rollout is
    partitioned by GSPMD from the batch sharding alone; the fused Pallas
    custom-VJP pairs run via shard_map (parallel/fused_dp.py) — one kernel
    instance per device on its local batch shard, params replicated,
    gradient psum inserted by shard_map's transpose. The CHW fused
    fallback has no shard_map wrapper and is skipped under a mesh (the
    flat pair covers every production shape).

    Returns step(params, opt_state, states, key, inputs, *, step_n,
    n_motion_frames=0, tap_every=0) →
    (params, opt_state, new_states, loss, logs).

    ``inputs`` is a dict of device arrays; recognized keys:
      target_style [B,H,W,3]      appearance target, in [-1,1]
      aux_imgs     [B,H,W,3]      auxiliary/content frames, in [-1,1]
      aux_gs       [B,H,W,1]      grayscale content (edge cond / extra channel)
      target_motion_frames [T,B,H,W,3]  target video window for video-motion
      target_style_features             optional precomputed VGG feature list
                                        for target_style (constant across
                                        iterations; see
                                        losses.appearance.precompute_target_style_features)
      target_motion_features [T-1,h,w,320]  optional precomputed MSOE features
                                        of the window's consecutive pairs
                                        (losses.video_motion.precompute_target_motion_features)
    """
    if loss_state.cfg.style_consistency_weight != 0 and loss_state.nca_cfg is None:
        # style-consistency grows a fresh seed with the live params
        # (style_consistency_loss.py:15-37) — it needs the model config.
        loss_state = dataclasses.replace(loss_state, nca_cfg=nca_cfg)
    loss_fn = make_loss_fn(loss_state)
    cfg = loss_state.cfg

    @partial(
        jax.jit,
        static_argnames=(
            "step_n", "n_motion_frames", "tap_every", "tap_chunks",
            "tail_steps",
        ),
    )
    def train_step(
        params,
        opt_state,
        states,
        key,
        inputs: Dict[str, jnp.ndarray],
        *,
        step_n: int,
        n_motion_frames: int = 0,
        tap_every: int = 0,
        tap_chunks=(),
        tail_steps: int = 0,
    ):
        b = states.shape[0]
        hw = states.shape[1:3]

        # Content channel append (ExtraChannels: experiments.py:211).
        if nca_cfg.n_seed_channels < nca_cfg.c_in:
            states = jnp.concatenate([states, inputs["aux_gs"]], axis=-1)

        cond = make_conditioning(
            nca_cfg, hw, cond_img=inputs.get("aux_gs"), batch=b
        )

        key, k_pre, k_roll, k_loss = jax.random.split(key, 4)

        # 1-step pre-roll for the optic-flow baseline, no grad
        # (experiments.py:220).
        rgb_before = None
        if cfg.vector_field_motion_weight != 0:
            pre_state = jax.lax.stop_gradient(
                dynca_step(params, states, k_pre, nca_cfg, cond)
            )
            rgb_before = to_rgb(pre_state, nca_cfg.c_out)

        from vsnca_tpu.ops.pallas_train import (
            fused_rollout_train,
            fused_rollout_train_flat,
            fused_train_flat_supported,
            fused_train_flat_taps_supported,
            fused_train_supported,
        )

        want_fused = rollout_path == "fused" or (
            rollout_path == "auto" and jax.default_backend() == "tpu"
        )

        def call_flat(p, x, k_i, c, tap_steps=()):
            """One fused flat rollout call — shard_map'd per batch shard
            under a data-parallel mesh, plain custom-VJP call otherwise."""
            seed_f = jax.random.randint(k_i, (), 0, 1 << 30).astype(
                jnp.float32
            )
            if mesh is not None:
                from vsnca_tpu.parallel.fused_dp import (
                    fused_rollout_train_flat_dp,
                )

                return fused_rollout_train_flat_dp(
                    mesh, data_axis, p, x, seed_f, nca_cfg, c,
                    cond_nhwc=cond, cond_no_grad=True, tap_steps=tap_steps,
                )
            return fused_rollout_train_flat(
                p, x, seed_f, nca_cfg, c, cond_nhwc=cond,
                cond_no_grad=True, tap_steps=tap_steps,
            )
        # need_dcond=False: the trainer's conditioning is a
        # positional-encoding constant or a stop-gradient'd edge
        # map (make_conditioning) — no cond cotangent needed.
        # Tapped (video-motion) rollouts run as CHUNKS of fused steps, one
        # frame emitted per chunk (reference fit_video_motion.py:230-235).
        # ``tap_chunks``/``tail_steps`` (see models.dynca.tap_schedule) give
        # the reference-faithful schedule — frames after steps
        # 1, 1+64, ... plus a frameless tail to step_n; the legacy
        # (n_motion_frames, tap_every) form maps to equal chunks, no tail.
        if tap_chunks:
            schedule = tuple(int(c) for c in tap_chunks)
            sched_tail = int(tail_steps)
        elif n_motion_frames > 0:
            schedule = (tap_every,) * n_motion_frames
            sched_tail = 0
        else:
            schedule = None
            sched_tail = 0
        n_frames = len(schedule) if schedule else 0

        def flat_ok(c):
            return c > 0 and fused_train_flat_supported(
                nca_cfg, hw[0], hw[1], c, need_dcond=False
            )

        if schedule is not None:
            frame_steps = []
            acc = 0
            for c_ in schedule:
                acc += c_
                frame_steps.append(acc)
            total_steps = acc + sched_tail
            # Preferred: ONE fused call with IN-KERNEL taps (frames are
            # checkpoint slices in the forward; the backward injects their
            # cotangents at the tap steps) — no per-chunk calls and no
            # separate 1-step program for the schedule's step-1 frame.
            # A degenerate schedule whose only frame IS the final state
            # (e.g. tap_chunks=(k,) with tail 0) has no interior taps —
            # the plain chunked path below handles it.
            tap_list = tuple(s_ for s_ in frame_steps if s_ < total_steps)
            taps_inkernel = (
                want_fused
                and bool(tap_list)
                and fused_train_flat_taps_supported(
                    nca_cfg, hw[0], hw[1], total_steps, need_dcond=False
                )
            )
            # Fallback: per-chunk path choice — fused where the flat plan
            # supports the chunk length, XLA scan otherwise (1-step chunks
            # stay on XLA).
            chunk_fused = {
                c: want_fused and c > 1 and flat_ok(c)
                for c in set(schedule) | {sched_tail}
            }
            use_flat = taps_inkernel or any(
                chunk_fused[c] for c in schedule
            )
            use_fused = use_flat
            if rollout_path == "fused" and not taps_inkernel:
                # When the one-call taps path runs, no per-chunk kernel is
                # ever launched — only the total_steps support check above
                # gates it; the per-chunk requirement applies to the
                # chunked fallback alone.
                assert all(
                    chunk_fused[c] for c in schedule + (sched_tail,)
                    if c > 1
                ), (
                    "rollout_path='fused' but the flat training kernel "
                    "does not support every tap-schedule chunk length"
                )
        else:
            use_flat = want_fused and flat_ok(step_n)
            use_fused = use_flat or (
                want_fused
                and mesh is None  # CHW fallback has no shard_map wrapper
                and fused_train_supported(nca_cfg, hw[0], hw[1], step_n)
            )
            if rollout_path == "fused":
                assert use_fused, (
                    "rollout_path='fused' but no fused training kernel "
                    "supports this config/shape"
                )

        def objective(p):
            input_dict = {}
            if schedule is not None:
                if taps_inkernel:
                    # One fused kernel pair for the whole tapped rollout
                    # (fit_video_motion.py:230-235).
                    state_after, rgb_last, frames = call_flat(
                        p, states, k_roll, total_steps, tap_steps=tap_list
                    )
                    if frame_steps[-1] == total_steps:
                        frames = frames + [rgb_last]
                elif use_flat or tap_chunks:
                    # Chunked schedule: one rollout call per chunk (fused
                    # kernel pair where the plan supports the length, XLA
                    # scan otherwise), frame emitted per chunk, then the
                    # frameless tail (fit_video_motion.py:230-235).
                    x_cur = states
                    frames = []
                    ks = jax.random.split(k_roll, n_frames + 1)
                    def run_chunk(p, x, k_i, c):
                        if chunk_fused[c]:
                            return call_flat(p, x, k_i, c)
                        return dynca_rollout(
                            p, x, k_i, nca_cfg, c, cond=cond, remat=remat
                        )

                    for i, c in enumerate(schedule):
                        x_cur, rgb_i = run_chunk(p, x_cur, ks[i], c)
                        frames.append(rgb_i)
                    if sched_tail:
                        x_cur, _ = run_chunk(
                            p, x_cur, ks[n_frames], sched_tail
                        )
                    state_after = x_cur
                else:
                    state_after, frames = dynca_rollout_with_taps(
                        p, states, k_roll, nca_cfg, n_frames,
                        tap_every, cond=cond, remat=remat,
                    )
                rgb_after = frames[-1]
                input_dict["generated_image_list_motion"] = [
                    frames[i] for i in range(n_frames)
                ]
                if "target_motion_frames" in inputs:
                    input_dict["target_motion_image_list"] = [
                        inputs["target_motion_frames"][i]
                        for i in range(n_frames)
                    ]
            else:
                if use_fused:
                    # segment-checkpointed custom-VJP kernel pair: BPTT
                    # entirely in VMEM (ops/pallas_train.py); the flat
                    # layout is preferred (measured faster, see
                    # docs/ROUND2.md), CHW pair as fallback.
                    if use_flat:
                        state_after, rgb_after = call_flat(
                            p, states, k_roll, step_n
                        )
                    else:
                        seed_f = jax.random.randint(
                            k_roll, (), 0, 1 << 30
                        ).astype(jnp.float32)
                        state_after, rgb_after = fused_rollout_train(
                            p, states, seed_f, nca_cfg, step_n, cond_nhwc=cond
                        )
                else:
                    state_after, rgb_after = dynca_rollout(
                        p, states, k_roll, nca_cfg, step_n, cond=cond,
                        remat=remat,
                    )

            input_dict["nca_state"] = state_after
            if n_frames > 0:
                # appearance supervises EVERY tapped frame against the style
                # frame (fit_video_motion.py:243-256 builds target_image_list
                # with one style-frame entry per generated frame)
                input_dict["generated_image_list"] = (
                    input_dict["generated_image_list_motion"]
                )
            else:
                input_dict["generated_image_list"] = [rgb_after]
            input_dict["step_n"] = jnp.asarray(step_n, jnp.float32)
            if rgb_before is not None:
                input_dict["generated_image_before_nca"] = rgb_before
                input_dict["generated_image_after_nca"] = rgb_after
            if "target_style" in inputs:
                input_dict["target_image_list"] = [inputs["target_style"]] * len(
                    input_dict["generated_image_list"]
                )
            if "aux_imgs" in inputs:
                input_dict["auxillary_image_list"] = [inputs["aux_imgs"]]
                input_dict["content_image"] = inputs["aux_imgs"]
            if "target_style_features" in inputs:
                input_dict["target_style_features"] = inputs[
                    "target_style_features"
                ]
            if n_frames > 0 and "target_motion_features" in inputs:
                input_dict["target_motion_feature_list"] = [
                    inputs["target_motion_features"][i]
                    for i in range(n_frames - 1)
                ]
            if cfg.style_consistency_weight != 0:
                # Live params for the fresh-seed grow; the term is
                # stop_gradient'd inside, matching the reference's no_grad
                # (SURVEY.md C13), so this adds no gradient path.
                input_dict["nca_params"] = p
                if "aux_gs" in inputs:
                    input_dict["style_consistency_cond_img"] = inputs["aux_gs"]

            loss, logs = loss_fn(input_dict, k_loss)
            return loss, (state_after, logs)

        (loss, (state_after, logs)), grads = jax.value_and_grad(
            objective, has_aux=True
        )(params)

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # Pool write-back strips appended conditioning channels
        # (experiments.py:269).
        new_states = state_after[..., : nca_cfg.n_seed_channels]
        return params, opt_state, new_states, loss, logs

    return train_step


def make_pooled_train_step(train_step, batch_sharding=None):
    """Wrap a train step so pool gather / seed-injection / scatter execute
    INSIDE one jitted program with buffer donation — a single device
    dispatch per training iteration (host-side pool indexing costs several
    tunnel round-trips per iteration otherwise).

    ``batch_sharding`` (data-parallel mode): a NamedSharding over the mesh
    'data' axis; the gathered batch is sharding-constrained to it so the
    rollout/loss/grad run data-parallel and XLA inserts the gradient
    all-reduce (SURVEY.md §5.8).
    """

    @partial(
        jax.jit,
        static_argnames=(
            "step_n", "n_motion_frames", "tap_every", "tap_chunks",
            "tail_steps", "inject",
        ),
        donate_argnums=(0, 1, 2),
    )
    def pooled_step(
        params,
        opt_state,
        pool_states,
        idx,
        seed_state,
        key,
        inputs,
        *,
        step_n: int,
        n_motion_frames: int = 0,
        tap_every: int = 0,
        tap_chunks=(),
        tail_steps: int = 0,
        inject: bool = False,
    ):
        states = pool_states[idx]
        if inject:
            states = states.at[:1].set(seed_state[:1])
        if batch_sharding is not None:
            states = jax.lax.with_sharding_constraint(states, batch_sharding)
        params, opt_state, new_states, loss, logs = train_step(
            params, opt_state, states, key, inputs,
            step_n=step_n, n_motion_frames=n_motion_frames,
            tap_every=tap_every, tap_chunks=tap_chunks,
            tail_steps=tail_steps,
        )
        pool_states = pool_states.at[idx].set(new_states)
        if batch_sharding is not None:
            pool_states = jax.lax.with_sharding_constraint(
                pool_states, batch_sharding
            )
        return params, opt_state, pool_states, loss, logs

    return pooled_step


@dataclasses.dataclass
class TrainLog:
    iteration: int
    loss: float  # may be a device scalar when sync=False
    logs: Dict[str, float]
    lr: Optional[float] = None


class DyNCATrainer:
    """Host-side training loop mirroring the reference harness behaviors."""

    def __init__(
        self,
        nca_cfg: NCAConfig,
        loss_cfg: LossConfig,
        train_cfg: TrainConfig,
        vgg_params=None,
        msoe_params=None,
        seed: Optional[int] = None,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh with a 'data' axis — the
        trainer then runs data-parallel: params/optimizer replicated, pool +
        batch sharded on the leading dim, gradient all-reduce inserted by
        XLA from the sharding annotations (no NCCL analogue — SURVEY §5.8).
        The reference has no distributed backend; this is the TPU-native
        scale-out of its batch-level parallelism."""
        self.nca_cfg = nca_cfg
        self.train_cfg = train_cfg
        self.loss_state = LossState(
            cfg=loss_cfg, vgg_params=vgg_params, msoe_params=msoe_params
        )
        s = train_cfg.seed if seed is None else seed
        self.rng = np.random.RandomState(s)
        self.key = jax.random.PRNGKey(s)

        self.params = dynca_init(self._next_key(), nca_cfg)
        self.optimizer = make_optimizer(
            train_cfg.lr, train_cfg.lr_decay_steps, train_cfg.lr_decay_gamma
        )
        self.opt_state = self.optimizer.init(self.params)
        self.pool = DevicePool(
            dynca_seed(
                nca_cfg, train_cfg.pool_size, train_cfg.img_size,
                key=self._next_key(),
            )
        )
        rollout_path = getattr(train_cfg, "rollout_path", "auto")
        # mesh + fused compose: the flat custom-VJP pair runs via shard_map
        # over the batch axis (parallel/fused_dp.py) — no downgrade.
        if rollout_path in ("auto", "fused") and jax.default_backend() == "tpu":
            from vsnca_tpu.ops.pallas_train import (
                fused_train_flat_supported,
                fused_train_supported,
            )

            h, w = train_cfg.img_size
            if any(
                fused_train_flat_supported(nca_cfg, h, w, n, need_dcond=False)
                or fused_train_supported(nca_cfg, h, w, n)
                for n in train_cfg.step_buckets
            ):
                print(
                    "[vsnca_tpu] fused custom-VJP training kernels selected: "
                    "the first compile per rollout-length bucket takes "
                    "seconds to minutes (remote Mosaic); set "
                    "rollout_path='xla' in TrainConfig to skip. Tapped "
                    "(video-motion) rollouts run as ONE fused call with "
                    "in-kernel taps when supported, else per-tap fused "
                    "chunks.",
                    flush=True,
                )
        self.mesh = mesh
        self._data_axis = mesh.axis_names[0] if mesh is not None else None
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            n_dev = mesh.shape[axis]
            assert train_cfg.batch_size % n_dev == 0, (
                f"batch_size {train_cfg.batch_size} must divide evenly over "
                f"the {n_dev}-device '{axis}' mesh axis"
            )
            assert train_cfg.pool_size % n_dev == 0, (
                f"pool_size {train_cfg.pool_size} must divide evenly over "
                f"the {n_dev}-device '{axis}' mesh axis"
            )
            self._rep_sharding = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, P(axis))
            self._time_major_sharding = NamedSharding(mesh, P(None, axis))
        self._rollout_path = rollout_path
        self._train_step = make_train_step(
            nca_cfg, self.loss_state, self.optimizer, train_cfg.remat,
            rollout_path, mesh=mesh, data_axis=self._data_axis,
        )
        self._pooled_step = make_pooled_train_step(
            self._train_step, self._batch_sharding
        )
        self._seed_template = dynca_seed(
            nca_cfg, 1, train_cfg.img_size, key=self._next_key()
        )
        if mesh is not None:
            self.params = jax.device_put(self.params, self._rep_sharding)
            self.opt_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._rep_sharding)
                if hasattr(x, "ndim") else x,
                self.opt_state,
            )
            self.pool.states = jax.device_put(
                self.pool.states, self._batch_sharding
            )
            self._seed_template = jax.device_put(
                self._seed_template, self._rep_sharding
            )
        self.iteration = 0
        self.history: list = []

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def rebuild_loss(self, new_cfg: LossConfig):
        """Swap loss weights (dynamic calibration) — re-jits the step."""
        self.loss_state = dataclasses.replace(self.loss_state, cfg=new_cfg)
        self._train_step = make_train_step(
            self.nca_cfg, self.loss_state, self.optimizer,
            self.train_cfg.remat, self._rollout_path,
            mesh=self.mesh, data_axis=self._data_axis,
        )
        self._pooled_step = make_pooled_train_step(
            self._train_step, self._batch_sharding
        )

    def sample_step_n(self) -> int:
        """Random rollout length snapped to the nearest jit bucket."""
        lo, hi = self.train_cfg.step_range
        raw = self.rng.randint(lo, hi)
        buckets = np.asarray(self.train_cfg.step_buckets)
        return int(buckets[np.argmin(np.abs(buckets - raw))])

    def train_iteration(
        self,
        inputs: Dict[str, jnp.ndarray],
        step_n: Optional[int] = None,
        n_motion_frames: int = 0,
        tap_every: int = 0,
        tap_chunks=(),
        tail_steps: int = 0,
        sync: bool = True,
    ) -> TrainLog:
        """One training iteration as a single device dispatch.

        ``tap_chunks``/``tail_steps`` (see models.dynca.tap_schedule) run
        the reference-faithful tapped rollout: one frame per chunk plus a
        frameless tail, step_n total steps. The legacy
        (n_motion_frames, tap_every) form rolls n*tap equal chunks.

        ``sync=False`` skips the host round-trip for the loss value (the
        NaN guard then fires on the next synced iteration) — use for all
        but every log_every-th iteration when driving over a high-latency
        link.
        """
        tc = self.train_cfg
        i = self.iteration

        batch_idx_np = self.pool.sample_indices(self.rng, tc.batch_size)
        self.last_batch_idx = batch_idx_np  # for anomaly recovery
        batch_idx = jnp.asarray(batch_idx_np)
        inject = bool(tc.inject_seed_every and i % tc.inject_seed_every == 0)

        step_n = step_n if step_n is not None else self.sample_step_n()

        if self.mesh is not None:
            inputs = {k: self._place_input(k, v) for k, v in inputs.items()}

        (
            self.params,
            self.opt_state,
            self.pool.states,
            loss,
            logs,
        ) = self._pooled_step(
            self.params,
            self.opt_state,
            self.pool.states,
            batch_idx,
            self._seed_template,
            self._next_key(),
            inputs,
            step_n=step_n,
            n_motion_frames=n_motion_frames,
            tap_every=tap_every,
            tap_chunks=tuple(tap_chunks),
            tail_steps=tail_steps,
            inject=inject,
        )

        self.iteration += 1
        if sync:
            # ONE blocking host fetch for loss + every log term: each
            # float(device_scalar) is a separate tunnel round-trip on the
            # axon backend (~1-5 ms each), so per-term fetches put 10-25 ms
            # of pure latency in every synced iteration.
            names = sorted(logs)
            vec = np.asarray(
                jnp.stack(
                    [jnp.asarray(loss, jnp.float32)]
                    + [jnp.asarray(logs[k], jnp.float32) for k in names]
                )
            )
            loss_f = float(vec[0])
            if not np.isfinite(loss_f):
                raise FloatingPointError(
                    f"Loss is NaN/Inf at iteration {i}; training aborted "
                    "(reference behavior: train_failed.txt + exit)"
                )
            log = TrainLog(i, loss_f, dict(zip(names, map(float, vec[1:]))))
            self.history.append(log)
            return log
        return TrainLog(i, loss, logs)

    def _place_input(self, k: str, v):
        """Data-parallel input placement: batch-leading arrays shard over
        the data axis; target_motion_frames is [T, B, ...] (batch on axis
        1); everything else replicates."""
        if isinstance(v, (list, tuple)):
            return type(v)(self._place_input(k, e) for e in v)
        if not hasattr(v, "ndim"):
            return v
        if k == "target_motion_frames":
            return jax.device_put(v, self._time_major_sharding)
        if k == "target_motion_features":  # [T-1, h, w, 320]: pairs, not batch
            return jax.device_put(v, self._rep_sharding)
        if v.ndim >= 1 and v.shape[0] == self.train_cfg.batch_size:
            return jax.device_put(v, self._batch_sharding)
        return jax.device_put(v, self._rep_sharding)

    def reseed_pool_slots(self, idx: np.ndarray):
        """Anomaly recovery: replace diverged slots with fresh seeds
        (fit_video_motion.py:316-327)."""
        seeds = dynca_seed(
            self.nca_cfg, len(idx), self.train_cfg.img_size, key=self._next_key()
        )
        self.pool.scatter(idx, seeds)
