"""Benchmark harness: steps/sec, cell-updates/sec, stylized frames/sec.

The TPU equivalent of the browser ``ca.benchmark()``
(docs/dynca.js:1134-1190): timed rollouts with device synchronization
(block_until_ready) instead of a 1-pixel readback flush, plus a per-stage
breakdown (perception / FC / update-mask) measured by compiling each stage
standalone.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.models.dynca import (
    dynca_init,
    dynca_rollout,
    dynca_seed,
    make_conditioning,
)


def _fetch(x) -> None:
    """Force completion by fetching one element to the host.

    On the experimental axon platform ``block_until_ready`` returns without
    draining the execution queue; a device→host transfer is the only
    reliable fence.
    """
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def _timeit_chained(step, x0, warmup: int = 2, iters: int = 10) -> float:
    """Average seconds per call of ``x = step(x)`` with the calls chained
    through their data dependency (serializes execution on-device) and a
    single host fetch at the end as the fence."""
    x = x0
    for _ in range(warmup):
        x = step(x)
    _fetch(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    _fetch(x)
    return (time.perf_counter() - t0) / iters


def benchmark_rollout(
    nca_cfg: Optional[NCAConfig] = None,
    size: int = 256,
    batch: int = 1,
    n_steps: int = 96,
    step_n_per_frame: int = 24,
    iters: int = 10,
) -> Dict[str, float]:
    """Benchmark the inference rollout; returns a metrics dict.

    cell_updates_per_sec counts B*H*W*steps; frames_per_sec assumes
    ``step_n_per_frame`` NCA steps per stylized output frame (the
    reference's nca_base_num_steps=24)."""
    cfg = nca_cfg or NCAConfig(c_in=12, fc_dim=96, conditioning="pos_emb")
    key = jax.random.PRNGKey(0)
    params = dynca_init(key, cfg)
    x = dynca_seed(cfg, batch, size)
    if cfg.n_seed_channels < cfg.c_in:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:3] + (cfg.c_in - cfg.n_seed_channels,), x.dtype)],
            axis=-1,
        )
    cond = make_conditioning(
        cfg, (size, size),
        cond_img=jnp.zeros((batch, size, size, 1)) if cfg.conditioning == "edges" else None,
        batch=batch,
    )

    roll = partial(
        dynca_rollout, cfg=cfg, n_steps=n_steps, cond=cond, remat="none"
    )

    def step(x):
        state, rgb = roll(params, x, key)
        return state

    t = _timeit_chained(step, x, iters=iters)
    steps_per_sec = n_steps / t
    cells = batch * size * size
    return {
        "size": size,
        "batch": batch,
        "n_steps": n_steps,
        "sec_per_rollout": t,
        "ms_per_step": 1000.0 * t / n_steps,
        "steps_per_sec": steps_per_sec,
        "cell_updates_per_sec": steps_per_sec * cells,
        "frames_per_sec": steps_per_sec / step_n_per_frame,
    }


def benchmark_stages(
    nca_cfg: Optional[NCAConfig] = None,
    size: int = 256,
    batch: int = 1,
    iters: int = 20,
) -> Dict[str, float]:
    """Per-stage breakdown — the TPU analogue of ca.benchmark()'s
    Perception / FC / Stochastic-Update timings (docs/dynca.js:1134-1190).

    Each stage is compiled standalone and timed with chained inputs, so the
    numbers include per-dispatch overhead exactly once per stage call.
    """
    from vsnca_tpu.ops.perception import perceive_multiscale

    cfg = nca_cfg or NCAConfig(c_in=12, fc_dim=96)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, cfg.c_in)) - 0.5

    percept = jax.jit(
        lambda x: perceive_multiscale(x, cfg.perception_scales, cfg.padding_mode)
    )
    y0 = percept(x)

    @jax.jit
    def fc(y):
        h = jax.nn.relu(jnp.einsum("bhwf,fd->bhwd", y, params["w1"]) + params["b1"])
        return jnp.einsum("bhwd,dc->bhwc", h, params["w2"]) + params["b2"]

    @jax.jit
    def update(x):
        mask = jnp.floor(
            jax.random.uniform(jax.random.PRNGKey(2), x.shape[:3] + (1,)) + 0.5
        )
        return x + x * mask

    def timed_fixed(fn, arg, n=iters):
        out = fn(arg)
        _fetch(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(arg)
            _fetch(out)
        return (time.perf_counter() - t0) / n

    t_percept = timed_fixed(percept, x)
    t_fc = timed_fixed(fc, y0)
    t_update = timed_fixed(update, x)

    return {
        "size": size,
        "perception_ms": 1000 * t_percept,
        "fc_ms": 1000 * t_fc,
        "stochastic_update_ms": 1000 * t_update,
    }


def profile_rollout(
    log_dir: str,
    nca_cfg: Optional[NCAConfig] = None,
    size: int = 256,
    n_steps: int = 96,
):
    """Capture a jax.profiler trace of the rollout (SURVEY.md §5.1).

    Works on standard TPU/CPU runtimes; on the tunneled axon dev platform
    the device-trace collection hangs — use ``benchmark_stages`` there.
    """
    cfg = nca_cfg or NCAConfig(c_in=12, fc_dim=96)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = dynca_seed(cfg, 1, size)
    roll = partial(dynca_rollout, cfg=cfg, n_steps=n_steps, remat="none")
    state, _ = roll(params, x, jax.random.PRNGKey(1))  # compile first
    _fetch(state)
    with jax.profiler.trace(log_dir):
        state, _ = roll(params, x, jax.random.PRNGKey(1))
        _fetch(state)
    return log_dir


def benchmark_serving(
    nca_cfg: Optional[NCAConfig] = None,
    size: int = 256,
    n_streams: int = 8,
    step_n: int = 24,
    n_frames: int = 12,
) -> Dict[str, float]:
    """Multi-stream serving throughput: one VideoStylizer-style jitted frame
    program over a batch of independent streams (e.g. concurrent webcam
    sessions). Reports aggregate and per-stream fps."""
    from vsnca_tpu.infer.stylize import VideoStylizer

    cfg = nca_cfg or NCAConfig(c_in=12, fc_dim=96, padding_mode="circular",
                               conditioning="edges")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    styl = VideoStylizer(params, cfg, size, step_n=step_n)
    # batch the persistent state across streams
    if styl._fused:
        styl.state = jnp.repeat(styl.state, n_streams, axis=0)
    else:
        styl.state = jnp.repeat(styl.state, n_streams, axis=0)
    frame = jnp.zeros((n_streams, size, size, 3))
    out = styl.step_frame(frame)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n_frames):
        out = styl.step_frame(frame)
    _fetch(out)
    dt = (time.perf_counter() - t0) / n_frames
    return {
        "size": size,
        "n_streams": n_streams,
        "aggregate_fps": n_streams / dt,
        "per_stream_fps": 1.0 / dt,
        "ms_per_batched_frame": 1000 * dt,
    }


def benchmark_train_step(
    preset: str = "static_texture",
    iters: int = 5,
    step_n: Optional[int] = None,
    img_size: Optional[int] = None,
    rollout_path: Optional[str] = None,
    precompute_targets: bool = False,
    reference_shape: bool = True,
    loss_overrides: Optional[dict] = None,
) -> Dict[str, float]:
    """Benchmark one full training iteration (rollout + loss + backward +
    update) for a preset config. Presets with a video-motion term get a
    synthetic target window and tapped rollout frames; with
    ``reference_shape`` (default) the tap schedule matches the reference
    exactly (step_n total steps, frames after steps 1, 65, ... —
    fit_video_motion.py:229-235); ``reference_shape=False`` keeps the r2
    bench shape (3 equal 64-step chunks = 192 steps/iter).
    ``rollout_path`` overrides TrainConfig.rollout_path (auto|xla|fused).
    ``precompute_targets`` hoists the constant target-side VGG/MSOE features
    out of the iteration (the production-path optimization the CLI and
    VideoMotionProtocol use). ``loss_overrides``: dataclasses.replace
    overrides on the preset's LossConfig (e.g. {'video_motion_weight': 0})
    — for marginal per-term cost measurement at the full-iteration level
    (isolated per-term micro-benches mis-measure on this platform: separate
    dispatches add the ~28 ms floor, and any non-scalar fetch rides the
    ~13 MB/s tunnel)."""
    import dataclasses

    from vsnca_tpu.data.preprocess import synthetic_style_image
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.models.msoe import load_msoe
    from vsnca_tpu.train.presets import PRESETS
    from vsnca_tpu.train.trainer import DyNCATrainer

    preset_kw = {} if img_size is None else {"img_size": img_size}
    nca_cfg, loss_cfg, train_cfg = PRESETS[preset](**preset_kw)
    if rollout_path is not None:
        train_cfg = dataclasses.replace(train_cfg, rollout_path=rollout_path)
    if loss_overrides:
        loss_cfg = dataclasses.replace(loss_cfg, **loss_overrides)
    vgg, _ = load_vgg16()
    msoe = None
    if loss_cfg.vector_field_motion_weight or loss_cfg.video_motion_weight:
        msoe, _ = load_msoe()
    trainer = DyNCATrainer(nca_cfg, loss_cfg, train_cfg, vgg_params=vgg,
                           msoe_params=msoe)
    style = jnp.asarray(
        synthetic_style_image(train_cfg.img_size, train_cfg.batch_size) * 2 - 1
    )
    inputs = {"target_style": style}
    # Conditioned presets (edge_conditioned / extra_channels) consume
    # content frames: auxiliary images + their grayscale (experiments.py
    # :193-211) — synthesize a fixed batch.
    if (nca_cfg.conditioning == "edges"
            or nca_cfg.n_seed_channels < nca_cfg.c_in
            or loss_cfg.auxiliary_weight):
        aux = jnp.asarray(
            synthetic_style_image(
                train_cfg.img_size, train_cfg.batch_size, seed=7
            ) * 2 - 1
        )
        inputs["aux_imgs"] = aux
        inputs["aux_gs"] = jnp.mean(aux, axis=-1, keepdims=True)
    if step_n is None:
        step_n = train_cfg.step_buckets[len(train_cfg.step_buckets) // 2]

    kwargs = {"step_n": step_n}
    if loss_cfg.video_motion_weight:
        if reference_shape:
            # Reference-faithful workload (fit_video_motion.py:229-235):
            # step_n TOTAL steps, frames tapped after steps 1, 65, ... (2-3
            # frames for the default [80,144) range) plus a frameless tail.
            from vsnca_tpu.models.dynca import tap_schedule

            chunks, tail = tap_schedule(step_n, 64)
            n_motion_frames = len(chunks)
            kwargs.update(tap_chunks=chunks, tail_steps=tail)
        else:
            # r2 bench shape (n_frames equal chunks = 192 steps at
            # step_n=128) — kept for cross-round comparability.
            n_motion_frames = 3
            kwargs.update(
                n_motion_frames=n_motion_frames, tap_every=max(step_n // 2, 1)
            )
        inputs["target_motion_frames"] = jnp.stack(
            [style + 0.01 * k for k in range(n_motion_frames)]
        )

    if precompute_targets:
        from vsnca_tpu.losses.appearance import (
            precompute_target_style_features,
        )

        if loss_cfg.appearance_weight:
            inputs["target_style_features"] = precompute_target_style_features(
                vgg, style, loss_cfg.appearance_loss_type, train_cfg.img_size
            )
        if loss_cfg.video_motion_weight:
            from vsnca_tpu.losses.video_motion import (
                precompute_target_motion_features,
            )

            window = jnp.stack(
                [style[0] + 0.01 * k for k in range(n_motion_frames)]
            )
            inputs["target_motion_features"] = (
                precompute_target_motion_features(
                    msoe, window, loss_cfg.motion_img_size
                )
            )
            del inputs["target_motion_frames"]

    # warmup/compile both jit variants (seed-inject on iteration 0, plain after)
    trainer.train_iteration(inputs, **kwargs)
    trainer.train_iteration(inputs, **kwargs)
    # min of 2 rounds: one-sided host/tunnel noise (docs/ROUND3.md)
    dt = None
    for _ in range(2):
        t0 = time.perf_counter()
        for k in range(iters):
            trainer.train_iteration(inputs, sync=(k == iters - 1), **kwargs)
        r = (time.perf_counter() - t0) / iters
        dt = r if dt is None else min(dt, r)
    return {
        "preset": preset,
        "sec_per_train_iter": dt,
        "train_iters_per_sec": 1.0 / dt,
        "step_n": step_n,
    }
