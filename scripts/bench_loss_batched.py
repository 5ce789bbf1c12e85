"""Loss-side timing for the video_motion preset after pair/frame batching.

Same harness as scripts/profile_video_motion.py (loss sections only), so
numbers compare directly with the recorded pre-batching profile:
  loss fwd 22.21 ms / fwd+bwd 79.02 ms
  appearance OT x3 fwd 10.16 / fwd+bwd 28.65
  video motion OT fwd 15.70 / fwd+bwd 53.51
Dev tool, not part of the library.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    fetch(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    print(f"warmup jit: {time.perf_counter()-t0:.1f}s", flush=True)

    from vsnca_tpu.losses.orchestrator import LossState, make_loss_fn
    from vsnca_tpu.models.msoe import load_msoe
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.presets import PRESETS

    nca_cfg, loss_cfg, train_cfg = PRESETS["video_motion"]()
    b = train_cfg.batch_size
    size = train_cfg.img_size[0]
    step_n, n_frames = 128, 3

    key = jax.random.PRNGKey(0)
    vgg, _ = load_vgg16()
    msoe, _ = load_msoe()
    img = jax.random.uniform(jax.random.PRNGKey(1), (b, size, size, 3)) - 0.5
    frames = [img * (0.8 + 0.1 * i) for i in range(n_frames)]
    tgt = [img * (0.7 + 0.1 * i) for i in range(n_frames)]
    style = img
    x = jnp.zeros((b, size, size, nca_cfg.c_in))

    loss_state = LossState(cfg=loss_cfg, vgg_params=vgg, msoe_params=msoe)
    loss_fn = make_loss_fn(loss_state)

    def build_inputs(fr):
        return {
            "nca_state": x,
            "generated_image_list": fr,
            "generated_image_list_motion": fr,
            "target_motion_image_list": tgt,
            "target_image_list": [style] * n_frames,
            "step_n": jnp.asarray(float(step_n)),
        }

    lf = jax.jit(lambda fr, k: loss_fn(build_inputs(fr), k)[0])
    t = timeit(lf, frames, key)
    print(f"loss fwd: {1000*t:.2f} ms", flush=True)

    lg = jax.jit(lambda fr, k: jax.grad(
        lambda fr: loss_fn(build_inputs(fr), k)[0]
    )(fr))
    t = timeit(lg, frames, key)
    print(f"loss fwd+bwd(frames): {1000*t:.2f} ms", flush=True)

    from vsnca_tpu.losses.appearance import appearance_loss
    from vsnca_tpu.losses.video_motion import video_motion_loss

    def ap_batched(fr, k):
        gen = jnp.concatenate(fr, axis=0)
        return appearance_loss(vgg, gen, style, "OT", k, 1000, 32)

    t = timeit(jax.jit(ap_batched), frames, key)
    print(f"appearance OT x{n_frames} batched fwd: {1000*t:.2f} ms", flush=True)

    apg = jax.jit(lambda fr, k: jax.grad(
        lambda fr: ap_batched(fr, k))(fr))
    t = timeit(apg, frames, key)
    print(f"appearance OT x{n_frames} batched fwd+bwd: {1000*t:.2f} ms",
          flush=True)

    vm = jax.jit(lambda fr, k: video_motion_loss(
        msoe, fr, tgt, "MotionOT", k, (size, size), 1000, 32
    )[0])
    t = timeit(vm, frames, key)
    print(f"video motion OT batched fwd: {1000*t:.2f} ms", flush=True)

    vmg = jax.jit(lambda fr, k: jax.grad(
        lambda fr: video_motion_loss(
            msoe, fr, tgt, "MotionOT", k, (size, size), 1000, 32
        )[0]
    )(fr))
    t = timeit(vmg, frames, key)
    print(f"video motion OT batched fwd+bwd: {1000*t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
