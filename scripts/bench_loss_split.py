"""Scalar-output timing of the video-motion LOSS side on TPU (r3b).

All timed functions reduce to scalars (full-array fetches ride a
~13 MB/s tunnel and poison timings — docs/ROUND3.md). Splits the 48.6 ms
loss fwd into VGG / MSOE / metric parts and probes conv efficiency.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    return float(np.asarray(jax.device_get(x)))


def timeit(fn, iters=8, warmup=2):
    for _ in range(warmup):
        fetch(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import os

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    fetch(jax.jit(lambda x: jnp.sum(x))(jnp.ones(8)))

    from vsnca_tpu.models.msoe import load_msoe, msoe_forward
    from vsnca_tpu.models.vgg import load_vgg16, vgg16_style_features
    from vsnca_tpu.losses.appearance import appearance_loss, ot_style_loss
    from vsnca_tpu.losses.video_motion import video_motion_loss

    vgg, _ = load_vgg16()
    msoe, _ = load_msoe()
    key = jax.random.PRNGKey(0)

    img9 = jax.random.uniform(jax.random.PRNGKey(1), (9, 256, 256, 3))
    img6 = img9[:6]
    pair3 = jax.random.uniform(jax.random.PRNGKey(2), (3, 256, 256, 2))

    # --- single conv probe: 3x3 128->128 @128^2 b9 (vgg conv2_2 shape) ---
    from vsnca_tpu.ops.conv import conv2d

    xc = jax.random.uniform(jax.random.PRNGKey(3), (9, 128, 128, 128))
    wc = jax.random.uniform(jax.random.PRNGKey(4), (3, 3, 128, 128)) * 0.01
    flops = 9 * 128 * 128 * 128 * 128 * 9 * 2

    for name, fn in (
        ("conv f32 NHWC", jax.jit(lambda x: jnp.sum(conv2d(x, wc)))),
        ("conv f32 NHWC highest", jax.jit(
            lambda x: jnp.sum(jax.lax.conv_general_dilated(
                x, wc, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST)))),
        ("conv bf16-in NHWC", jax.jit(
            lambda x: jnp.sum(conv2d(x.astype(jnp.bfloat16),
                                     wc.astype(jnp.bfloat16))))),
        ("conv f32 NCHW", jax.jit(
            lambda x: jnp.sum(jax.lax.conv_general_dilated(
                jnp.transpose(x, (0, 3, 1, 2)),
                jnp.transpose(wc, (3, 2, 0, 1)), (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))))),
    ):
        t = timeit(lambda fn=fn: fn(xc))
        print(f"{name}: {1000*t:.2f} ms = {flops/t/1e12:.1f} TFLOP/s",
              flush=True)

    # --- VGG fwd (scalar) ---
    vf = jax.jit(lambda im: sum(jnp.sum(f) for f in
                                vgg16_style_features(vgg, im)))
    t = timeit(lambda: vf(img9))
    print(f"VGG style fwd b9@256 (scalar): {1000*t:.2f} ms", flush=True)
    t = timeit(lambda: vf(img6))
    print(f"VGG style fwd b6@256 (scalar): {1000*t:.2f} ms", flush=True)

    # --- MSOE fwd (scalar) ---
    mf = jax.jit(lambda pr: jnp.sum(
        msoe_forward(msoe, pr, return_features=True)[1][0]))
    t = timeit(lambda: mf(pair3))
    print(f"MSOE feat fwd b3@256 (scalar): {1000*t:.2f} ms", flush=True)

    # --- appearance OT fwd / fwd+bwd-scalar (6 imgs = 2 frames x b3) ---
    style3 = jax.random.uniform(jax.random.PRNGKey(5), (3, 256, 256, 3)) * 2 - 1
    gen6 = img6 * 2 - 1
    ap = jax.jit(lambda g, k: appearance_loss(vgg, g, style3, "OT", k, 1000, 32))
    t = timeit(lambda: ap(gen6, key))
    print(f"appearance OT fwd 6img (scalar): {1000*t:.2f} ms", flush=True)

    apg = jax.jit(lambda g, k: jnp.sum(jax.grad(
        lambda g: appearance_loss(vgg, g, style3, "OT", k, 1000, 32))(g)[0]))
    t = timeit(lambda: apg(gen6, key))
    print(f"appearance OT fwd+bwd 6img (scalar-grad): {1000*t:.2f} ms",
          flush=True)

    # --- video motion fwd+bwd, 1 pair b3, precomputed target ---
    from vsnca_tpu.losses.video_motion import precompute_target_motion_features

    tgt_video = jnp.stack([style3[0], style3[0] * 0.9])
    mfeats = precompute_target_motion_features(msoe, tgt_video, (256, 256))
    frames2 = [gen6[:3], gen6[3:]]
    vm = jax.jit(lambda fr, mfe, k: video_motion_loss(
        msoe, fr, None, "MotionOT", k, (256, 256), 1000, 32,
        target_features=[mfe[0]])[0])
    t = timeit(lambda: vm(frames2, mfeats, key))
    print(f"video motion OT fwd 1pair (scalar): {1000*t:.2f} ms", flush=True)

    vmg = jax.jit(lambda fr, mfe, k: sum(jnp.sum(g) for g in jax.grad(
        lambda fr: video_motion_loss(
            msoe, fr, None, "MotionOT", k, (256, 256), 1000, 32,
            target_features=[mfe[0]])[0])(fr)))
    t = timeit(lambda: vmg(frames2, mfeats, key))
    print(f"video motion OT fwd+bwd 1pair (scalar-grad): {1000*t:.2f} ms",
          flush=True)

    # --- OT metric alone on fake features ---
    feats = [jax.random.uniform(jax.random.PRNGKey(7), (6, 256 >> i, 256 >> i, c))
             for i, c in enumerate((64, 128, 256, 512, 512))]
    ot = jax.jit(lambda fs, k: ot_style_loss(fs, [f * 0.9 for f in fs], k, 1000))
    t = timeit(lambda: ot(feats, key))
    print(f"OT metric alone 6img 5layers (scalar): {1000*t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
