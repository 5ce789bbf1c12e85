"""End-to-end check of the VideoStylizer kernel auto-selection on hardware:
drives the public stylizer at 256 (flat) and 512 (stream_flat) and compares
frames against the XLA path statistically.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import dynca_init
    from vsnca_tpu.infer.stylize import VideoStylizer

    cfg = NCAConfig(c_in=12, fc_dim=96, padding_mode="circular",
                    conditioning="edges")
    params = dynca_init(jax.random.PRNGKey(0), cfg)

    for size in (256, 512):
        frame = jax.random.uniform(jax.random.PRNGKey(1), (1, size, size, 3)) * 2 - 1
        styl = VideoStylizer(params, cfg, size, step_n=24)
        print(f"size={size}: kernel={styl._kernel}", flush=True)
        t0 = time.perf_counter()
        out = styl.step_frame(frame)
        out.block_until_ready()
        np.asarray(out)
        print(f"  compile+first frame: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            out = styl.step_frame(frame)
        np.asarray(out)
        fps = n / (time.perf_counter() - t0)
        styl_x = VideoStylizer(params, cfg, size, step_n=24, use_fused="never")
        for _ in range(3):
            ox = styl_x.step_frame(frame)
        np.asarray(ox)
        t0 = time.perf_counter()
        for _ in range(n):
            ox = styl_x.step_frame(frame)
        np.asarray(ox)
        fps_x = n / (time.perf_counter() - t0)
        # statistical agreement: same attractor stats after warm frames
        m, mx = float(jnp.mean(out)), float(jnp.mean(ox))
        s, sx = float(jnp.std(out)), float(jnp.std(ox))
        print(f"  fused {fps:.0f} fps vs xla {fps_x:.0f} fps; "
              f"mean {m:.3f}/{mx:.3f} std {s:.3f}/{sx:.3f}", flush=True)
        assert np.isfinite(np.asarray(out)).all()


if __name__ == "__main__":
    main()
