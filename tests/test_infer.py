"""Inference/stylization and data-pipeline tests."""

import numpy as np

import jax
import jax.numpy as jnp

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.data.preprocess import (
    get_start_frame_idx,
    rgb_to_grayscale_mean,
    select_appearance_frame,
    synthetic_style_image,
    synthetic_video,
)
from vsnca_tpu.infer.stylize import VideoStylizer, stylize_frames
from vsnca_tpu.models.dynca import dynca_init


def test_stylizer_persistent_state_extra_channel():
    cfg = NCAConfig(c_in=6, seed_channels=5, fc_dim=16)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    styl = VideoStylizer(params, cfg, 16, step_n=4)
    frames = synthetic_video((16, 16), 3)
    prev_state = np.asarray(styl.state)
    outs = []
    for f in frames:
        out = styl.step_frame(jnp.asarray(f)[None])
        outs.append(np.asarray(out))
        # state persists and keeps the seed channel count
        assert styl.state.shape == (1, 16, 16, 5)
    assert not np.allclose(np.asarray(styl.state), prev_state)
    for o in outs:
        assert o.min() >= 0.0 and o.max() <= 1.0


def test_stylizer_edge_conditioned():
    cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="edges")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    styl = VideoStylizer(params, cfg, 16, step_n=4)
    out = styl.step_frame(jnp.asarray(synthetic_video((16, 16), 1)[0])[None])
    assert out.shape == (1, 16, 16, 3)


def test_stylize_frames_generator_with_size_factor():
    cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    frames = synthetic_video((8, 8), 2)
    outs = list(stylize_frames(params, cfg, frames, step_n=2, size_factor=2.0))
    assert len(outs) == 2 and outs[0].shape == (16, 16, 3)


def test_synthetic_data_ranges():
    s = synthetic_style_image((16, 16), 2)
    assert s.shape == (2, 16, 16, 3) and 0 <= s.min() and s.max() <= 1
    v = synthetic_video((16, 16), 4)
    assert v.shape == (4, 16, 16, 3) and -1 <= v.min() and v.max() <= 1
    g = rgb_to_grayscale_mean(v)
    assert g.shape == (4, 16, 16, 1)
    np.testing.assert_allclose(g[0, 0, 0, 0], v[0, 0, 0].mean(), rtol=1e-6)


def test_appearance_frame_selection():
    assert select_appearance_frame([0.1, 0.5, 0.2]) == 1


def test_start_frame_window_sampler_bounds():
    rng = np.random.RandomState(0)
    seen = set()
    for _ in range(300):
        idx = get_start_frame_idx(rng, video_len=20, window=4)
        assert 0 <= idx <= 16  # window fits in the video
        seen.add(idx)
    assert len(seen) > 8  # anchors are drawn uniformly, not a local walk


def test_checkpoint_roundtrip(tmp_path):
    from vsnca_tpu.export.checkpoint import load_checkpoint, save_checkpoint

    state = {
        "params": {"w": jnp.ones((2, 2)), "b": jnp.zeros((2,))},
        "iteration": 7,
    }
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, state, metadata={"note": "test"})
    loaded = load_checkpoint(p)
    np.testing.assert_allclose(loaded["params"]["w"], np.ones((2, 2)))
    assert loaded["iteration"] == 7


def test_select_frame_by_vgg_median():
    from vsnca_tpu.data.preprocess import select_frame_by_vgg_median
    from vsnca_tpu.models.vgg import vgg16_random_init

    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    # 3 near-identical frames + 1 outlier: the median frame must not be the outlier
    base = synthetic_video((32, 32), 1)[0]
    seq = np.stack([base, base * 0.98, base * 1.02, -base])
    idx = select_frame_by_vgg_median(vgg, jnp.asarray(seq))
    assert idx in (0, 1, 2)


def test_distill_style_loss_runs():
    from vsnca_tpu.losses.experimental import distill_style_loss
    from vsnca_tpu.models.vgg import vgg16_random_init

    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    t = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    l = distill_style_loss(vgg, g, t, jax.random.PRNGKey(1))
    assert np.isfinite(float(l))
