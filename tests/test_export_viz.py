"""WebGL export round-trip, flow viz, display utils, video writer tests."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.export.webgl import (
    export_models_to_webgl_json,
    params_to_layer_mats,
    save_webgl_model,
    tile2d,
)
from vsnca_tpu.models.dynca import dynca_init
from vsnca_tpu.utils.display import plot_losses, save_image_grid, to_uint8
from vsnca_tpu.utils.flow_viz import flow_to_image, plot_vec_field
from vsnca_tpu.utils.video_writer import VideoWriter, save_stylized_video


def test_tile2d_atlas_shape():
    a = np.arange(3 * 2 * 4).reshape(3, 2, 4).astype(np.float32)
    out = tile2d(a, w=2)
    assert out.shape == (2 * 2, 4 * 2)
    # first tile is a[0]
    np.testing.assert_allclose(out[:2, :4], a[0])


def test_layer_mats_shapes_and_bias_rows():
    cfg = NCAConfig(c_in=12, fc_dim=96, conditioning="edges")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    l1, l2 = params_to_layer_mats(params)
    assert l1.shape == (1, 48 + 3 + 1, 96)
    assert l2.shape == (1, 97, 12)
    np.testing.assert_allclose(l1[0, -1], np.asarray(params["b1"]))
    np.testing.assert_allclose(l2[0, -1], np.asarray(params["b2"]))


def test_webgl_export_json_fields_and_dequant(tmp_path):
    cfg = NCAConfig(c_in=8, fc_dim=16, conditioning="pos_emb")
    p1 = dynca_init(jax.random.PRNGKey(0), cfg)
    p2 = dynca_init(jax.random.PRNGKey(1), cfg)
    js = export_models_to_webgl_json([p1, p2], ["a", "b"], pos_emb=True)
    assert js["model_names"] == ["a", "b"]
    assert len(js["layers"]) == 2
    lay = js["layers"][0]
    assert lay["pos_emb"] is True and js["layers"][1]["pos_emb"] is False
    assert lay["bias"] is True
    # dequantized atlas values must reproduce the raw weights:
    data = np.asarray(lay["data_flatten"], np.float32).reshape(lay["data_shape"])
    denorm = data * lay["scale"] - lay["center"] * lay["scale"]
    rows, cols = lay["shape"]
    # model 0 occupies the first tile (layout column 0, row 0)
    tile = denorm[:rows].reshape(rows, -1)[:, :cols]
    expect = params_to_layer_mats(p1)[0][0]
    np.testing.assert_allclose(tile, expect, atol=1e-5 * max(1.0, lay["scale"]))

    # file writer + metadata registration
    model_path = str(tmp_path / "style.json")
    md_path = str(tmp_path / "metadata.json")
    save_webgl_model(model_path, [p1], ["a"], metadata_json_path=md_path,
                     texture_name="style")
    with open(md_path) as f:
        md = json.load(f)
    assert md["texture_names"] == ["style"]
    with open(model_path) as f:
        loaded = json.load(f)
    assert loaded["model_names"] == ["a"]


def test_flow_to_image_properties():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 1.0
    img = flow_to_image(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # uniform flow → uniform color
    assert (img == img[0, 0]).all()
    # opposite directions → different colors
    img2 = flow_to_image(-flow)
    assert not (img2[0, 0] == img[0, 0]).all()


def test_plot_vec_field_and_losses():
    vec = np.zeros((2, 16, 16), np.float32)
    vec[0] = 1.0
    img = plot_vec_field(vec, name="test")
    assert img.ndim == 3 and img.shape[2] == 3
    curve = plot_losses([10.0, 5.0, 1.0])
    assert curve.ndim == 3


def test_image_grid_and_uint8(tmp_path):
    imgs = np.random.RandomState(0).rand(3, 8, 8, 3).astype(np.float32)
    path = str(tmp_path / "grid.png")
    grid = save_image_grid(imgs, path)
    assert grid.shape == (8, 24, 3) and os.path.exists(path)
    assert to_uint8(np.asarray([2.0])).max() == 255


def test_video_writer_mp4_and_gif(tmp_path):
    for name in ["v.mp4", "v.gif"]:
        path = str(tmp_path / name)
        with VideoWriter(path, fps=10) as w:
            for i in range(4):
                w.add(np.full((16, 16, 3), i / 4.0, np.float32))
        assert os.path.exists(path) and os.path.getsize(path) > 0


def test_save_stylized_video_end_to_end(tmp_path):
    from vsnca_tpu.data.preprocess import synthetic_video

    cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    frames = synthetic_video((16, 16), 3)
    out = save_stylized_video(
        str(tmp_path / "styl.mp4"), params, cfg, frames, step_n=2
    )
    assert os.path.getsize(out) > 0
