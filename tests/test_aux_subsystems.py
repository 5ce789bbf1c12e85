"""Auxiliary subsystems: logging, experiment helpers, export validation,
interactive grower, results browser, style-consistency loss."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from vsnca_tpu.config import ConditionedNCAConfig, LossConfig, NCAConfig
from vsnca_tpu.export.webgl import save_webgl_model
from vsnca_tpu.export.webgl_sim import params_from_webgl, validate_export
from vsnca_tpu.infer.grower import InteractiveGrower
from vsnca_tpu.losses.orchestrator import LossState, make_loss_fn
from vsnca_tpu.losses.style_consistency import style_consistency_loss
from vsnca_tpu.models.conditioned_nca import conditioned_nca_init
from vsnca_tpu.models.dynca import dynca_init
from vsnca_tpu.utils.experiment import (
    find_image_by_name,
    get_next_experiment_index,
    save_setup_images,
    scan_folder_for_images,
)
from vsnca_tpu.utils.logging import MetricsLogger


def test_metrics_logger_jsonl_and_images(tmp_path):
    log = MetricsLogger(str(tmp_path), use_tensorboard=False)
    log.log_scalars(0, {"loss": 1.0})
    log.log_scalars(1, {"loss": 0.5, "lr": 1e-3})
    log.log_images(1, {"gen": np.random.rand(8, 8, 3).astype(np.float32)})
    log.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 0.5
    assert os.path.exists(tmp_path / "images" / "gen_1.png")


def test_experiment_helpers(tmp_path):
    base = str(tmp_path / "exps")
    assert get_next_experiment_index(base) == 0
    os.makedirs(os.path.join(base, "experiment_0"))
    os.makedirs(os.path.join(base, "experiment_7"))
    assert get_next_experiment_index(base) == 8

    from PIL import Image

    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    Image.new("RGB", (4, 4)).save(os.path.join(img_dir, "styleA.png"))
    Image.new("RGB", (4, 4)).save(os.path.join(img_dir, "other.jpg"))
    assert find_image_by_name(img_dir, "styleA").endswith("styleA.png")
    assert find_image_by_name(img_dir, "nope") is None
    assert len(scan_folder_for_images(img_dir)) == 2

    save_setup_images(
        str(tmp_path / "setup"),
        style=np.random.rand(1, 4, 4, 3).astype(np.float32),
        gray=np.random.rand(4, 4, 1).astype(np.float32) * 2 - 1,
    )
    assert os.path.exists(tmp_path / "setup" / "style.png")
    assert os.path.exists(tmp_path / "setup" / "gray.png")


def test_export_validation_roundtrip(tmp_path):
    cfg = NCAConfig(c_in=8, fc_dim=16, conditioning="pos_emb")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "model.json")
    save_webgl_model(path, [params], ["m"], pos_emb=True)

    re_params = params_from_webgl(path, cfg)
    for k in ("w1", "b1", "w2", "b2"):
        np.testing.assert_allclose(
            np.asarray(re_params[k]), np.asarray(params[k]), atol=1e-5
        )

    metrics = validate_export(path, params, cfg, size=16, n_steps=4)
    # uint8 texture precision: small but nonzero drift
    assert metrics["weight_max_abs_diff"] < 0.01
    assert metrics["rgb_mean_abs_diff"] < 0.5


def test_interactive_grower_goal_switch_and_damage():
    cfg = ConditionedNCAConfig(image_size=16, num_hidden_channels=4,
                               update_hidden_dim=16)
    params = conditioned_nca_init(jax.random.PRNGKey(0), cfg)
    goal = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32))
    g = InteractiveGrower(params, cfg, goal)
    rgb = g.step(4)
    assert rgb.shape == (16, 16, 3) and rgb.min() >= 0 and rgb.max() <= 1
    g.set_goal(jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32)))
    g.step(1)
    pre = np.asarray(g.state).copy()
    g.damage(8, 8, radius=4)
    post = np.asarray(g.state)
    assert np.abs(post[0, 8, 8]).sum() == 0.0
    assert not np.allclose(pre, post)
    g.reset()
    assert float(jnp.abs(g.state[0, :, :, :3]).sum()) == 0.0


def test_results_browser(tmp_path):
    from vsnca_tpu.apps.results_browser import build_index

    exp = tmp_path / "experiment_0"
    os.makedirs(exp)
    with open(exp / "args.json", "w") as f:
        json.dump({"preset": "static_texture"}, f)
    from PIL import Image

    Image.new("RGB", (4, 4)).save(exp / "step_0.png")
    idx = build_index(str(tmp_path))
    content = open(idx).read()
    assert "experiment_0" in content and "step_0.png" in content


def test_style_consistency_zero_gradient():
    cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    target = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))

    def f(p):
        return style_consistency_loss(p, cfg, target, jax.random.PRNGKey(1),
                                      min_steps=4)

    val = f(params)
    grads = jax.grad(f)(params)
    assert np.isfinite(float(val)) and float(val) > 0
    # faithfully zero-grad (reference computes it under no_grad)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert total == 0.0


def test_orchestrator_style_consistency_wired():
    cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    loss_cfg = LossConfig(overflow_weight=1.0, style_consistency_weight=1.0)
    state = LossState(cfg=loss_cfg, nca_cfg=cfg)
    loss_fn = make_loss_fn(state)
    rng = np.random.RandomState(0)
    d = {
        "nca_state": jnp.asarray(rng.randn(1, 8, 8, 6).astype(np.float32)),
        "target_image_list": [jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))],
        "nca_params": params,
    }
    total, logs = loss_fn(d, jax.random.PRNGKey(0))
    assert "style_consistency" in logs and np.isfinite(float(total))
