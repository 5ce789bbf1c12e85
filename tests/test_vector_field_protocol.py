"""Vector-field protocol: periodic weight recalibration (median/50 rule,
fit_vector_field_motion.py:264-266) + 1x/2x control-video and flow/vec-field
artifact dumps (:285-298), at tiny sizes."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from vsnca_tpu.config import LossConfig, NCAConfig, TrainConfig
from vsnca_tpu.models.msoe import msoe_random_init
from vsnca_tpu.models.vgg import vgg16_random_init
from vsnca_tpu.train.vector_field_protocol import (
    VectorFieldProtocol,
    synthesize_texture_video,
)


def _setup(tmp_path, max_iterations, recalibrate_every, save_every):
    nca = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb",
                    padding_mode="circular")
    loss = LossConfig(
        overflow_weight=1.0,
        appearance_weight=1.0,
        appearance_loss_type="Gram",
        vector_field_motion_weight=4.0,
        motion_strength_weight=0.5,
        motion_direction_weight=0.5,
        motion_vector_field_name="circular",
        motion_img_size=(32, 32),
        nca_base_num_steps=4,
    )
    train = TrainConfig(
        img_size=(32, 32), batch_size=2, pool_size=8,
        step_range=(4, 9), step_buckets=(4, 8), inject_seed_every=2,
        max_iterations=max_iterations,
    )
    style = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    )
    return VectorFieldProtocol(
        nca, loss, train, style,
        recalibrate_every=recalibrate_every, save_every=save_every,
        out_dir=str(tmp_path), video_frames=2,
    )


def test_protocol_recalibrates_weight_per_median_rule(tmp_path):
    """>= 2 recalibrations; each new weight must equal
    median(appearance_log so far) / 50 (loss.py:80-84) and be applied to
    the live loss config."""
    proto = _setup(tmp_path, max_iterations=7, recalibrate_every=3,
                   save_every=0)
    app_at_recal = {}
    seen = []

    def cb(phase, i, log):
        seen.append(i)

    trainer = proto.run(
        vgg16_random_init(jax.random.PRNGKey(0)),
        msoe_random_init(jax.random.PRNGKey(1)),
        log_every=1, callback=cb,
    )
    assert trainer.iteration == 7
    # recalibrations at i=3 and i=6 (i % 3 == 0 and i > 0)
    assert [it for it, _ in proto.recalibrations] == [3, 6]
    # the rule: weight = median(raw appearance losses seen so far) / 50;
    # the log at iteration i includes entries 0..i (appended before the
    # recalibration check)
    logs = np.asarray(proto._appearance_log)
    for it, w in proto.recalibrations:
        expect = float(np.median(logs[: it + 1]) / 50.0)
        np.testing.assert_allclose(w, expect, rtol=1e-6)
    # two recalibrations with evolving logs → the weight actually changed
    w1, w2 = proto.recalibrations[0][1], proto.recalibrations[1][1]
    assert w1 != 4.0  # moved off the preset default
    assert proto.loss_cfg.vector_field_motion_weight == w2


def test_protocol_dumps_artifacts(tmp_path):
    proto = _setup(tmp_path, max_iterations=4, recalibrate_every=0,
                   save_every=4)
    proto.run(
        vgg16_random_init(jax.random.PRNGKey(0)),
        msoe_random_init(jax.random.PRNGKey(1)),
    )
    # 1x and 2x control videos (fit_vector_field_motion.py:285-287)
    assert os.path.exists(os.path.join(str(tmp_path), "video_last.mp4"))
    assert os.path.exists(os.path.join(str(tmp_path), "video_large_last.mp4"))
    # flow + vector-field images (:289-298); dumped at i=3
    assert os.path.exists(os.path.join(str(tmp_path), "flow_gen3.jpg"))
    assert os.path.exists(os.path.join(str(tmp_path), "vec_field_gen3.png"))
    assert os.path.exists(os.path.join(str(tmp_path), "vec_field_target.png"))


def test_synthesize_texture_video_size_factor(tmp_path):
    nca = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb",
                    padding_mode="circular")
    from vsnca_tpu.models.dynca import dynca_init

    params = dynca_init(jax.random.PRNGKey(0), nca)
    frames = synthesize_texture_video(
        params, nca, (16, 16), str(tmp_path / "v.mp4"), n_frames=2,
        step_n=2, size_factor=2.0,
    )
    assert frames[0].shape == (32, 32, 3)
    assert os.path.exists(str(tmp_path / "v.mp4"))
