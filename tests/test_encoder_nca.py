"""ConditionedNCA model + encoder trainer tests, with torch parity for the
model's deterministic pieces."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vsnca_tpu.config import ConditionedNCAConfig
from vsnca_tpu.data.dataset import ConditioningDataset
from vsnca_tpu.models.conditioned_nca import (
    _depthwise_perceive,
    alive_mask,
    conditioned_nca_grow,
    conditioned_nca_init,
    conditioned_nca_seed,
    encode_goal,
)
from vsnca_tpu.models.encoder import image_encoder_apply, image_encoder_init
from vsnca_tpu.models.vgg import vgg16_random_init
from vsnca_tpu.train.encoder_trainer import (
    ConditionedNCATrainer,
    create_2d_circular_mask,
    make_encoder_loss_fn,
)


def test_depthwise_perceive_matches_torch_grouped_conv():
    rng = np.random.RandomState(0)
    c = 5
    x = rng.randn(2, 8, 8, c).astype(np.float32)
    w = rng.randn(c, 3, 3, 3).astype(np.float32)  # [C, slot, kh, kw]
    ours = _depthwise_perceive(jnp.asarray(x), jnp.asarray(w))
    # torch grouped conv: weight [C*3, 1, 3, 3] with out channel c*3+s
    wt = torch.from_numpy(w.reshape(c * 3, 1, 3, 3))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.conv2d(xt, wt, padding=1, groups=c)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_image_encoder_matches_torch():
    rng = np.random.RandomState(1)
    params = image_encoder_init(jax.random.PRNGKey(0), embedding_dim=4, channels=3)
    x = rng.rand(2, 12, 12, 3).astype(np.float32)
    ours = image_encoder_apply(params, jnp.asarray(x))

    from vsnca_tpu.ops.filters import SOBEL_X, SOBEL_Y, LAPLACIAN, gaussian_kernel_2d

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    gray = xt.mean(dim=1, keepdim=True)
    sx = F.conv2d(gray, torch.from_numpy(SOBEL_X).reshape(1, 1, 3, 3), padding=1)
    sy = F.conv2d(gray, torch.from_numpy(SOBEL_Y).reshape(1, 1, 3, 3), padding=1)
    lp = F.conv2d(gray, torch.from_numpy(LAPLACIAN).reshape(1, 1, 3, 3), padding=1)
    gk = torch.from_numpy(gaussian_kernel_2d(5, 1.0)).reshape(1, 1, 5, 5)
    blurred = torch.cat(
        [F.conv2d(xt[:, i : i + 1], gk, padding=2) for i in range(3)], dim=1
    )
    feats = torch.cat([sx, sy, lp, blurred], dim=1)
    w1 = torch.from_numpy(
        np.asarray(params["embed1"]["w"]).transpose(3, 2, 0, 1).copy()
    )
    b1 = torch.from_numpy(np.asarray(params["embed1"]["b"]).copy())
    w2 = torch.from_numpy(
        np.asarray(params["embed2"]["w"]).transpose(3, 2, 0, 1).copy()
    )
    h = F.relu(F.conv2d(feats, w1, b1, padding=1))
    theirs = F.conv2d(h, w2, padding=1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-5
    )


def test_seed_and_alive_semantics():
    cfg = ConditionedNCAConfig(image_size=16)
    seed = conditioned_nca_seed(cfg, 2)
    assert seed.shape == (2, 16, 16, 20)
    # alive + hidden channels = 1 at center, RGB stays 0
    assert float(seed[0, 8, 8, 3:].sum()) == 17.0
    assert float(seed[0, 8, 8, :3].sum()) == 0.0
    alive = alive_mask(seed, cfg)
    # 3x3 maxpool spreads aliveness to the center neighborhood
    assert int(alive.sum()) == 2 * 9
    dead = jnp.zeros_like(seed)
    assert int(alive_mask(dead, cfg).sum()) == 0


def test_goal_encoding_occupies_last_hidden_channels():
    cfg = ConditionedNCAConfig(image_size=8)
    params = conditioned_nca_init(jax.random.PRNGKey(0), cfg)
    goal = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))
    enc = encode_goal(params, cfg, goal)
    assert enc.shape == (1, 8, 8, 20)
    # first num_channels - num_hidden = 4 channels are zero padding
    np.testing.assert_allclose(np.asarray(enc[..., :4]), 0.0)
    assert float(jnp.abs(enc[..., 4:]).sum()) > 0


def test_grow_changes_state_and_respects_clamp():
    cfg = ConditionedNCAConfig(image_size=12)
    params = conditioned_nca_init(jax.random.PRNGKey(0), cfg)
    seeds = conditioned_nca_seed(cfg, 2, 12)
    goal = jnp.asarray(np.random.RandomState(1).rand(2, 12, 12, 3).astype(np.float32))
    out = conditioned_nca_grow(params, seeds, goal, jax.random.PRNGKey(2), cfg, 8)
    assert out.shape == seeds.shape
    assert float(jnp.abs(out).max()) <= cfg.clamp_value
    assert not np.allclose(np.asarray(out), np.asarray(seeds))


def test_circular_mask_radius():
    rng = np.random.RandomState(0)
    m = create_2d_circular_mask(16, 16, rng, radius=3)
    assert m.dtype == bool and 0 < m.sum() <= np.pi * 16  # ~r^2*pi cells


def _tiny_trainer(num_damaged=0, **kw):
    cfg = ConditionedNCAConfig(
        image_size=32, num_hidden_channels=4, update_hidden_dim=16
    )
    imgs = np.random.RandomState(0).rand(5, 32, 32, 3).astype(np.float32)
    dataset = ConditioningDataset(imgs)
    style = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    return ConditionedNCATrainer(
        cfg, dataset, style, vgg, nca_steps=(4, 8), step_buckets=(4, 8),
        pool_size=16, num_damaged=num_damaged, appearance_loss_type="Gram",
        **kw,
    )


def test_encoder_trainer_epoch_runs_and_updates_pool():
    tr = _tiny_trainer(device_pool=False)
    assert all(e is None for e in tr.pool.entries)
    loss, metrics = tr.train_iteration(batch_size=4, num_steps=4)
    assert np.isfinite(loss)
    assert {"overflow", "appearance", "content", "log10loss"} <= set(metrics)
    filled = sum(e is not None for e in tr.pool.entries)
    assert filled == 4  # batch written back


def test_encoder_trainer_device_pool_epoch_updates_pool_states():
    tr = _tiny_trainer()  # device_pool=True is the default
    seeds = np.asarray(tr.pool_states).copy()
    loss, metrics = tr.train_iteration(batch_size=4, num_steps=4)
    assert np.isfinite(loss)
    changed = [
        i for i in range(seeds.shape[0])
        if not np.array_equal(seeds[i], np.asarray(tr.pool_states[i]))
    ]
    assert len(changed) == 4  # exactly the sampled batch written back


def test_device_pool_matches_list_pool():
    """device_pool=True must reproduce the host ListPool trainer exactly:
    same RNG draws, same dead-entry reseeds, same losses/params/pool."""
    tr_host = _tiny_trainer(device_pool=False)
    tr_dev = _tiny_trainer()
    for _ in range(3):
        lh, _ = tr_host.train_iteration(batch_size=4, num_steps=4)
        ld, _ = tr_dev.train_iteration(batch_size=4, num_steps=4)
        np.testing.assert_allclose(lh, ld, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(tr_host.params),
        jax.tree_util.tree_leaves(tr_dev.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
    # pool contents: ListPool None entries read as fresh seeds
    seed1 = np.asarray(
        __import__(
            "vsnca_tpu.models.conditioned_nca", fromlist=["conditioned_nca_seed"]
        ).conditioned_nca_seed(tr_host.cfg, 1)
    )[0]
    for i, e in enumerate(tr_host.pool.entries):
        want = seed1 if e is None else np.asarray(e)
        np.testing.assert_allclose(
            np.asarray(tr_dev.pool_states[i]), want, rtol=1e-5, atol=1e-7
        )


def test_encoder_trainer_damage_path():
    tr = _tiny_trainer(num_damaged=2)
    loss, _ = tr.train_iteration(batch_size=4, num_steps=4)
    assert np.isfinite(loss)


def test_encoder_loss_fn_zero_for_matching_content():
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    style = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32))
    loss_fn = make_encoder_loss_fn(
        vgg, style, appearance_weight=0.0, content_weight=1.0, overflow_weight=0.0
    )
    img = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32))
    total, logs = loss_fn(img, img, img, jax.random.PRNGKey(0))
    assert float(total) < 1e-10  # content loss of identical images


def test_host_dead_check_matches_device_alive_mask():
    """The trainer's host-side numpy dead check must agree with
    sum(alive_mask)==0 for alive, dead, and threshold-straddling states."""
    from vsnca_tpu.models.conditioned_nca import alive_mask

    tr = _tiny_trainer()
    cfg = tr.cfg
    rng = np.random.RandomState(0)
    shape = (cfg.image_size, cfg.image_size, cfg.num_channels)
    cases = []
    for scale in (0.0, 0.05, 0.2, 1.0):
        e = rng.rand(*shape).astype(np.float32) * scale
        cases.append(e)
    # exact-threshold alpha (maxpool > thr is strict: exactly-at-threshold
    # counts as dead)
    e = np.zeros(shape, np.float32)
    e[..., cfg.alive_channel] = cfg.alpha_living_threshold
    cases.append(e)
    e2 = e.copy()
    e2[3, 3, cfg.alive_channel] = cfg.alpha_living_threshold + 1e-4
    cases.append(e2)
    for entry in cases:
        device_dead = (
            float(jnp.sum(alive_mask(jnp.asarray(entry)[None], cfg))) == 0.0
        )
        assert tr._is_dead(entry) == device_dead


def test_collapse_recovery_restores_best_and_reseeds_pool():
    """recovery_patience epochs above recovery_factor x best -> params
    restored from the best snapshot, pool reseeded, optimizer reset."""
    tr = _tiny_trainer(device_pool=False)
    tr.recovery_patience = 2
    tr.recovery_factor = 1.0  # any non-improving epoch counts as plateau
    tr.train_iteration(batch_size=4, num_steps=4)
    assert tr.best_iteration == 1 and tr._best_params is not None
    best = tr._best_params
    # Force an unbeatable best so subsequent epochs always plateau.
    tr.best_loss = 0.0
    tr.train_iteration(batch_size=4, num_steps=4)
    assert tr._plateau == 1 and not tr.recoveries
    loss, metrics = tr.train_iteration(batch_size=4, num_steps=4)
    assert metrics.get("recovered") == 1.0
    assert len(tr.recoveries) == 1
    assert all(e is None for e in tr.pool.entries)  # pool reseeded
    flat_now = jax.tree_util.tree_leaves(tr.params)
    flat_best = jax.tree_util.tree_leaves(best)
    for a, b in zip(flat_now, flat_best):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_collapse_recovery_device_pool_survives_donation():
    """Recovery in device-pool mode: the best-params snapshot must survive
    the fused pair program's buffer donation (copy, not reference), and
    training must continue after recover()."""
    tr = _tiny_trainer()
    tr.recovery_patience = 2
    tr.recovery_factor = 1.0
    tr.train_iteration(batch_size=4, num_steps=4)
    assert tr._best_params is not None
    tr.best_loss = 0.0  # unbeatable -> every epoch plateaus
    tr.train_iteration(batch_size=4, num_steps=4)
    _, metrics = tr.train_iteration(batch_size=4, num_steps=4)
    assert metrics.get("recovered") == 1.0
    # pool reseeded on device
    seed1 = np.asarray(conditioned_nca_seed(tr.cfg, 1))[0]
    np.testing.assert_array_equal(np.asarray(tr.pool_states[0]), seed1)
    # params usable after restore (donation did not kill the snapshot)
    loss, _ = tr.train_iteration(batch_size=4, num_steps=4)
    assert np.isfinite(loss)


def test_alive_frac_metric_logged():
    tr = _tiny_trainer()
    _, metrics = tr.train_iteration(batch_size=4, num_steps=4)
    assert 0.0 <= metrics["alive_frac"] <= 1.0
