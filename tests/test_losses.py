"""Loss-math golden tests vs torch implementations built inline."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vsnca_tpu.config import LossConfig
from vsnca_tpu.losses.overflow import overflow_loss
from vsnca_tpu.losses.appearance import (
    gram_matrix,
    gram_loss,
    _remd,
    _moment_loss,
    _pairwise_cos_dist,
    sliced_wasserstein_loss,
    appearance_loss,
)
from vsnca_tpu.losses.vector_field import (
    get_motion_vector_field_by_name,
    vector_field_motion_loss,
    _cos_sim,
)
from vsnca_tpu.losses.video_motion import video_motion_loss
from vsnca_tpu.losses.orchestrator import LossState, make_loss_fn, set_loss_weight
from vsnca_tpu.models.vgg import vgg16_random_init
from vsnca_tpu.models.msoe import msoe_random_init


def test_overflow_loss():
    x = jnp.asarray([[-2.0, 0.5], [1.5, -0.25]])
    # |−2−(−1)| + 0 + |1.5−1| + 0 over 4 elements
    np.testing.assert_allclose(float(overflow_loss(x)), (1.0 + 0.5) / 4.0, rtol=1e-6)


def test_gram_matches_torch():
    rng = np.random.RandomState(0)
    f = rng.randn(2, 6, 7, 4).astype(np.float32)
    ours = np.asarray(gram_matrix(jnp.asarray(f)))
    t = torch.from_numpy(f).permute(0, 3, 1, 2)
    b, c, h, w = t.shape
    feats = t.reshape(b, c, h * w)
    theirs = (feats @ feats.transpose(1, 2) / (h * w)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_remd_and_moment_match_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(50, 8).astype(np.float32)
    y = rng.randn(60, 8).astype(np.float32)

    ours_d = np.asarray(_pairwise_cos_dist(jnp.asarray(x), jnp.asarray(y)))
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    x_norm = torch.sqrt((xt**2).sum(1).view(-1, 1))
    y_norm = torch.sqrt((yt**2).sum(1).view(1, -1))
    theirs_d = 1.0 - torch.mm(xt, yt.t()) / (x_norm + 1e-10) / (y_norm + 1e-10)
    np.testing.assert_allclose(ours_d, theirs_d.numpy(), rtol=1e-4, atol=1e-5)

    ours_remd = float(_remd(jnp.asarray(x), jnp.asarray(y)))
    m1 = theirs_d.min(1)[0].mean()
    m2 = theirs_d.min(0)[0].mean()
    np.testing.assert_allclose(ours_remd, float(torch.max(m1, m2)), rtol=1e-4)

    y2 = rng.randn(50, 8).astype(np.float32)
    ours_m = float(_moment_loss(jnp.asarray(x), jnp.asarray(y2)))
    yt2 = torch.from_numpy(y2)
    mu_x, mu_y = xt.mean(0, keepdim=True), yt2.mean(0, keepdim=True)
    xc, yc = xt - mu_x, yt2 - mu_y
    cov_x = xc.t() @ xc / (x.shape[0] - 1)
    cov_y = yc.t() @ yc / (y2.shape[0] - 1)
    theirs_m = (mu_x - mu_y).abs().mean() + (cov_x - cov_y).abs().mean()
    np.testing.assert_allclose(ours_m, float(theirs_m), rtol=1e-4)


def test_slw_matches_torch_with_same_projections():
    """Feed identical features and check the sorted-projection math by
    reproducing it in torch with the same projection matrix."""
    rng = np.random.RandomState(2)
    g = rng.randn(2, 8, 8, 5).astype(np.float32)
    t = rng.randn(2, 8, 8, 5).astype(np.float32)
    key = jax.random.PRNGKey(0)
    ours = float(sliced_wasserstein_loss([jnp.asarray(g)], [jnp.asarray(t)], key, 16))

    # torch mirror with the same projections as the jax call generates
    sub = jax.random.split(key)[1]
    projs = jax.random.normal(sub, (5, 16))
    projs = projs / jnp.linalg.norm(projs, axis=0, keepdims=True)
    pt = torch.from_numpy(np.asarray(projs))

    def proj_sort(x):
        xt = torch.from_numpy(x).permute(0, 3, 1, 2).reshape(2, 5, 64)
        return torch.einsum("bcn,cp->bpn", xt, pt).sort()[0]

    sp, tp = proj_sort(g), proj_sort(t)
    theirs = float((sp - tp).square().sum())
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)


def test_appearance_loss_gram_end_to_end():
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    gen = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    tgt = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)  # resized down
    l = appearance_loss(vgg, gen, tgt, "Gram", jax.random.PRNGKey(1))
    assert np.isfinite(float(l)) and float(l) >= 0
    # identical images → zero gram loss
    l0 = appearance_loss(vgg, gen, gen, "Gram", jax.random.PRNGKey(1))
    assert float(l0) < 1e-8


def test_appearance_loss_ot_gradient():
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    tgt = jnp.asarray(rng.rand(1, 48, 48, 3).astype(np.float32) * 2 - 1)

    def f(img):
        return appearance_loss(vgg, img, tgt, "OT", jax.random.PRNGKey(5))

    gen = jnp.asarray(rng.rand(1, 48, 48, 3).astype(np.float32) * 2 - 1)
    g = jax.grad(f)(gen)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


# ------------------------------------------------------ vector fields


def reference_field_loops(name, img_size):
    """Brute-force double-loop construction following the published field
    definitions, used as the oracle for the vectorized library."""
    h, w = img_size
    cx, cy = h // 2, w // 2
    pi = 3.1416
    vec = np.zeros((h, w, 2))
    for i in range(-cx, cx):
        for j in range(-cy, cy):
            r = (i * i + j * j) ** 0.5
            if name == "circle":
                if r == 0:
                    continue
                vec[cx + i, cy + j, 0] = i / r
                vec[cx + i, cy + j, 1] = -j / r
            elif name == "converge":
                if r == 0:
                    continue
                vec[cx + i, cy + j, 0] = -j / r
                vec[cx + i, cy + j, 1] = -i / r
            elif name == "diverge":
                if r == 0:
                    continue
                vec[cx + i, cy + j, 0] = j / r
                vec[cx + i, cy + j, 1] = i / r
            elif name == "2block_x":
                rad = 0.0 if i >= 0 else 180.0
                vec[cx + i, cy + j, 0] = np.cos(rad / 180 * pi)
                vec[cx + i, cy + j, 1] = np.sin(rad / 180 * pi)
            elif name == "4block":
                if i >= 0 and j >= 0:
                    rad = 0.0
                elif i < 0 and j < 0:
                    rad = 180.0
                elif i >= 0 and j < 0:
                    rad = 90.0
                else:
                    rad = 270.0
                vec[cx + i, cy + j, 0] = np.cos(rad / 180 * pi)
                vec[cx + i, cy + j, 1] = np.sin(rad / 180 * pi)
    return vec


@pytest.mark.parametrize("name", ["circle", "converge", "diverge", "2block_x", "4block"])
def test_vector_field_library_matches_loops(name):
    got = np.asarray(get_motion_vector_field_by_name(name, (16, 16)))[0]
    want = reference_field_loops(name, (16, 16))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_vector_field_simple_direction_and_grad():
    f = np.asarray(get_motion_vector_field_by_name("90", (8, 8)))[0]
    np.testing.assert_allclose(f[..., 0], np.cos(3.1416 / 2), atol=1e-6)
    np.testing.assert_allclose(f[..., 1], np.sin(3.1416 / 2), atol=1e-6)

    g = np.asarray(get_motion_vector_field_by_name("grad_0_90", (16, 16)))[0]
    # normalized to unit mean strength
    np.testing.assert_allclose(
        np.sqrt(g[..., 0] ** 2 + g[..., 1] ** 2).mean(), 1.0, rtol=1e-5
    )


def test_cos_sim_matches_torch():
    rng = np.random.RandomState(5)
    a = rng.randn(2, 4, 4, 2).astype(np.float32)
    b = rng.randn(2, 4, 4, 2).astype(np.float32)
    ours = np.asarray(_cos_sim(jnp.asarray(a), jnp.asarray(b)))
    theirs = F.cosine_similarity(
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2),
        dim=1,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_vector_field_motion_loss_runs_and_differentiates():
    msoe = msoe_random_init(jax.random.PRNGKey(0))
    field = get_motion_vector_field_by_name("circular", (32, 32))
    rng = np.random.RandomState(6)
    before = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)

    def f(after):
        l, logs, flow = vector_field_motion_loss(
            msoe, before, after, field, jnp.asarray(64.0), 24, (32, 32)
        )
        return l

    after = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    l = f(after)
    g = jax.grad(f)(after)
    assert np.isfinite(float(l))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_video_motion_loss_runs():
    msoe = msoe_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    gen = [jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) for _ in range(3)]
    tgt = [jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32)) for _ in range(3)]
    for lt in ["MotionOT", "MotionSlW", "MotionGram"]:
        l, flows = video_motion_loss(
            msoe, gen, tgt, lt, jax.random.PRNGKey(1), (32, 32)
        )
        assert np.isfinite(float(l)), lt


def test_orchestrator_combines_terms():
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    cfg = LossConfig(overflow_weight=100.0, appearance_weight=1.0,
                     appearance_loss_type="Gram")
    state = LossState(cfg=cfg, vgg_params=vgg)
    loss_fn = make_loss_fn(state)
    rng = np.random.RandomState(8)
    d = {
        "nca_state": jnp.asarray(rng.randn(2, 16, 16, 12).astype(np.float32)),
        "generated_image_list": [jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))],
        "target_image_list": [jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))],
    }
    total, logs = jax.jit(loss_fn)(d, jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert set(logs) == {"overflow", "appearance"}
    np.testing.assert_allclose(
        float(total), float(logs["overflow"] + logs["appearance"]), rtol=1e-5
    )


def test_set_loss_weight_protocols():
    cfg = LossConfig(video_motion_weight=1.0, vector_field_motion_weight=1.0)
    c2 = set_loss_weight(cfg, "video_motion", medium_mt=1.0, img_size=256)
    assert abs(c2.video_motion_weight - (1.0 * 6.04 - 2.17)) < 1e-6
    c3 = set_loss_weight(cfg, "video_motion", medium_mt=10.0, img_size=256)
    assert c3.video_motion_weight == 10.0  # clamped
    c4 = set_loss_weight(cfg, "video_motion", medium_mt=1.0, img_size=256,
                         img_name="ants", nca_config_key="16-128")
    assert c4.video_motion_weight == 0.2  # manual table override
    c5 = set_loss_weight(cfg, "vector_field_motion",
                         appearance_loss_log=[100.0, 200.0, 300.0])
    assert abs(c5.vector_field_motion_weight - 4.0) < 1e-6


# -------------------- video-motion value parity vs torch mirror (r2 item 5)


def _torch_motion_features(msoe_params, img1, img2):
    """Reference get_motion_feature_two_frames (video_motion_loss.py:63-81)
    on RGB [-1,1] numpy NHWC frames already at motion_img_size: [0,1] →
    torchvision grayscale coeffs → stacked pair → full torch MSOE mirror."""
    from tests.test_features import torch_msoe_forward

    def gray(img):
        x = (img + 1.0) / 2.0
        return 0.2989 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]

    pair = np.concatenate([gray(img1), gray(img2)], axis=-1).astype(np.float32)
    _, feat = torch_msoe_forward(msoe_params, pair)
    return torch.from_numpy(feat.transpose(0, 3, 1, 2))  # [B,320,H,W]


def _torch_motion_gram(f):
    b, c, h, w = f.shape
    x = f.reshape(b, c, h * w)
    return x.bmm(x.transpose(1, 2)) / (c * h * w)


def test_video_motion_gram_value_parity():
    """MotionGramLoss (video_motion_loss.py:239-261) value parity on real
    MSOE features, summed over consecutive pairs."""
    msoe = msoe_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(11)
    gen = [rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1 for _ in range(3)]
    tgt = [rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1 for _ in range(3)]

    ours, _ = video_motion_loss(
        msoe, [jnp.asarray(g) for g in gen], [jnp.asarray(t) for t in tgt],
        "MotionGram", jax.random.PRNGKey(1), (32, 32),
    )

    theirs = 0.0
    for i in range(2):
        fg = _torch_motion_features(msoe, gen[i], gen[i + 1])
        ft = _torch_motion_features(msoe, tgt[i], tgt[i + 1])
        theirs += float(
            (_torch_motion_gram(ft) - _torch_motion_gram(fg)).square().mean()
        )
    np.testing.assert_allclose(float(ours), theirs, rtol=1e-3, atol=1e-7)


def test_video_motion_ot_value_parity():
    """MotionOptimalTransportLoss (video_motion_loss.py:161-237) value
    parity at 32px (no subsample: the reference randomizes only when h>32),
    batch-averaged, remd+moment per pair."""
    msoe = msoe_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(12)
    gen = [rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1 for _ in range(2)]
    tgt = [rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1 for _ in range(2)]

    ours, _ = video_motion_loss(
        msoe, [jnp.asarray(g) for g in gen], [jnp.asarray(t) for t in tgt],
        "MotionOT", jax.random.PRNGKey(1), (32, 32),
    )

    fg = _torch_motion_features(msoe, gen[0], gen[1])
    ft = _torch_motion_features(msoe, tgt[0], tgt[1])

    def remd(X, Y):  # X,Y: N×d
        xn = torch.sqrt((X**2).sum(1).view(-1, 1))
        yn = torch.sqrt((Y**2).sum(1).view(1, -1))
        d = 1.0 - X.mm(Y.t()) / (xn + 1e-10) / (yn + 1e-10)
        return torch.max(d.min(1)[0].mean(), d.min(0)[0].mean())

    def moment(X, Y):  # N×d each
        mu_x, mu_y = X.mean(0, keepdim=True), Y.mean(0, keepdim=True)
        mu_d = (mu_x - mu_y).abs().mean()
        Xc, Yc = X - mu_x, Y - mu_y
        xcov = Xc.t().mm(Xc) / (X.shape[0] - 1)
        ycov = Yc.t().mm(Yc) / (Y.shape[0] - 1)
        return mu_d + (xcov - ycov).abs().mean()

    theirs = 0.0
    b = fg.shape[0]
    for bi in range(b):
        X = ft[bi].reshape(320, -1).t()  # target first (style_loss_cos(x, y))
        Y = fg[bi].reshape(320, -1).t()
        theirs += float(remd(X, Y) + moment(X, Y))
    theirs /= b
    np.testing.assert_allclose(float(ours), theirs, rtol=1e-3, atol=1e-6)


def test_appearance_precomputed_target_features_identical():
    """precompute_target_style_features + target_features must reproduce the
    recomputed path bit-for-bit (same key -> same OT subsample indices)."""
    from vsnca_tpu.losses.appearance import precompute_target_style_features

    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    gen = jax.random.uniform(jax.random.PRNGKey(1), (2, 48, 48, 3)) * 2 - 1
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (2, 48, 48, 3)) * 2 - 1
    key = jax.random.PRNGKey(3)
    for lt in ("Gram", "OT", "SlW"):
        ref = appearance_loss(vgg, gen, tgt, lt, key)
        feats = precompute_target_style_features(vgg, tgt, lt, (48, 48))
        got = appearance_loss(vgg, gen, tgt, lt, key, target_features=feats)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_video_motion_precomputed_target_features_identical():
    from vsnca_tpu.losses.video_motion import (
        precompute_target_motion_features,
    )

    msoe = msoe_random_init(jax.random.PRNGKey(0))
    gen = [
        jax.random.uniform(jax.random.PRNGKey(i), (2, 48, 48, 3)) * 2 - 1
        for i in range(3)
    ]
    video = jax.random.uniform(jax.random.PRNGKey(9), (5, 48, 48, 3)) * 2 - 1
    start = 1
    tgt = [video[start + i][None].repeat(2, axis=0) for i in range(3)]
    key = jax.random.PRNGKey(4)
    feats = precompute_target_motion_features(msoe, video, (48, 48))
    assert feats.shape[0] == 4
    for lt in ("MotionGram", "MotionOT"):
        ref, _ = video_motion_loss(msoe, gen, tgt, lt, key, (48, 48))
        got, _ = video_motion_loss(
            msoe, gen, None, lt, key, (48, 48),
            target_features=feats[start : start + 2],
        )
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_video_motion_grad_lowers_without_select_and_scatter():
    """Regression guard for the r4 pool lowering: the video-motion loss
    backward must NOT contain select_and_scatter (XLA's reduce_window-max
    VJP — measured at 25.5 ms/iter of the production training iteration,
    scripts/profile_vm_r4d.py); the equality-mask custom VJP in
    ops/conv.py::_max_pool_2d_eq replaces it."""
    from vsnca_tpu.losses.video_motion import (
        precompute_target_motion_features,
    )

    msoe = msoe_random_init(jax.random.PRNGKey(0))
    gen = [
        jax.random.uniform(jax.random.PRNGKey(i), (1, 32, 32, 3)) * 2 - 1
        for i in range(2)
    ]
    video = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 3)) * 2 - 1
    feats = precompute_target_motion_features(msoe, video, (32, 32))

    def loss_fn(fr):
        l, _ = video_motion_loss(
            msoe, fr, None, "MotionGram", motion_img_size=(32, 32),
            target_features=feats,
        )
        return l

    txt = jax.jit(jax.grad(loss_fn)).lower(gen).as_text()
    assert "select_and_scatter" not in txt
    assert "select-and-scatter" not in txt

    # Same for the appearance term (VGG's five 2x2/2 pools take the
    # non-overlapping repeat+equality VJP).
    vgg = vgg16_random_init(jax.random.PRNGKey(16))
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 2 - 1
    txt = jax.jit(
        jax.grad(lambda v: appearance_loss(vgg, v, img, "Gram"))
    ).lower(img).as_text()
    assert "select_and_scatter" not in txt


def test_train_step_precomputed_targets_identical():
    """The full jitted train step produces identical params/loss with and
    without precomputed target features (same key -> same rollout/masks)."""
    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.losses.appearance import precompute_target_style_features
    from vsnca_tpu.losses.video_motion import (
        precompute_target_motion_features,
    )
    from vsnca_tpu.models.dynca import dynca_init, dynca_seed
    from vsnca_tpu.models.msoe import msoe_random_init
    from vsnca_tpu.train.optim import make_optimizer
    from vsnca_tpu.train.trainer import make_train_step

    nca_cfg = NCAConfig(c_in=6, fc_dim=16, conditioning="pos_emb")
    loss_cfg = LossConfig(
        overflow_weight=1.0, appearance_weight=1.0,
        appearance_loss_type="Gram", video_motion_weight=5.0,
        video_motion_loss_type="MotionGram", motion_img_size=(48, 48),
    )
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    msoe = msoe_random_init(jax.random.PRNGKey(1))
    loss_state = LossState(cfg=loss_cfg, vgg_params=vgg, msoe_params=msoe)
    optimizer = make_optimizer(1e-3)
    step = make_train_step(nca_cfg, loss_state, optimizer)

    params = dynca_init(jax.random.PRNGKey(2), nca_cfg)
    opt_state = optimizer.init(params)
    states = dynca_seed(nca_cfg, 2, 48)
    style = jax.random.uniform(jax.random.PRNGKey(3), (2, 48, 48, 3)) * 2 - 1
    video = jax.random.uniform(jax.random.PRNGKey(4), (3, 48, 48, 3)) * 2 - 1
    frames = jnp.stack([jnp.broadcast_to(video[k], (2, 48, 48, 3))
                        for k in range(3)])
    key = jax.random.PRNGKey(5)

    base = {"target_style": style, "target_motion_frames": frames}
    pre = {
        "target_style": style,
        "target_style_features": precompute_target_style_features(
            vgg, style, "Gram", (48, 48)
        ),
        "target_motion_features": precompute_target_motion_features(
            msoe, video, (48, 48)
        ),
    }
    p1, _, s1, l1, _ = step(params, opt_state, states, key, base,
                            step_n=4, n_motion_frames=3, tap_every=2)
    p2, _, s2, l2, _ = step(params, opt_state, states, key, pre,
                            step_n=4, n_motion_frames=3, tap_every=2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_orchestrator_frame_batched_appearance_matches_loop():
    """The orchestrator stacks a shared-target tapped-frame list into one
    VGG call (losses/orchestrator.py); the result must equal the per-frame
    loop sum/len for every metric (the loop reuses one key per frame, the
    stacked call draws once — key-identical)."""
    vgg = vgg16_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(21)
    frames = [
        jnp.asarray(rng.rand(2, 48, 48, 3).astype(np.float32) * 2 - 1)
        for _ in range(3)
    ]
    style = jnp.asarray(rng.rand(2, 48, 48, 3).astype(np.float32) * 2 - 1)
    key = jax.random.PRNGKey(5)
    for lt in ("Gram", "OT", "SlW"):
        cfg = LossConfig(appearance_weight=1.0, appearance_loss_type=lt)
        loss_fn = make_loss_fn(LossState(cfg=cfg, vgg_params=vgg))
        d = {
            "nca_state": jnp.zeros((2, 8, 8, 12)),
            "generated_image_list": frames,
            "target_image_list": [style] * 3,
        }
        batched, _ = loss_fn(d, key)
        # manual per-frame loop with the orchestrator's key schedule
        _, sub = jax.random.split(key)
        loop = sum(
            appearance_loss(vgg, g, style, lt, sub) for g in frames
        ) / 3.0
        np.testing.assert_allclose(float(batched), float(loop), rtol=2e-5), lt


def test_video_motion_pair_batched_matches_per_pair_calls():
    """video_motion_loss stacks all generated/target pairs through one MSOE
    forward; per-pair features must match individual motion_feature calls
    and the metric must match the naive per-pair loop."""
    from vsnca_tpu.losses.video_motion import motion_feature

    msoe = msoe_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(22)
    gen = [
        jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
        for _ in range(4)
    ]
    tgt = [
        jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
        for _ in range(4)
    ]
    key = jax.random.PRNGKey(6)
    got, (flow_g, flow_t) = video_motion_loss(
        msoe, gen, tgt, "MotionGram", key, (32, 32)
    )
    ref = 0.0
    for i in range(3):
        fg, fl_g = motion_feature(msoe, gen[i], gen[i + 1], (32, 32))
        ft, fl_t = motion_feature(msoe, tgt[i], tgt[i + 1], (32, 32))
        x = fg.reshape(2, -1, 320)
        gg = jnp.einsum("bnc,bnd->bcd", x, x) / (320 * 32 * 32)
        y = ft.reshape(2, -1, 320)
        gt = jnp.einsum("bnc,bnd->bcd", y, y) / (320 * 32 * 32)
        ref = ref + jnp.mean((gt - gg) ** 2)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)
    # last-pair flow summaries survive the batched restructure
    np.testing.assert_allclose(
        np.asarray(flow_g), np.asarray(fl_g), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(flow_t), np.asarray(fl_t), rtol=1e-4, atol=1e-6
    )
