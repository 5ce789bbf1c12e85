"""Golden tests for the frozen feature extractors vs torch mirrors built
inline from the same weights."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vsnca_tpu.models.vgg import (
    VGG16_CONVS,
    STYLE_LAYERS,
    CONTENT_LAYER,
    vgg16_random_init,
    vgg16_features,
    vgg16_content_features,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from vsnca_tpu.models.msoe import (
    msoe_random_init,
    msoe_forward,
    contrast_norm,
    _msoenet,
    _pyramid_blur,
)
from vsnca_tpu.ops.grid_sample import tf_consistent_bilinear_upsample
from vsnca_tpu.ops.filters import matlab_gaussian_kernel_2d


def build_torch_vgg(params):
    """torchvision-vgg16.features-shaped Sequential from our HWIO params."""
    layers = []
    c_in = 3
    for i, (c_out, pool_after) in enumerate(VGG16_CONVS):
        conv = torch.nn.Conv2d(c_in, c_out, 3, padding=1)
        w = np.asarray(params[i]["w"]).transpose(3, 2, 0, 1)  # HWIO→OIHW
        conv.weight.data = torch.from_numpy(w.copy())
        conv.bias.data = torch.from_numpy(np.asarray(params[i]["b"]).copy())
        layers += [conv, torch.nn.ReLU(inplace=False)]
        if pool_after:
            layers.append(torch.nn.MaxPool2d(2, 2))
        c_in = c_out
    return torch.nn.Sequential(*layers)


@pytest.fixture(scope="module")
def vgg_pair():
    params = vgg16_random_init(jax.random.PRNGKey(0))
    return params, build_torch_vgg(params)


def torch_middle_features(vgg, imgs_nchw, layers):
    mean = torch.tensor(IMAGENET_MEAN)[:, None, None]
    std = torch.tensor(IMAGENET_STD)[:, None, None]
    x = (imgs_nchw - mean) / std
    feats = []
    for i, layer in enumerate(vgg[: max(layers) + 1]):
        x = layer(x)
        if i in layers:
            feats.append(x)
    return feats


def test_vgg_style_taps_match_torch(vgg_pair):
    params, tvgg = vgg_pair
    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    ours = vgg16_features(params, jnp.asarray(img), STYLE_LAYERS)
    theirs = torch_middle_features(
        tvgg, torch.from_numpy(img).permute(0, 3, 1, 2), STYLE_LAYERS
    )
    assert len(ours) == len(theirs) == 5
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(
            np.asarray(o),
            t.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-3,
            atol=1e-4,
        )


def test_vgg_content_tap_is_pre_relu(vgg_pair):
    params, tvgg = vgg_pair
    rng = np.random.RandomState(1)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    ours = vgg16_content_features(params, jnp.asarray(img))
    theirs = torch_middle_features(
        tvgg, torch.from_numpy(img).permute(0, 3, 1, 2), (CONTENT_LAYER,)
    )[0]
    # pre-ReLU conv output must contain negative values
    assert float(ours.min()) < 0.0
    np.testing.assert_allclose(
        np.asarray(ours),
        theirs.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-3,
        atol=1e-4,
    )


def test_vgg_include_image_as_feat(vgg_pair):
    params, _ = vgg_pair
    rng = np.random.RandomState(2)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    feats = vgg16_features(params, jnp.asarray(img), STYLE_LAYERS, True)
    assert len(feats) == 6
    # First feature is the normalized image itself.
    expected = (img - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(np.asarray(feats[0]), expected, rtol=1e-5)


# ----------------------------------------------------------------- MSOE


def sym_pad_torch(x_nchw, p):
    return F.pad(x_nchw, (p, p, p, p), mode="replicate") if False else None


def np_sym_pad(x_nhwc, p):
    return np.pad(x_nhwc, ((0, 0), (p, p), (p, p), (0, 0)), mode="symmetric")


def test_contrast_norm_matches_torch_var():
    rng = np.random.RandomState(3)
    x = rng.rand(2, 8, 8, 2).astype(np.float32)
    ours = np.asarray(contrast_norm(jnp.asarray(x)))
    t = torch.from_numpy(x)
    mean = t.mean(dim=(1, 2, 3), keepdim=True)
    std = torch.sqrt(t.var(dim=(1, 2, 3), keepdim=True) + 1e-12)
    theirs = ((t - mean) / std).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_msoenet_conv1_equals_torch_conv3d():
    """Our 2-tap decomposition must equal Conv3d(1, 32, (11, 11, 2))."""
    params = msoe_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    pair = rng.rand(1, 20, 20, 2).astype(np.float32)

    ours = np.asarray(_msoenet(params, jnp.asarray(pair)))

    # torch mirror
    w = np.asarray(params["conv1_w"])  # [11,11,2,32]
    conv3d_w = torch.from_numpy(w.transpose(3, 0, 1, 2)[:, None])  # [32,1,11,11,2]
    b1 = torch.from_numpy(np.asarray(params["conv1_b"]))
    padded = np_sym_pad(pair, 5)
    x3d = torch.from_numpy(padded[:, None, :, :, :])  # [B,1,H,W,2]
    y = F.conv3d(x3d, conv3d_w, b1)  # [B,32,H,W,1]
    y = torch.square(y).squeeze(-1)
    y = F.max_pool2d(y, 5, stride=1, padding=2)
    w2 = torch.from_numpy(np.asarray(params["conv2_w"])[0, 0].T.copy())[:, :, None, None]
    b2 = torch.from_numpy(np.asarray(params["conv2_b"]))
    y = F.conv2d(y, w2, b2)
    norm = y.abs().sum(dim=1, keepdim=True)
    y = y / torch.maximum(norm, torch.tensor(1e-12))
    theirs = y.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)


def test_pyramid_blur_matches_torch():
    rng = np.random.RandomState(5)
    pair = rng.rand(1, 16, 16, 2).astype(np.float32)
    ours = np.asarray(_pyramid_blur(jnp.asarray(pair)))

    k = matlab_gaussian_kernel_2d((5, 5), 2.0)
    kt = torch.from_numpy(k).reshape(1, 1, 5, 5)
    padded = np_sym_pad(pair, 2)
    outs = []
    for f in range(2):
        xf = torch.from_numpy(padded[:, None, :, :, f])
        outs.append(F.conv2d(xf, kt, stride=2))
    theirs = torch.stack([o[:, 0] for o in outs], dim=-1).numpy()  # [B,H,W,2]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_tf_consistent_upsample_matches_torch_grid_sample():
    rng = np.random.RandomState(6)
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    for scale in [2.0, 4.0]:
        ours = np.asarray(tf_consistent_bilinear_upsample(jnp.asarray(x), scale))
        # torch mirror of the reference grid construction
        h = 8
        N = int(h * scale)
        delta = 1.0 / h
        p = int(scale) - 1
        xs = torch.linspace(-1.0 + delta, 1.0 - delta, N - p)
        grid_i, grid_j = torch.meshgrid(xs, xs, indexing="ij")
        gridx, gridy = grid_i, grid_j
        gridx = F.pad(gridx.unsqueeze(0), (0, p, 0, p), mode="replicate")[0]
        gridy = F.pad(gridy.unsqueeze(0), (0, p, 0, p), mode="replicate")[0]
        grid = torch.stack([gridy, gridx], dim=-1).unsqueeze(0).repeat(2, 1, 1, 1)
        theirs = F.grid_sample(
            torch.from_numpy(x).permute(0, 3, 1, 2), grid,
            mode="bilinear", padding_mode="zeros", align_corners=False,
        )
        np.testing.assert_allclose(
            ours, theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
        )


def test_msoe_forward_shapes_and_flow_negation():
    params = msoe_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    pair = jnp.asarray(rng.rand(2, 64, 64, 2).astype(np.float32))
    flow, feats = msoe_forward(params, pair, return_features=True)
    assert flow.shape == (2, 64, 64, 2)
    assert feats[0].shape == (2, 64, 64, 320)
    assert bool(jnp.isfinite(flow).all())
    # channel-1 negation: recompute decoder by hand with positive sign
    from vsnca_tpu.ops.padding import symmetric_pad_2d
    from vsnca_tpu.ops.conv import conv2d

    d = symmetric_pad_2d(feats[0], (1, 1, 1, 1))
    d = conv2d(d, params["decode1_w"], params["decode1_b"], padding="VALID")
    d = jax.nn.relu(d)
    raw = conv2d(d, params["decode2_w"], params["decode2_b"])
    np.testing.assert_allclose(np.asarray(flow[..., 1]), -np.asarray(raw[..., 1]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(flow[..., 0]), np.asarray(raw[..., 0]), rtol=1e-5)


# ------------------------------------------- MSOE end-to-end torch mirror


def torch_msoe_net(params, pair_nhwc):
    """Reference MSOEnet (MSOEmultiscale.py:86-112) on numpy [B,H,W,2] →
    torch [B,64,H,W]."""
    padded = np_sym_pad(pair_nhwc, 5)
    w = np.asarray(params["conv1_w"])  # [11,11,2,32]
    conv3d_w = torch.from_numpy(w.transpose(3, 0, 1, 2)[:, None])
    x3d = torch.from_numpy(padded[:, None])  # [B,1,H,W,2]
    y = F.conv3d(x3d, conv3d_w, torch.from_numpy(np.asarray(params["conv1_b"])))
    y = torch.square(y).squeeze(-1)
    y = F.max_pool2d(y, 5, stride=1, padding=2)
    w2 = torch.from_numpy(np.asarray(params["conv2_w"])[0, 0].T.copy())[:, :, None, None]
    y = F.conv2d(y, w2, torch.from_numpy(np.asarray(params["conv2_b"])))
    norm = y.abs().sum(dim=1, keepdim=True)
    return y / torch.maximum(norm, torch.tensor(1e-12))


def torch_pyramid_blur(pair_nhwc):
    k = matlab_gaussian_kernel_2d((5, 5), 2.0)
    kt = torch.from_numpy(k).reshape(1, 1, 5, 5)
    padded = np_sym_pad(pair_nhwc, 2)
    outs = [
        F.conv2d(torch.from_numpy(padded[:, None, :, :, f]), kt, stride=2)
        for f in range(2)
    ]
    return torch.stack([o[:, 0] for o in outs], dim=-1).numpy()


def torch_tf_upsample(x_nchw, scale):
    """Reference grid construction (MSOEmultiscale.py:26-44)."""
    b, c, h, w = x_nchw.shape
    N = int(h * scale)
    delta = 1.0 / h
    p = int(scale) - 1
    xs = torch.linspace(-1.0 + delta, 1.0 - delta, N - p)
    grid_i, grid_j = torch.meshgrid(xs, xs, indexing="ij")
    gridx = F.pad(grid_i.unsqueeze(0), (0, p, 0, p), mode="replicate")[0]
    gridy = F.pad(grid_j.unsqueeze(0), (0, p, 0, p), mode="replicate")[0]
    grid = torch.stack([gridy, gridx], dim=-1).unsqueeze(0).repeat(b, 1, 1, 1)
    return F.grid_sample(
        x_nchw, grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )


def torch_msoe_forward(params, pair_nhwc):
    """Full reference forward (MSOEmultiscale.py:139-175): contrast norm →
    5-level pyramid → shared MSOEnet → upsample → concat → decode → negate
    flow-y. Returns (flow [B,H,W,2], features [B,H,W,320]) as numpy."""
    t = torch.from_numpy(pair_nhwc)
    mean = t.mean(dim=(1, 2, 3), keepdim=True)
    std = torch.sqrt(t.var(dim=(1, 2, 3), keepdim=True) + 1e-12)
    x0 = ((t - mean) / std).numpy()
    levels = [x0]
    for _ in range(4):
        levels.append(torch_pyramid_blur(levels[-1]))
    hs = [torch_msoe_net(params, lv) for lv in levels]
    zs = [hs[0]] + [torch_tf_upsample(hs[i], float(2**i)) for i in range(1, 5)]
    z = torch.cat(zs, dim=1)  # [B,320,H,W]
    zp = torch.from_numpy(
        np_sym_pad(z.numpy().transpose(0, 2, 3, 1), 1).transpose(0, 3, 1, 2).copy()
    )
    d1w = torch.from_numpy(np.asarray(params["decode1_w"]).transpose(3, 2, 0, 1).copy())
    d = F.conv2d(zp, d1w, torch.from_numpy(np.asarray(params["decode1_b"])))
    d = F.relu(d)
    d2w = torch.from_numpy(np.asarray(params["decode2_w"]).transpose(3, 2, 0, 1).copy())
    flow = F.conv2d(d, d2w, torch.from_numpy(np.asarray(params["decode2_b"])))
    flow = flow * torch.tensor([1.0, -1.0])[None, :, None, None]
    return (
        flow.numpy().transpose(0, 2, 3, 1),
        z.numpy().transpose(0, 2, 3, 1),
    )


def test_msoe_forward_end_to_end_matches_torch():
    """Composed golden: the whole pyramid→MSOEnet×5→upsample→decode chain,
    not just the pieces (VERDICT r1 item 5)."""
    params = msoe_random_init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(8)
    pair = rng.rand(2, 64, 64, 2).astype(np.float32)

    flow, feats = msoe_forward(params, jnp.asarray(pair), return_features=True)
    tflow, tfeat = torch_msoe_forward(params, pair)

    np.testing.assert_allclose(np.asarray(feats[0]), tfeat, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(flow), tflow, rtol=1e-3, atol=1e-5)


def test_rgb_to_grayscale_matches_torchvision_coeffs():
    from vsnca_tpu.models.msoe import rgb_to_grayscale

    rng = np.random.RandomState(9)
    img = rng.rand(1, 4, 4, 3).astype(np.float32)
    ours = np.asarray(rgb_to_grayscale(jnp.asarray(img)))
    # torchvision TF.rgb_to_grayscale: 0.2989 R + 0.587 G + 0.114 B
    theirs = (
        0.2989 * img[..., 0:1] + 0.587 * img[..., 1:2] + 0.114 * img[..., 2:3]
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)
