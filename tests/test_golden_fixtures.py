"""Golden-fixture tests pinning the converter→extractor chain.

The fixtures (tests/fixtures/golden_*.npz, built by
scripts/make_golden_fixtures.py) hold torch-pipeline activations computed
from converter-produced checkpoints plus SHA-256 digests of the converter
output. Two independent pins:

1. torch-free: our JAX extractors, with the seed-regenerated weights, must
   reproduce the stored torch activations — extractor math is pinned even
   on machines without torch.
2. with torch: re-running the REAL converter scripts reproduces the stored
   digests byte-exactly — the .pth→npz layout (OIHW→HWIO transposes, key
   scheme, dtype) is pinned, so when real pretrained checkpoints appear
   the conversion path is already validated (reference weight sources:
   ExtraChannels/models/__init__.py:26-46, appearance_loss.py:211-236).
"""

import hashlib
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsnca_tpu.models.msoe import msoe_forward, msoe_random_init
from vsnca_tpu.models.vgg import (
    STYLE_LAYERS,
    vgg16_content_features,
    vgg16_features,
    vgg16_random_init,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    path = os.path.join(FIX, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} missing (run scripts/make_golden_fixtures.py)")
    return np.load(path)


def test_vgg16_extractor_matches_golden_torch_activations():
    fx = _load("golden_vgg16.npz")
    params = vgg16_random_init(jax.random.PRNGKey(int(fx["seed"])))
    img = jnp.asarray(fx["input"])
    ours = vgg16_features(params, img, STYLE_LAYERS)
    for i, o in enumerate(ours):
        np.testing.assert_allclose(
            np.asarray(o), fx[f"style_{i}"], rtol=1e-3, atol=1e-4,
            err_msg=f"style tap {i}",
        )
    content = vgg16_content_features(params, img)
    np.testing.assert_allclose(
        np.asarray(content), fx["content_0"], rtol=1e-3, atol=1e-4
    )


def test_msoe_extractor_matches_golden_torch_activations():
    fx = _load("golden_msoe.npz")
    params = msoe_random_init(jax.random.PRNGKey(int(fx["seed"])))
    pair = jnp.asarray(fx["input"])
    flow, feats = msoe_forward(params, pair, return_features=True)
    feat = feats[0]  # msoe_forward returns the feature as a 1-element list
    np.testing.assert_allclose(
        np.asarray(flow), fx["flow"], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feat), fx["motion_feature"], rtol=1e-3, atol=1e-4
    )


def _digest_check(fx, npz_path):
    arrs = np.load(npz_path)
    stored = {k[len("digest_"):] for k in fx.files if k.startswith("digest_")}
    assert set(arrs.files) == stored, (
        f"converter output keys drifted: {sorted(arrs.files)} vs "
        f"{sorted(stored)}"
    )
    for k in arrs.files:
        a = np.ascontiguousarray(arrs[k])
        got = np.frombuffer(hashlib.sha256(a.tobytes()).digest(), np.uint8)
        np.testing.assert_array_equal(
            got, fx[f"digest_{k}"], err_msg=f"converter bytes drifted at {k}"
        )
        np.testing.assert_array_equal(
            np.asarray(a.shape, np.int64), fx[f"shape_{k}"], err_msg=k
        )


def test_vgg16_converter_bytes_match_golden_digest(tmp_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.dirname(__file__))
    from test_features import build_torch_vgg

    fx = _load("golden_vgg16.npz")
    params = vgg16_random_init(jax.random.PRNGKey(int(fx["seed"])))
    tvgg = build_torch_vgg(params)
    sd = {f"features.{k}": v for k, v in tvgg.state_dict().items()}
    src, dst = tmp_path / "vgg16.pth", tmp_path / "vgg16.npz"
    torch.save(sd, src)
    r = subprocess.run(
        [sys.executable, "scripts/convert_vgg16.py", str(src), str(dst)],
        capture_output=True, text=True, cwd=os.path.dirname(FIX) + "/..",
    )
    assert r.returncode == 0, r.stderr
    _digest_check(fx, dst)


def test_msoe_converter_bytes_match_golden_digest(tmp_path):
    torch = pytest.importorskip("torch")

    fx = _load("golden_msoe.npz")
    params = msoe_random_init(jax.random.PRNGKey(int(fx["seed"])))

    def t(a):
        return torch.from_numpy(np.asarray(a).copy())

    sd = {
        "msoenet.conv1.weight": t(np.asarray(params["conv1_w"])
                                  .transpose(3, 0, 1, 2)[:, None]),
        "msoenet.conv1.bias": t(params["conv1_b"]),
        "msoenet.conv2.weight": t(np.asarray(params["conv2_w"])[0, 0].T
                                  [:, :, None, None]),
        "msoenet.conv2.bias": t(params["conv2_b"]),
        "decode_conv1.weight": t(np.asarray(params["decode1_w"])
                                 .transpose(3, 2, 0, 1)),
        "decode_conv1.bias": t(params["decode1_b"]),
        "decode_conv2.weight": t(np.asarray(params["decode2_w"])
                                 .transpose(3, 2, 0, 1)),
        "decode_conv2.bias": t(params["decode2_b"]),
    }
    src, dst = tmp_path / "two_stream.pth", tmp_path / "msoe.npz"
    torch.save(sd, src)
    r = subprocess.run(
        [sys.executable, "scripts/convert_msoe.py", str(src), str(dst)],
        capture_output=True, text=True, cwd=os.path.dirname(FIX) + "/..",
    )
    assert r.returncode == 0, r.stderr
    _digest_check(fx, dst)
