#!/usr/bin/env python
"""Generate committed golden fixtures pinning the converter chain.

Builds seeded torch-format checkpoints (the exact key/layout schemes of
torchvision ``vgg16-*.pth`` and the gdown ``two_stream_dynamic_model.pth``
— reference ExtraChannels/models/__init__.py:26-46,
utils/loss/appearance_loss.py:211-236), runs the REAL converter scripts on
them, computes activations with the torch mirror models on fixed inputs,
and saves small fixtures to ``tests/fixtures/``:

  golden_vgg16.npz : fixed input + the torch mirror's five style-tap
                     feature maps + pre-ReLU content tap + per-key SHA-256
                     digests of the converter-produced npz (weights are
                     regenerable from the recorded seed, so they are not
                     stored — the digests pin the converter bytes).
  golden_msoe.npz  : fixed frame pair + the torch mirror's flow and
                     320-ch motion feature + converter digests.

tests/test_golden_fixtures.py verifies (a) WITHOUT torch: our JAX
extractors with the seed-regenerated weights reproduce the stored torch
activations; (b) with torch available: re-running the real converter
reproduces the stored digests byte-exactly. When real pretrained
checkpoints appear, `python scripts/convert_vgg16.py vgg16-*.pth` is a
pre-pinned path end-to-end (VERDICT r3 next-round #8).

Run from the repo root:  python scripts/make_golden_fixtures.py
"""

import hashlib
import os
import subprocess
import sys
import tempfile

import numpy as np
import torch

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax  # noqa: E402

# The seed-regenerated weights must be bit-identical to what the CPU test
# suite regenerates: jax.random.normal differs by ulps across backends, so
# the fixtures are ALWAYS generated on the CPU backend (the sitecustomize
# registers the TPU plugin regardless of env — config update required).
jax.config.update("jax_platforms", "cpu")

from test_features import (  # noqa: E402
    build_torch_vgg,
    torch_middle_features,
    torch_msoe_forward,
)
from vsnca_tpu.models.msoe import msoe_random_init  # noqa: E402
from vsnca_tpu.models.vgg import (  # noqa: E402
    CONTENT_LAYER,
    STYLE_LAYERS,
    vgg16_random_init,
)

OUT_DIR = "tests/fixtures"
VGG_SEED = 3
MSOE_SEED = 5


def run_converter(script, src, dst):
    r = subprocess.run([sys.executable, f"scripts/{script}", str(src),
                        str(dst)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr


def digests(npz_path):
    d = {}
    arrs = np.load(npz_path)
    for k in arrs.files:
        a = np.ascontiguousarray(arrs[k])
        d[f"digest_{k}"] = np.frombuffer(
            hashlib.sha256(a.tobytes()).digest(), np.uint8
        )
        d[f"shape_{k}"] = np.asarray(a.shape, np.int64)
    return d


def make_vgg_fixture():
    params = vgg16_random_init(jax.random.PRNGKey(VGG_SEED))
    tvgg = build_torch_vgg(params)
    sd = {f"features.{k}": v for k, v in tvgg.state_dict().items()}
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "vgg16.pth")
        npz = os.path.join(td, "vgg16.npz")
        torch.save(sd, src)
        run_converter("convert_vgg16.py", src, npz)
        dig = digests(npz)

    img = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    style = torch_middle_features(tvgg, timg, STYLE_LAYERS)
    # tap index 19 IS the pre-ReLU conv4_2 output in the Sequential
    content = torch_middle_features(tvgg, timg, [CONTENT_LAYER])
    out = {"input": img, "seed": np.asarray(VGG_SEED), **dig}
    for i, f in enumerate(style):
        out[f"style_{i}"] = f.detach().numpy().transpose(0, 2, 3, 1)
    out["content_0"] = content[0].detach().numpy().transpose(0, 2, 3, 1)
    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(os.path.join(OUT_DIR, "golden_vgg16.npz"), **out)


def make_msoe_fixture():
    params = msoe_random_init(jax.random.PRNGKey(MSOE_SEED))

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
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "two_stream_dynamic_model.pth")
        npz = os.path.join(td, "msoe.npz")
        torch.save(sd, src)
        run_converter("convert_msoe.py", src, npz)
        dig = digests(npz)

    pair = np.random.RandomState(1).rand(1, 32, 32, 2).astype(np.float32)
    flow, feat = torch_msoe_forward(params, pair)
    np.savez_compressed(
        os.path.join(OUT_DIR, "golden_msoe.npz"),
        input=pair, seed=np.asarray(MSOE_SEED),
        flow=np.asarray(flow), motion_feature=np.asarray(feat), **dig,
    )


if __name__ == "__main__":
    make_vgg_fixture()
    make_msoe_fixture()
    for f in ("golden_vgg16.npz", "golden_msoe.npz"):
        p = os.path.join(OUT_DIR, f)
        print(f, os.path.getsize(p) // 1024, "KiB")
