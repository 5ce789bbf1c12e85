"""Round-trip tests for the offline weight converters (scripts/convert_*.py).

The converters are the only link between the reference's pretrained
checkpoints (torchvision vgg16, two_stream_dynamic_model.pth —
ExtraChannels/models/__init__.py:26-46, utils/loss/appearance_loss.py:211-236)
and our npz loaders; a key-naming or transpose bug would only surface on a
user's machine. Here we synthesize torch-format checkpoints from known
weights, run the actual converter scripts as subprocesses, load the npz via
the public loaders, and assert exact weight equality plus feature parity
against torch mirrors built from the same checkpoints.
"""

import subprocess
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from test_features import (
    build_torch_vgg,
    torch_middle_features,
    torch_msoe_forward,
)
from vsnca_tpu.models.msoe import msoe_forward, msoe_random_init, load_msoe
from vsnca_tpu.models.vgg import (
    STYLE_LAYERS,
    load_vgg16,
    vgg16_features,
    vgg16_random_init,
)

def _run_converter(script, src, dst):
    r = subprocess.run(
        [sys.executable, f"scripts/{script}", str(src), str(dst)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    return dst


def test_convert_vgg16_round_trip(tmp_path):
    """Synthetic torchvision-style vgg16 checkpoint → convert_vgg16.py →
    load_vgg16 → exact weight round-trip + style-tap parity vs the torch
    mirror of the same checkpoint."""
    params = vgg16_random_init(jax.random.PRNGKey(3))
    tvgg = build_torch_vgg(params)
    # build_torch_vgg's Sequential replicates torchvision's features layout,
    # so its state_dict keys ARE the bare-features key scheme; re-key to the
    # full torchvision "features.<idx>.*" scheme to test prefix detection.
    sd = {f"features.{k}": v for k, v in tvgg.state_dict().items()}
    src = tmp_path / "vgg16.pth"
    torch.save(sd, src)
    npz = _run_converter("convert_vgg16.py", src, tmp_path / "vgg16.npz")

    loaded, pretrained = load_vgg16(str(npz))
    assert pretrained
    for orig, got in zip(params, loaded):
        np.testing.assert_array_equal(np.asarray(orig["w"]), np.asarray(got["w"]))
        np.testing.assert_array_equal(np.asarray(orig["b"]), np.asarray(got["b"]))

    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    ours = vgg16_features(loaded, jnp.asarray(img), STYLE_LAYERS)
    theirs = torch_middle_features(
        tvgg, torch.from_numpy(img).permute(0, 3, 1, 2), STYLE_LAYERS
    )
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(
            np.asarray(o), t.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4,
        )


def test_convert_msoe_round_trip(tmp_path):
    """Synthetic two_stream_dynamic_model.pth-shaped state_dict →
    convert_msoe.py → load_msoe → exact weight round-trip + full-forward
    flow parity vs the torch MSOE mirror."""
    params = msoe_random_init(jax.random.PRNGKey(5))

    def t(a):
        return torch.from_numpy(np.asarray(a).copy())

    sd = {
        # [11,11,2,32] → Conv3d weight [32,1,11,11,2]
        "msoenet.conv1.weight": t(np.asarray(params["conv1_w"])
                                  .transpose(3, 0, 1, 2)[:, None]),
        "msoenet.conv1.bias": t(params["conv1_b"]),
        # [1,1,32,64] → Conv2d weight [64,32,1,1]
        "msoenet.conv2.weight": t(np.asarray(params["conv2_w"])[0, 0].T
                                  [:, :, None, None]),
        "msoenet.conv2.bias": t(params["conv2_b"]),
        # [3,3,320,64] → [64,320,3,3]
        "decode_conv1.weight": t(np.asarray(params["decode1_w"])
                                 .transpose(3, 2, 0, 1)),
        "decode_conv1.bias": t(params["decode1_b"]),
        # [1,1,64,2] → [2,64,1,1]
        "decode_conv2.weight": t(np.asarray(params["decode2_w"])
                                 .transpose(3, 2, 0, 1)),
        "decode_conv2.bias": t(params["decode2_b"]),
    }
    src = tmp_path / "two_stream_dynamic_model.pth"
    torch.save(sd, src)
    npz = _run_converter("convert_msoe.py", src, tmp_path / "msoe.npz")

    loaded, pretrained = load_msoe(str(npz))
    assert pretrained
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(params[k]), np.asarray(loaded[k]), err_msg=k
        )

    pair = np.random.RandomState(1).rand(1, 32, 32, 2).astype(np.float32)
    flow = np.asarray(msoe_forward(loaded, jnp.asarray(pair)))
    flow_t, _ = torch_msoe_forward(params, pair)
    np.testing.assert_allclose(flow, flow_t, rtol=1e-3, atol=1e-4)
