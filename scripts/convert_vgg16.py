#!/usr/bin/env python
"""Convert a torchvision VGG16 checkpoint to vsnca_tpu npz format.

Usage:
    python scripts/convert_vgg16.py /path/to/vgg16-397923af.pth [out.npz]

Accepts either a full torchvision ``vgg16`` state_dict (keys
``features.<idx>.weight``) or a bare ``features`` state_dict. OIHW conv
weights are transposed to HWIO. Run this once on a machine with the
checkpoint; commit the npz to ``weights/`` (or point VSNCA_VGG16_NPZ at it).
"""

import sys

import numpy as np
import torch

sys.path.insert(0, ".")
from vsnca_tpu.models.vgg import VGG16_CONV_INDICES  # noqa: E402


def main():
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else "weights/vgg16.npz"
    sd = torch.load(src, map_location="cpu", weights_only=True)
    if any(k.startswith("features.") for k in sd):
        prefix = "features."
    else:
        prefix = ""
    out = {}
    for i, idx in enumerate(VGG16_CONV_INDICES):
        w = sd[f"{prefix}{idx}.weight"].numpy()  # OIHW
        b = sd[f"{prefix}{idx}.bias"].numpy()
        out[f"w{i}"] = w.transpose(2, 3, 1, 0).astype(np.float32)  # HWIO
        out[f"b{i}"] = b.astype(np.float32)
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out)//2} conv layers")


if __name__ == "__main__":
    main()
