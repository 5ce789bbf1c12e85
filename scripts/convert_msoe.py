#!/usr/bin/env python
"""Convert the reference's two_stream_dynamic_model.pth (MSOEmultiscale
state_dict) to vsnca_tpu npz format.

Usage:
    python scripts/convert_msoe.py /path/to/two_stream_dynamic_model.pth [out.npz]

Key mapping (torch → npz):
    msoenet.conv1.weight  [32,1,11,11,2] → conv1_w [11,11,2,32]
    msoenet.conv2.weight  [64,32,1,1]    → conv2_w [1,1,32,64]
    decode_conv1.weight   [64,320,3,3]   → decode1_w [3,3,320,64]
    decode_conv2.weight   [2,64,1,1]     → decode2_w [1,1,64,2]
"""

import sys

import numpy as np
import torch


def main():
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else "weights/msoe.npz"
    obj = torch.load(src, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    sd = {k: v for k, v in sd.items()}

    def np32(t):
        return t.detach().numpy().astype(np.float32)

    c1 = np32(sd["msoenet.conv1.weight"])  # [32,1,11,11,2]
    out = {
        "conv1_w": c1[:, 0].transpose(1, 2, 3, 0),  # [11,11,2,32]
        "conv1_b": np32(sd["msoenet.conv1.bias"]),
        "conv2_w": np32(sd["msoenet.conv2.weight"]).transpose(2, 3, 1, 0),
        "conv2_b": np32(sd["msoenet.conv2.bias"]),
        "decode1_w": np32(sd["decode_conv1.weight"]).transpose(2, 3, 1, 0),
        "decode1_b": np32(sd["decode_conv1.bias"]),
        "decode2_w": np32(sd["decode_conv2.weight"]).transpose(2, 3, 1, 0),
        "decode2_b": np32(sd["decode_conv2.bias"]),
    }
    np.savez(dst, **out)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
