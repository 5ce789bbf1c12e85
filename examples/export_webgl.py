#!/usr/bin/env python
"""Export a trained checkpoint to the WebGL JSON format and validate the
quantization drift (convert_models_to_webgl.ipynb equivalent).

Example:
    python examples/export_webgl.py out/run/checkpoint web/model.json \
        --conditioning edges
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("out_json")
    p.add_argument("--name", default="model")
    p.add_argument("--conditioning", default="none",
                   choices=["none", "pos_emb", "edges"])
    p.add_argument("--c-in", type=int, default=12)
    p.add_argument("--fc-dim", type=int, default=96)
    p.add_argument("--metadata-json", default=None)
    args = p.parse_args()

    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.export.checkpoint import load_checkpoint
    from vsnca_tpu.export.webgl import save_webgl_model
    from vsnca_tpu.export.webgl_sim import validate_export

    state = load_checkpoint(args.checkpoint)
    params = state["params"]
    cond = None if args.conditioning == "none" else args.conditioning
    cfg = NCAConfig(c_in=args.c_in, fc_dim=args.fc_dim, conditioning=cond)

    save_webgl_model(
        args.out_json, [params], [args.name],
        pos_emb=cond == "pos_emb", edge_conditioning=cond == "edges",
        metadata_json_path=args.metadata_json, texture_name=args.name,
    )
    drift = validate_export(args.out_json, params, cfg)
    print(f"exported {args.out_json}")
    print(f"quantization drift: {drift}")


if __name__ == "__main__":
    main()
