#!/usr/bin/env python
"""Benchmark entry point — prints ONE JSON line.

Primary metric (BASELINE.json): NCA cell-updates/sec on the stylization
rollout at 256px (single chip). ``vs_baseline`` compares against the
north-star proxy of 30 fps at 512px with 24 steps/frame — i.e.
30 * 512 * 512 * 24 ≈ 1.89e8 cell-updates/sec; >1.0 beats the target.
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    from vsnca_tpu.infer.benchmark import benchmark_rollout

    r256 = benchmark_rollout(size=256, batch=1, n_steps=96)
    r512 = benchmark_rollout(size=512, batch=1, n_steps=96)

    target_cups = 30 * 512 * 512 * 24  # 30fps@512px, 24 NCA steps/frame
    result = {
        "metric": "nca_cell_updates_per_sec_256px",
        "value": r256["cell_updates_per_sec"],
        "unit": "cells*steps/s",
        "vs_baseline": r512["cell_updates_per_sec"] / target_cups,
        "detail": {
            "fps_512px_24steps": r512["frames_per_sec"],
            "fps_256px_24steps": r256["frames_per_sec"],
            "ms_per_step_256px": r256["ms_per_step"],
            "ms_per_step_512px": r512["ms_per_step"],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
