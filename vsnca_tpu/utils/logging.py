"""Metrics/observability (SURVEY.md §5.5).

``MetricsLogger`` fans out to: a JSONL file (always), TensorBoard (when
torch.utils.tensorboard is importable — flush_secs=10 like the reference
trainer.py:24-27), and wandb (when installed AND explicitly enabled; the
image is zero-egress so it defaults off).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    def __init__(
        self,
        log_dir: str,
        use_tensorboard: bool = True,
        use_wandb: bool = False,
        wandb_project: str = "vsnca-tpu",
        run_name: Optional[str] = None,
        config: Optional[dict] = None,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()

        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(log_dir, "tensorboard"), flush_secs=10
                )
            except Exception:
                self._tb = None

        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, name=run_name, config=config or {}
                )
            except Exception:
                self._wandb = None

        if config is not None:
            with open(os.path.join(log_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log_scalars(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step, "t": time.time() - self._t0, **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def log_images(self, step: int, images: Dict[str, np.ndarray]):
        """images: name → [H, W, 3] float [0,1] or uint8."""
        if self._tb is not None:
            for k, v in images.items():
                arr = np.asarray(v)
                if arr.dtype != np.uint8:
                    arr = np.uint8(np.clip(arr, 0, 1) * 255)
                self._tb.add_image(k, arr, step, dataformats="HWC")
        if self._wandb is not None:
            import wandb

            self._wandb.log(
                {k: wandb.Image(np.asarray(v)) for k, v in images.items()},
                step=step,
            )
        # always dump to disk as the file-artifact trail
        from PIL import Image

        img_dir = os.path.join(self.log_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        for k, v in images.items():
            arr = np.asarray(v)
            if arr.dtype != np.uint8:
                arr = np.uint8(np.clip(arr, 0, 1) * 255)
            Image.fromarray(arr).save(
                os.path.join(img_dir, f"{k.replace('/', '_')}_{step}.png")
            )

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
