"""Device-resident conditioning-image dataset
(EncoderConditioning/utils/dataset.py:9-36): load a folder of images once to
a single device array; sample random batches."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from vsnca_tpu.data.preprocess import preprocess_style_image

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


class ConditioningDataset:
    def __init__(self, images: np.ndarray):
        """images: [N, H, W, 3] in [0, 1] — the EncoderConditioning stack
        works in [0, 1] throughout (reference load_image uses ToTensor and
        never rescales; the content loss's (x+1)/2 lines are commented
        out)."""
        self.images = jnp.asarray(images)

    @classmethod
    def from_folder(cls, folder: str, image_size: int = 64) -> "ConditioningDataset":
        paths = sorted(
            os.path.join(folder, f)
            for f in os.listdir(folder)
            if f.lower().endswith(IMG_EXTS)
        )
        imgs = [
            preprocess_style_image(p, (image_size, image_size), 1)[0]
            for p in paths
        ]
        return cls(np.stack(imgs).astype(np.float32))

    def __len__(self) -> int:
        return int(self.images.shape[0])

    def sample(self, rng: np.random.RandomState, batch: int) -> jnp.ndarray:
        idx = rng.randint(0, len(self), size=batch)
        return self.images[jnp.asarray(idx)]

    def __getitem__(self, idx) -> jnp.ndarray:
        return self.images[idx]
