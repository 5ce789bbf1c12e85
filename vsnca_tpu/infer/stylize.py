"""Persistent-state video stylization — the product inference path.

Parity target: ``save_video`` (ExtraChannels/utils/misc/video_utils.py:50-83,
SURVEY.md §3.4): the NCA state persists across frames (temporal coherence
from the attractor dynamics) while each incoming frame's grayscale/edge
content steers it; per frame the cell runs ``step_n`` (default 24) steps and
the RGB readout is clipped to [-1, 1] → [0, 1].

TPU-first: the per-frame rollout is one jitted scan program (compiled once
per resolution); frames stream through HBM without host round-trips except
for the final readout.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.models.dynca import (
    dynca_rollout,
    dynca_seed,
    make_conditioning,
)


class VideoStylizer:
    """Streaming stylizer with persistent NCA state.

    Works at any resolution (``size_factor`` scaling as in the reference).
    For the ExtraChannels variant the grayscale frame is appended as the last
    state channel and stripped after the rollout (video_utils.py:72-76); for
    edge conditioning it is passed as ``cond_img``.
    """

    def __init__(
        self,
        params: dict,
        nca_cfg: NCAConfig,
        size,
        step_n: int = 24,
        key: Optional[jax.Array] = None,
        use_fused: str = "auto",
    ):
        """``use_fused``: 'auto' selects the fused Pallas VMEM-resident
        rollout kernel when the grid fits (TPU only); 'never' forces the
        XLA scan path; 'always' asserts kernel support."""
        self.params = params
        self.cfg = nca_cfg
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.step_n = step_n
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self._extra_channel = nca_cfg.n_seed_channels < nca_cfg.c_in
        self._frame_idx = 0

        from vsnca_tpu.ops.pallas_step import select_rollout_kernel

        on_tpu = jax.devices()[0].platform == "tpu"
        self._kernel = select_rollout_kernel(nca_cfg, *self.size) if on_tpu else None
        if use_fused == "always":
            assert self._kernel is not None, (
                "fused kernel unsupported for this config/size"
            )
        if use_fused == "never":
            self._kernel = None
        self._fused = self._kernel is not None
        self._frame_fn = jax.jit(self._frame_step)
        self.reset()

    def _split(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def reset(self):
        """(Re)seed. On the fused path the persistent state is CHW so the
        per-frame program never transposes the full state tensor."""
        state = dynca_seed(self.cfg, 1, self.size, key=self._split())
        self.state = (
            jnp.transpose(state, (0, 3, 1, 2)) if self._fused else state
        )

    @property
    def state_nhwc(self) -> jnp.ndarray:
        return (
            jnp.transpose(self.state, (0, 2, 3, 1)) if self._fused else self.state
        )

    def _frame_step(self, params, state, frame, seed_or_key):
        """Whole per-frame computation as ONE traced program: grayscale +
        conditioning + rollout + channel strip + clip. A single dispatch per
        frame (per-op dispatch latency would otherwise dominate at 24
        steps/frame)."""
        gray = jnp.mean(frame, axis=-1, keepdims=True)
        cond = None
        if not self._extra_channel and self.cfg.conditioning is not None:
            cond = make_conditioning(
                self.cfg, self.size, cond_img=gray, batch=frame.shape[0]
            )

        if self._fused:
            from vsnca_tpu.ops.pallas_step import ROLLOUT_KERNELS

            # state is CHW; only small conditioning/rgb tensors transpose.
            h = state
            if self._extra_channel:
                h = jnp.concatenate(
                    [state, jnp.transpose(gray, (0, 3, 1, 2))], axis=1
                )
            cond_chw = (
                jnp.transpose(cond, (0, 3, 1, 2)) if cond is not None else None
            )
            out = ROLLOUT_KERNELS[self._kernel](
                params, h, seed_or_key, self.cfg, self.step_n,
                cond=cond_chw, compute_dtype="bfloat16",
            )
            if self._extra_channel:
                out = out[:, : self.cfg.n_seed_channels]
            rgb = jnp.transpose(out[:, : self.cfg.c_out], (0, 2, 3, 1)) * 2.0
            return out, (jnp.clip(rgb, -1.0, 1.0) + 1.0) / 2.0

        h = state
        if self._extra_channel:
            h = jnp.concatenate([h, gray], axis=-1)
        state, rgb = dynca_rollout(
            params, h, seed_or_key, self.cfg, self.step_n, cond=cond,
            remat="none",
        )
        if self._extra_channel:
            state = state[..., : self.cfg.n_seed_channels]
        return state, (jnp.clip(rgb, -1.0, 1.0) + 1.0) / 2.0

    def damage(self, x: int, y: int, radius: int):
        """Zero a circular patch of the persistent state — the brush /
        clearCircle tool of the browser runtime (docs/dynca.js paint API).
        The NCA regenerates the region over subsequent frames."""
        import numpy as np

        yy, xx = np.ogrid[: self.size[0], : self.size[1]]
        keep = ((xx - x) ** 2 + (yy - y) ** 2 > radius**2).astype(np.float32)
        if self._fused:  # CHW
            self.state = self.state * jnp.asarray(keep)[None, None, :, :]
        else:  # NHWC
            self.state = self.state * jnp.asarray(keep)[None, :, :, None]

    def step_frame(self, frame: jnp.ndarray) -> jnp.ndarray:
        """Advance one content frame [1, H, W, 3] in [-1, 1] → stylized RGB
        [1, H, W, 3] in [0, 1]."""
        if self._fused:
            self._frame_idx += 1
            seed_or_key = jnp.int32(self._frame_idx)
        else:
            seed_or_key = self._split()
        self.state, rgb = self._frame_fn(
            self.params, self.state, frame, seed_or_key
        )
        return rgb


def stylize_frames(
    params: dict,
    nca_cfg: NCAConfig,
    frames: Sequence[np.ndarray],
    step_n: int = 24,
    steps_per_frame: int = 1,
    size_factor: float = 1.0,
    key: Optional[jax.Array] = None,
) -> Iterator[np.ndarray]:
    """Stylize a frame sequence [T, H, W, 3] in [-1, 1]; yields [H, W, 3]
    arrays in [0, 1] (video_utils.py:50-83 semantics incl. steps_per_frame)."""
    h, w = frames[0].shape[0], frames[0].shape[1]
    size = (int(h * size_factor), int(w * size_factor))
    styl = VideoStylizer(params, nca_cfg, size, step_n, key)
    from vsnca_tpu.ops.resize import resize_bilinear

    for frame in frames:
        f = jnp.asarray(frame)[None]
        if size != (h, w):
            f = resize_bilinear(f, size)
        # one OUTPUT frame per NCA pass: steps_per_frame=k emits k video
        # frames per input frame (video_utils.py:69-82 adds inside the loop)
        for _ in range(steps_per_frame):
            out = styl.step_frame(f)
            yield np.asarray(out[0])


def generate_control_frames(
    params: dict,
    nca_cfg: NCAConfig,
    style_image: np.ndarray,
    n_frames: int = 32,
    step_n: int = 24,
    key: Optional[jax.Array] = None,
):
    """Control generations: stylize the style image itself and a black image
    (video_utils.py:101-120) as qualitative sanity checks. Returns
    (style_frames, black_frames) lists."""
    style_seq = np.repeat(style_image[None], n_frames, axis=0)
    black_seq = np.zeros_like(style_seq) - 1.0
    style_frames = list(stylize_frames(params, nca_cfg, style_seq, step_n, key=key))
    black_frames = list(stylize_frames(params, nca_cfg, black_seq, step_n, key=key))
    return style_frames, black_frames
