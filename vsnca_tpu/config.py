"""Typed, immutable configuration (replaces the reference's mutable argparse
Namespaces — SURVEY.md §5.6).

Five preset configs mirror BASELINE.json's config list; see
``vsnca_tpu.train.presets``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class NCAConfig:
    """DyNCA cell configuration.

    Mirrors the reference ctor surface (ConditioneDyNCA/models/dynca.py:30-73):
    ``c_in``/``c_out``/``fc_dim``/``padding_mode``/``seed_mode``/
    ``conditioning``/``edge_transform``/``perception_scales``; plus
    ``seed_channels`` to express the ExtraChannels variant whose seed carries
    one fewer channel than the cell consumes (the grayscale content channel is
    appended by the trainer — ExtraChannels/models/dynca.py:140,143,150 and
    experiments.py:211).
    """

    c_in: int = 12
    c_out: int = 3
    fc_dim: int = 96
    padding_mode: str = "replicate"  # replicate | circular | zeros
    seed_mode: str = "zeros"  # zeros | center_on | random
    conditioning: Optional[str] = None  # None | 'pos_emb' | 'edges'
    edge_transform: str = "none"  # 'none' | 'tanh'
    perception_scales: Tuple[int, ...] = (0,)
    update_rate: float = 0.5
    seed_channels: Optional[int] = None  # defaults to c_in
    dtype: str = "float32"

    @property
    def c_cond(self) -> int:
        if self.conditioning == "pos_emb":
            return 2
        if self.conditioning == "edges":
            return 3
        return 0

    @property
    def expand(self) -> int:
        return 4

    @property
    def perception_dim(self) -> int:
        return self.c_in * self.expand + self.c_cond

    @property
    def n_seed_channels(self) -> int:
        return self.seed_channels if self.seed_channels is not None else self.c_in


@dataclasses.dataclass(frozen=True)
class ConditionedNCAConfig:
    """EncoderConditioning ConditionedNCA configuration
    (EncoderConditioning/nca.py:61-125)."""

    num_target_channels: int = 3
    num_hidden_channels: int = 16
    use_living_channel: bool = True
    living_channel_dim: Optional[int] = None  # defaults to num_target_channels
    alpha_living_threshold: float = 0.1
    cell_fire_rate: float = 0.5
    update_hidden_dim: int = 64
    image_size: int = 64
    clamp_value: float = 10.0

    @property
    def num_channels(self) -> int:
        return self.num_target_channels + self.num_hidden_channels + 1

    @property
    def alive_channel(self) -> int:
        return (
            self.living_channel_dim
            if self.living_channel_dim is not None
            else self.num_target_channels
        )


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Weights + metric selections for the loss orchestrator
    (ExtraChannels/utils/loss/loss.py:12-64; defaults from SURVEY.md §8)."""

    overflow_weight: float = 0.0
    appearance_weight: float = 0.0
    appearance_loss_type: str = "OT"  # OT | SlW | Gram
    auxiliary_weight: float = 0.0
    auxiliary_loss_type: str = "VGG"  # MSE | VGG | OT | SlW | Gram
    vector_field_motion_weight: float = 0.0
    motion_strength_weight: float = 0.5
    motion_direction_weight: float = 0.5
    motion_vector_field_name: str = "circular"
    video_motion_weight: float = 0.0
    video_motion_loss_type: str = "MotionOT"  # MotionOT | MotionSlW | MotionGram
    style_consistency_weight: float = 0.0
    content_weight: float = 0.0  # EncoderConditioning stack
    motion_img_size: Tuple[int, int] = (256, 256)
    nca_base_num_steps: int = 24
    ot_subsample: int = 1000
    slw_projections: int = 32


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-harness knobs (SURVEY.md §2.4, §8)."""

    img_size: Tuple[int, int] = (256, 256)
    batch_size: int = 2
    pool_size: int = 256
    step_range: Tuple[int, int] = (32, 128)
    inject_seed_every: int = 8
    max_iterations: int = 2000
    lr: float = 1e-3
    lr_decay_steps: Tuple[int, ...] = (500, 1000)
    lr_decay_gamma: float = 0.5
    save_every: int = 50
    seed: int = 42
    # jit-bucketing for the random rollout length: step_n is snapped to the
    # nearest bucket so only a handful of XLA programs are compiled.
    step_buckets: Tuple[int, ...] = (32, 48, 64, 96, 128)
    remat: str = "per_step"  # per_step | none | segment
    # Rollout implementation inside the train step: "auto" uses the fused
    # Pallas custom-VJP kernel pair (ops/pallas_train.py) when the shape/
    # config supports it, else the XLA scan; "xla"/"fused" force a path.
    rollout_path: str = "auto"
