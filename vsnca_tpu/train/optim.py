"""Optimizer: per-parameter gradient normalization + Adam + MultiStep LR.

Parity targets: grad /= (||grad|| + 1e-8) per parameter tensor
(ConditioneDyNCA/experiments.py:259-263), Adam lr 1e-3, MultiStepLR
boundaries with gamma 0.5/0.3 (SURVEY.md §8).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def normalize_grads(grads):
    """L2-normalize each parameter tensor's gradient independently."""
    return jax.tree_util.tree_map(
        lambda g: g / (jnp.linalg.norm(g.reshape(-1)) + 1e-8), grads
    )


def multistep_lr(lr: float, boundaries: Sequence[int], gamma: float):
    """optax schedule equal to torch MultiStepLR(milestones, gamma)."""
    return optax.piecewise_constant_schedule(
        init_value=lr,
        boundaries_and_scales={int(b): gamma for b in boundaries},
    )


def make_optimizer(lr: float, boundaries: Sequence[int] = (), gamma: float = 0.5):
    """grad-normalize → Adam(schedule). torch Adam defaults (b1=.9, b2=.999,
    eps=1e-8) match optax defaults."""
    schedule = multistep_lr(lr, boundaries, gamma) if boundaries else lr
    return optax.chain(
        optax.stateless(lambda g, p: normalize_grads(g)),
        optax.adam(schedule),
    )
