"""LR schedules: warmup-multistep (default), cosine, one-cycle.

The reference trains with WarmupMultiStepLR (linear warmup 500 iters from
lr/3, x0.5 decay at epoch milestones — utils.py:208-250, train_mvs4.py:84-92)
and optionally CosineAnnealingLR / OneCycleLR.  All three are provided as
optax-compatible schedule functions (step -> lr), jit-traceable.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_multistep_schedule(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.5,
    warmup_factor: float = 1.0 / 3,
    warmup_iters: int = 500,
):
    ms = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        alpha = jnp.minimum(step, warmup_iters) / warmup_iters
        warm = warmup_factor * (1.0 - alpha) + alpha
        decays = jnp.sum(step >= ms)
        return base_lr * warm * gamma ** decays

    return schedule


def make_lr_schedule(
    name: str,
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    lrepochs: str = "6,8,9:2",
):
    """Build a schedule from the reference CLI spec.

    name: "MS" | "cos" | "onecycle"; lrepochs: "e1,e2,..:denom" (MS only).
    """
    total_steps = steps_per_epoch * epochs
    if name == "MS":
        epoch_list, denom = lrepochs.split(":")
        milestones = [steps_per_epoch * int(e) for e in epoch_list.split(",")]
        return warmup_multistep_schedule(base_lr, milestones, gamma=1.0 / float(denom))
    if name == "cos":
        return optax.cosine_decay_schedule(base_lr, decay_steps=total_steps, alpha=0.0)
    if name == "onecycle":
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=base_lr,
            pct_start=0.3, div_factor=25.0, final_div_factor=1e4,
        )
    raise ValueError(f"unknown lr scheduler {name!r}")
