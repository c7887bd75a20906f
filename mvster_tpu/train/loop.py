"""Epoch-level training orchestration.

The functional core behind tools/train.py: epoch loop with per-step sharded
train steps, periodic TB/JSONL logging, epoch-end eval, and checkpointing —
the reference's train() loop (train_mvs4.py:83-176) restructured around a
restartable step counter so preemption-resume on TPU pods is natural
(SURVEY.md section 5.3/5.4).
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import numpy as np

from mvster_tpu.train.metrics import DictAverageMeter, tree_to_float


def device_batch(batch, sharding=None):
    """Move a numpy batch dict to device (optionally with a sharding)."""
    arrays = {
        k: v for k, v in batch.items() if not isinstance(v, (list, str))
    }
    if sharding is None:
        return jax.tree_util.tree_map(jax.numpy.asarray, arrays)
    return jax.device_put(arrays, sharding)


def train_epoch(
    state,
    train_step: Callable,
    loader,
    epoch: int,
    logger=None,
    summary_freq: int = 100,
    steps_per_epoch: int | None = None,
    log_prefix: str = "train",
    batch_sharding=None,
    print_fn: Callable = print,
) -> Any:
    loader.set_epoch(epoch)
    n_batches = steps_per_epoch or len(loader)
    for batch_idx, batch in enumerate(loader):
        t0 = time.time()
        global_step = n_batches * epoch + batch_idx
        state, scalars, images = train_step(
            state, device_batch(batch, batch_sharding)
        )
        if global_step % summary_freq == 0:
            scalars = tree_to_float(scalars)
            if logger is not None:
                logger.scalars(log_prefix, scalars, global_step)
                logger.images(log_prefix, jax.device_get(images), global_step)
            print_fn(
                f"Epoch {epoch}, Iter {batch_idx}/{n_batches}, "
                f"loss = {scalars['loss']:.3f}, "
                f"c_loss = {scalars.get('s0_c_loss', 0):.3f}/"
                f"{scalars.get('s3_c_loss', 0):.3f}, "
                f"abs_err = {scalars.get('abs_depth_error', 0):.3f}, "
                f"time = {time.time() - t0:.3f}"
            )
    return state


def pad_eval_batch(batch, target: int):
    """Pad a trailing partial batch to `target` samples with zero-mask dups.

    Keeps one compiled shape (and mesh divisibility) while evaluating every
    val sample like the reference's drop_last=False loader
    (train_mvs4.py:141-176): padding duplicates the last sample but zeroes
    its GT masks, so every masked-mean loss/metric in the eval step ignores
    it exactly (losses are pixel-level masked means; depth metrics exclude
    zero-valid images — see train/metrics._per_image_masked_mean).
    """
    n = next(v.shape[0] for v in batch.values() if isinstance(v, np.ndarray))
    if n == target:
        return batch

    def pad(x):
        if isinstance(x, np.ndarray) and x.ndim >= 1 and x.shape[0] == n:
            return np.concatenate(
                [x, np.repeat(x[-1:], target - n, axis=0)], axis=0
            )
        return x

    padded = jax.tree_util.tree_map(pad, dict(batch))
    padded["mask"] = {
        k: np.concatenate(
            [np.asarray(v[:n]), np.zeros((target - n, *v.shape[1:]), v.dtype)]
        )
        for k, v in batch["mask"].items()
    }
    return padded


def evaluate(
    state,
    eval_step: Callable,
    loader,
    logger=None,
    global_step: int = 0,
    log_prefix: str = "fulltest",
    batch_sharding=None,
    print_fn: Callable = print,
) -> dict:
    meter = DictAverageMeter()
    for batch in loader:
        batch = pad_eval_batch(batch, loader.batch_size)
        scalars = eval_step(
            state.params, state.batch_stats, device_batch(batch, batch_sharding)
        )
        meter.update(tree_to_float(scalars))
    means = meter.mean()
    if logger is not None and means:
        logger.scalars(log_prefix, means, global_step)
    if means:
        print_fn(f"avg_test_scalars: {means}")
    return means
