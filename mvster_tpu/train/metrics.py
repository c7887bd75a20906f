"""Depth-quality metrics + running averages.

Mirrors the reference metric set (utils.py:126-159): per-image masked absolute
depth error and fraction-above-threshold, averaged over the batch; plus the
DictAverageMeter used for epoch-level eval summaries (utils.py:103-122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_image_masked_mean(values, mask):
    """Mean over images of per-image masked means.

    Images with no valid pixels are excluded from the outer mean (rather
    than contributing 0) — this is what lets eval pad a trailing partial
    batch with zero-mask duplicates and still report the exact same metric
    the reference computes on the unpadded batch (train_mvs4.py:141-176
    evaluates with drop_last=False).
    """
    m = mask.astype(jnp.float32)
    msum = jnp.sum(m, axis=(1, 2))
    per = jnp.sum(values * m, axis=(1, 2)) / jnp.maximum(msum, 1.0)
    w = (msum > 0).astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def thres_metric(depth_est, depth_gt, mask, thres: float):
    """Mean (over images) fraction of valid pixels with |err| > thres."""
    err = jnp.abs(depth_est - depth_gt) > thres
    return _per_image_masked_mean(err.astype(jnp.float32), mask)


def abs_depth_error(depth_est, depth_gt, mask):
    """Mean (over images) masked mean absolute depth error."""
    return _per_image_masked_mean(jnp.abs(depth_est - depth_gt), mask)


def depth_metrics(depth_est, depth_gt, mask):
    """The reference scalar set: abs error + >2/4/8mm fractions."""
    return {
        "abs_depth_error": abs_depth_error(depth_est, depth_gt, mask),
        "thres2mm_error": thres_metric(depth_est, depth_gt, mask, 2.0),
        "thres4mm_error": thres_metric(depth_est, depth_gt, mask, 4.0),
        "thres8mm_error": thres_metric(depth_est, depth_gt, mask, 8.0),
    }


class DictAverageMeter:
    """Running mean of scalar dicts (epoch-level eval aggregation)."""

    def __init__(self):
        self.data: dict[str, float] = {}
        self.count = 0

    def update(self, scalars: dict):
        self.count += 1
        for k, v in scalars.items():
            self.data[k] = self.data.get(k, 0.0) + float(v)

    def mean(self) -> dict[str, float]:
        return {k: v / max(self.count, 1) for k, v in self.data.items()}


def tree_to_float(tree):
    """Recursively convert jax scalars/arrays to python floats/lists."""
    return jax.tree_util.tree_map(
        lambda x: float(x) if jnp.ndim(x) == 0 else jnp.asarray(x).tolist(), tree
    )
