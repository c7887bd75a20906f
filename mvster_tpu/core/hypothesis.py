"""Depth-hypothesis samplers for the coarse-to-fine cascade.

Stage 1 spreads D hypotheses across the full scene range (uniform in depth or
in inverse depth); later stages narrow the range around the previous stage's
prediction and upsample the hypothesis volume 2x spatially with align-corners
trilinear interpolation.  Semantics mirror the reference samplers
(/root/reference/models/mvs4net_utils.py:61-99).
"""

from __future__ import annotations

import jax.numpy as jnp

from mvster_tpu.core.sampling import resize_trilinear_align_corners


def init_range(depth_values: jnp.ndarray, ndepths: int, h: int, w: int) -> jnp.ndarray:
    """Uniform-in-depth hypotheses over [dmin, dmax].

    depth_values: (B, K) with [:, 0] = dmin and [:, -1] = dmax.
    Returns (B, D, H, W).
    """
    dmin = depth_values[:, 0]
    dmax = depth_values[:, -1]
    interval = (dmax - dmin) / (ndepths - 1)  # (B,)
    steps = jnp.arange(ndepths, dtype=depth_values.dtype)  # (D,)
    samples = dmin[:, None] + steps[None, :] * interval[:, None]  # (B, D)
    return jnp.broadcast_to(
        samples[:, :, None, None], (depth_values.shape[0], ndepths, h, w)
    )


def init_inverse_range(
    depth_values: jnp.ndarray, ndepths: int, h: int, w: int
) -> jnp.ndarray:
    """Uniform-in-inverse-depth hypotheses; index 0 is the FAR plane (dmax).

    Mirrors init_inverse_range (mvs4net_utils.py:71-77): hypotheses run from
    1/dmax (itv=0) to 1/dmin (itv=1), then are inverted back to depth.
    Returns (B, D, H, W).
    """
    inv_min = 1.0 / depth_values[:, 0]  # 1/dmin (largest inverse depth)
    inv_max = 1.0 / depth_values[:, -1]  # 1/dmax (smallest inverse depth)
    itv = jnp.arange(ndepths, dtype=depth_values.dtype) / (ndepths - 1)  # (D,)
    inv_hypo = inv_max[:, None] + (inv_min - inv_max)[:, None] * itv[None, :]
    hypo = 1.0 / inv_hypo  # (B, D)
    return jnp.broadcast_to(
        hypo[:, :, None, None], (depth_values.shape[0], ndepths, h, w)
    )


def schedule_inverse_range(
    inverse_min_depth: jnp.ndarray,
    inverse_max_depth: jnp.ndarray,
    ndepths: int,
    h: int,
    w: int,
) -> jnp.ndarray:
    """Refined inverse-depth hypotheses around the previous-stage prediction.

    inverse_min_depth / inverse_max_depth: (B, H/2, W/2) from the previous
    stage (note: "min depth" = largest inverse depth).  The hypothesis volume
    is built at the coarse resolution and trilinearly upsampled (align-corners)
    to (B, D, H, W) in inverse-depth space, then inverted.
    """
    itv = (
        jnp.arange(ndepths, dtype=inverse_min_depth.dtype) / (ndepths - 1)
    )  # (D,)
    inv_hypo = (
        inverse_max_depth[:, None, :, :]
        + (inverse_min_depth - inverse_max_depth)[:, None, :, :] * itv[None, :, None, None]
    )  # (B, D, H/2, W/2)
    inv_hypo = resize_trilinear_align_corners(inv_hypo, ndepths, h, w)
    return 1.0 / inv_hypo


def schedule_range(
    cur_depth: jnp.ndarray,
    ndepths: int,
    depth_interval_pixel: jnp.ndarray,
    h: int,
    w: int,
) -> jnp.ndarray:
    """Refined uniform-in-depth hypotheses around the previous-stage prediction.

    cur_depth: (B, H/2, W/2) previous-stage depth; depth_interval_pixel: (B,)
    per-sample interval.  Returns (B, D, H, W).
    """
    half = ndepths / 2 * depth_interval_pixel[:, None, None]
    dmin = cur_depth - half
    dmax = cur_depth + half
    interval = (dmax - dmin) / (ndepths - 1)  # (B, H/2, W/2)
    steps = jnp.arange(ndepths, dtype=cur_depth.dtype)  # (D,)
    samples = dmin[:, None, :, :] + steps[None, :, None, None] * interval[:, None, :, :]
    return resize_trilinear_align_corners(samples, ndepths, h, w)
