"""Resampling primitives: bilinear gather, align-corners resize, pooling.

These replace the CUDA kernels the reference leans on (`F.grid_sample`,
`F.interpolate`, `F.max_pool2d` — see /root/reference/models/mvs4net_utils.py:51,
:482, :762) with gather/matmul formulations that XLA tiles well on TPU:

  * `bilinear_sample` is a 4-tap gather with per-tap zero-padding masks —
    identical semantics to `grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=True)` when fed raw pixel coordinates.
  * align-corners linear resizes are expressed as separable 1D interpolation
    matrices applied with `jnp.matmul` (dense, MXU-friendly, and exactly
    reproducing `F.interpolate(..., align_corners=True)` weights).

Layout convention is channels-last: images are (..., H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample `img` at continuous pixel coords with bilinear interp, zero padding.

    Args:
      img: (H, W, C) source image.
      x, y: arbitrary (and equal) shaped pixel coordinates; x along width.

    Returns:
      (*x.shape, C) samples.  Out-of-bounds taps contribute zero, matching
      torch grid_sample's zeros padding: each of the 4 neighbor taps is
      individually masked, so partially-outside samples are partially zeroed.
    """
    h, w, c = img.shape
    out_shape = x.shape + (c,)
    x = x.reshape(-1)
    y = y.reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def tap(yi, xi, weight):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        flat = yi * w + xi
        vals = img.reshape(h * w, c)[flat]  # gather
        return vals * (weight * valid)[:, None]

    out = (
        tap(y0i, x0i, (1.0 - wy) * (1.0 - wx))
        + tap(y0i, x1i, (1.0 - wy) * wx)
        + tap(y1i, x0i, wy * (1.0 - wx))
        + tap(y1i, x1i, wy * wx)
    )
    return out.reshape(out_shape)


def grid_sample_zeros(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear_sample: img (B, H, W, C); x, y (B, ...) -> (B, ..., C)."""
    return jax.vmap(bilinear_sample)(img, x, y)


def _interp_matrix(dtype, in_size: int, out_size: int) -> jnp.ndarray:
    """Dense (out_size, in_size) align-corners linear interpolation matrix."""
    if out_size == 1:
        scale = 0.0
    else:
        scale = (in_size - 1) / (out_size - 1)
    pos = jnp.arange(out_size, dtype=jnp.float32) * scale
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(in_size - 2, 0))
    frac = pos - lo.astype(jnp.float32)
    if in_size == 1:
        return jnp.ones((out_size, 1), dtype)
    cols = jnp.arange(in_size, dtype=jnp.int32)
    mat = jnp.where(cols[None, :] == lo[:, None], 1.0 - frac[:, None], 0.0)
    mat = jnp.where(cols[None, :] == (lo + 1)[:, None], frac[:, None], mat)
    return mat.astype(dtype)


def resize_linear_1d(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Align-corners linear resize along one axis via a dense matmul."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    mat = _interp_matrix(x.dtype, in_size, out_size)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.matmul(moved, mat.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """(..., H, W, C) -> (..., out_h, out_w, C), align_corners=True bilinear.

    One einsum over both interpolation matrices: XLA chooses contraction
    order and layouts itself, which measures 2.5x faster than the explicit
    moveaxis+matmul chain at FPN shapes (3.6 -> 1.4 ms for the 256x320x64
    -> 512x640 five-view upsample).
    """
    h, w = x.shape[-3], x.shape[-2]
    if h == out_h and w == out_w:
        return x
    mh = _interp_matrix(x.dtype, h, out_h)
    mw = _interp_matrix(x.dtype, w, out_w)
    return jnp.einsum(
        "...hwc,Hh,Ww->...HWc", x, mh, mw,
        precision=jax.lax.Precision.HIGHEST,
    )


def resize_trilinear_align_corners(
    x: jnp.ndarray, out_d: int, out_h: int, out_w: int
) -> jnp.ndarray:
    """(..., D, H, W) -> (..., out_d, out_h, out_w), align_corners trilinear.

    Operates on the trailing three axes (no channel axis), which is how the
    reference upsamples depth-hypothesis volumes (mvs4net_utils.py:85,98).
    """
    d, h, w = x.shape[-3], x.shape[-2], x.shape[-1]
    md = _interp_matrix(x.dtype, d, out_d)
    mh = _interp_matrix(x.dtype, h, out_h)
    mw = _interp_matrix(x.dtype, w, out_w)
    return jnp.einsum(
        "...dhw,Dd,Hh,Ww->...DHW", x, md, mh, mw,
        precision=jax.lax.Precision.HIGHEST,
    )


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., 2H, 2W, C) nearest (pixel replication).

    Equivalent to `F.interpolate(scale_factor=2, mode='nearest')`.
    """
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(..., H, W, C) -> (..., fH, fW, C) nearest (pixel replication)."""
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)


def max_pool2d(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """(..., H, W, C) max pool, VALID padding (matches F.max_pool2d padding=0)."""
    ndim = x.ndim
    dims = [1] * ndim
    strides = [1] * ndim
    dims[-3] = dims[-2] = window
    strides[-3] = strides[-2] = stride
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, tuple(dims), tuple(strides), "VALID"
    )
