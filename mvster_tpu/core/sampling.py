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


def _stencil2x_weights(n: int):
    """Per-output tap weights for an align-corners 2x upsample (n -> 2n).

    With out = 2n, every output index i reads inputs lo_i and lo_i+1 where
    lo_i ∈ {i//2 - 1, i//2} (because i*scale = i/2 - i/(2(2n-1)) and the
    deficit stays below 1/2 for i < 2n).  So on the nearest-2x-repeated
    tensor xr (xr[i] = x[i//2]) the resize is a 3-tap stencil at offsets
    {-2, 0, +2}:   out[i] = cm[i]*xr[i-2] + c0[i]*xr[i] + cp[i]*xr[i+2].
    cm is zero for i<2 and cp zero for i>=2n-2, so cyclic rolls are safe.

    The arithmetic replicates `_interp_matrix`'s f32 ops exactly (same
    pos/lo/frac values), so the stencil output matches the einsum path
    bitwise per tap.  Returns numpy float32 arrays (cm, c0, cp) of shape
    (2n,), computed at trace time (static shapes).
    """
    import numpy as np

    out = 2 * n
    scale = (n - 1) / (out - 1) if out > 1 else 0.0
    pos = (np.arange(out, dtype=np.float32) * np.float32(scale)).astype(np.float32)
    lo = np.clip(np.floor(pos).astype(np.int32), 0, max(n - 2, 0))
    frac = (pos - lo.astype(np.float32)).astype(np.float32)
    half = np.arange(out, dtype=np.int32) // 2
    one = np.float32(1.0)
    cm = np.where(lo == half - 1, one - frac, np.float32(0.0))
    c0 = np.where(lo == half, one - frac, np.float32(0.0)) + np.where(
        lo + 1 == half, frac, np.float32(0.0)
    )
    cp = np.where(lo + 1 == half + 1, frac, np.float32(0.0))
    return cm, c0, cp


def _upsample2x_align_corners_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Align-corners 2x upsample along one axis as a fusable VPU stencil.

    Replaces the dense interpolation-matrix einsum for the exact-2x case:
    the einsum is a skinny 2-nonzeros-per-row matmul the MXU runs at <1%
    utilization (measured 50.9 ms for FPN's /2->/1 64-channel upsample at
    1152x1600 — ~50x off bandwidth speed-of-light).  Formulated on the
    ORIGINAL tensor: both output parities read x[i-1], x[i], x[i+1] (the
    taps of _stencil2x_weights regrouped by i//2), so the upsample is two
    3-tap weighted sums over edge-padded shifted slices, interleaved by a
    stack+reshape — one fused elementwise pass, no repeat/roll buffers
    (the first cut used repeat + rolls on the doubled tensor and measured
    SLOWER than the einsum at mid sizes).  Runs in x.dtype like the
    surrounding compute.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    cm, c0, cp = _stencil2x_weights(n)
    # out[2i + t] = cm[2i+t]*x[i-1] + c0[2i+t]*x[i] + cp[2i+t]*x[i+1]
    # (xr[j] = x[j//2], so taps at xr offsets {-2, 0, +2} are x[i-1+{0,1,2}])
    shape = [1] * x.ndim
    shape[axis] = n

    def as_w(a):
        return jnp.asarray(a.reshape(shape), x.dtype)

    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    body_m = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
    body_p = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    x_m1 = jnp.concatenate([first, body_m], axis=axis)   # x[i-1], edge pad
    x_p1 = jnp.concatenate([body_p, last], axis=axis)    # x[i+1], edge pad
    even = as_w(cm[0::2]) * x_m1 + as_w(c0[0::2]) * x + as_w(cp[0::2]) * x_p1
    odd = as_w(cm[1::2]) * x_m1 + as_w(c0[1::2]) * x + as_w(cp[1::2]) * x_p1
    out = jnp.stack([even, odd], axis=axis + 1)
    newshape = list(x.shape)
    newshape[axis] = 2 * n
    return out.reshape(newshape)


def resize_linear_1d(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Align-corners linear resize along one axis (stencil if 2x, else matmul)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 2 * in_size:
        return _upsample2x_align_corners_axis(x, axis)
    mat = _interp_matrix(x.dtype, in_size, out_size)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.matmul(moved, mat.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, axis)


# Exact-2x bilinear upsample routing: einsum EVERYWHERE.  The W-then-H
# stencil wins isolated at 576x800 inputs (probe_up.py: 30.26 vs einsum
# 48.17 ms) but LOSES in the compiled model at the same shape — routing it
# in FPN's /2->/1 regressed the raw f32 FPN block 143.0 -> 171.8 ms and the
# raw bf16 block 139.9 -> 168.2 (bench_components, TPU v5e, 2026-08-19
# r4e/r4f windows): XLA fuses the elementwise stencil chain into the
# consumer convs and the fused subgraph rematerializes the interpolation
# (the einsum is a dot — materialized once, never fused into a conv input).
# Same isolated-win/in-model-loss inversion as the s2d conv rewrite
# (BENCHNOTES.md); an optimization_barrier did not recover it (r4e FPN
# barrier A/B).  The stencil stays available for measurement via this
# threshold (probes monkeypatch it); infinity = never routed in production.
_STENCIL2X_MIN_PIXELS = float("inf")


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """(..., H, W, C) -> (..., out_h, out_w, C), align_corners=True bilinear.

    Exact-2x resizes (the FPN top-down pathway, mvs4net_utils.py:419-502)
    run the dense-matrix einsum at every production shape: it wins the
    isolated A/B up to 288x400 inputs (probe_up.py: raw /4->/2 einsum
    8.58 ms vs stencil 8.86/10.71) and, although the W-then-H stencil wins
    isolated at 576x800 (30.26 vs 48.17 ms), routing the stencil there
    regressed the whole FPN block in-model (raw f32 143.0 -> 171.8 ms —
    see _STENCIL2X_MIN_PIXELS above).  A Pallas lane kernel for the W
    interleave measured SLOWER everywhere (raw /2->/1: 76.66 ms) and was
    deleted — the interleave is bandwidth-bound and the kernel forced an
    extra relayout at its block boundary.
    """
    h, w = x.shape[-3], x.shape[-2]
    if h == out_h and w == out_w:
        return x
    if out_h == 2 * h and out_w == 2 * w and h * w >= _STENCIL2X_MIN_PIXELS:
        # W axis first, while the tensor is h (not 2h) rows tall: the W
        # interleave is the expensive half (it shuffles the second-minor
        # dim); measured st_wh 30.26 vs st_hw 33.95 ms at raw /2->/1.
        x = _upsample2x_align_corners_axis(x, -2)
        return _upsample2x_align_corners_axis(x, -3)
    mh = _interp_matrix(x.dtype, h, out_h)
    mw = _interp_matrix(x.dtype, w, out_w)
    return jnp.einsum(
        "...hwc,Hh,Ww->...HWc", x, mh, mw,
        precision=jax.lax.Precision.HIGHEST,
    )


# The hypothesis-schedule (trilinear) 2x path is gated separately from the
# bilinear _STENCIL2X_MIN_PIXELS: the hypothesis volume (B, D, H, W) has W
# on the MINOR (lane) axis — a different interleave than the NHWC feature
# case that regressed in-model — and its consumer is elementwise cost-
# volume coords, not a conv XLA could fuse badly into.  Measured in the
# real consumer (scripts/probe_tri_up.py: schedule_inverse_range at every
# cascade transition, chained protocol, v5e 2026-08-19 r5b window):
# stencil 0.26 ms cascade total vs einsum 1.03 ms at raw — stencil stays
# routed.  Probes monkeypatch this to force the einsum arm.
_TRI_STENCIL2X = True


def resize_trilinear_align_corners(
    x: jnp.ndarray, out_d: int, out_h: int, out_w: int
) -> jnp.ndarray:
    """(..., D, H, W) -> (..., out_d, out_h, out_w), align_corners trilinear.

    Operates on the trailing three axes (no channel axis), which is how the
    reference upsamples depth-hypothesis volumes (mvs4net_utils.py:85,98).
    The cascade's hypothesis upsample doubles H and W each stage; those
    axes take the 2x stencil path (gated by _TRI_STENCIL2X above), with the
    depth axis resized by matmul only when it actually changes.
    """
    d, h, w = x.shape[-3], x.shape[-2], x.shape[-1]
    if out_h == 2 * h and out_w == 2 * w and _TRI_STENCIL2X:
        x = resize_linear_1d(x, out_d, axis=-3)
        x = _upsample2x_align_corners_axis(x, -2)
        return _upsample2x_align_corners_axis(x, -1)
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
