"""Pallas TPU kernel: fused plane-sweep warp + group correlation.

THE hot op of the pipeline (BASELINE.json north star): for every depth
hypothesis, bilinearly sample the source-view feature map at projectively
warped coordinates and correlate with the reference feature.  The XLA
formulation materializes the warped (B, D, H, W, C) tensor between the gather
and the correlation; this kernel keeps the source and reference feature maps
VMEM-resident (channels on sublanes, pixels on lanes) and performs the 4-tap
gather + sub-channel dot per (batch, hypothesis) grid step, so only the small
(G-channel) correlation volume ever reaches HBM.

STATUS — interpret-validated blueprint, not compilable on current Mosaic:
the TPU gather lowering supports only same-shape `take_along_axis` AND only
single-vreg gather spans ("Not implemented: Multiple source vregs along
gather dimension" — gathers across more than 128 lanes / 8 sublanes do not
lower).  An image warp needs arbitrary-span gathers, so this kernel compiles
only in interpret mode today; semantics are verified against the XLA path in
tests/test_pallas_warp.py.  Measured on the real chip, XLA's native gather
formulation of this op is already dispatch-bound (0.02-0.04 ms per
stage/view at DTU-mid), so the fusion headroom is nil until Mosaic grows
multi-vreg gathers — at which point this kernel is the drop-in.

Zero-padding semantics match grid_sample(padding_mode='zeros',
align_corners=True) exactly (each tap individually masked), i.e. the
reference homo_warping (mvs4net_utils.py:13-59).

Inference-path kernel: the training path keeps the XLA formulation (autodiff
through a scatter-adjoint gather is XLA's job); select with
build_cost_volume(impl="pallas").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# feature maps larger than this per view fall back to XLA (VMEM budget:
# src + ref + intermediates must fit in ~16 MB)
MAX_FEATURE_BYTES = 4 << 20


def _warp_cor_kernel(x_ref, y_ref, src_ref, ref_ref, out_ref, *,
                     group_dim, src_h, src_w):
    c = src_ref.shape[1]
    n = x_ref.shape[-1]
    src = src_ref[0]  # (C, N)
    x = x_ref[0, 0, :]  # (N,)
    y = y_ref[0, 0, :]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    warped = jnp.zeros((c, n), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            valid = (xi >= 0) & (xi < src_w) & (yi >= 0) & (yi < src_h)
            xi = jnp.clip(xi, 0, src_w - 1)
            yi = jnp.clip(yi, 0, src_h - 1)
            flat = jnp.clip(yi * src_w + xi, 0, n - 1)  # (N,)
            wgt = (wy if dy else (1.0 - wy)) * (wx if dx else (1.0 - wx))
            wgt = jnp.where(valid, wgt, 0.0)
            taps = jnp.take_along_axis(
                src, jnp.broadcast_to(flat[None, :], (c, n)), axis=1
            )
            warped = warped + taps * wgt[None, :]

    ref = ref_ref[0]  # (C, N)
    sub = c // group_dim
    prod = (warped * ref).reshape(group_dim, sub, n)
    out_ref[0, :, :] = jnp.mean(prod, axis=1)


@functools.partial(jax.jit, static_argnames=("group_dim", "src_h", "src_w", "d"))
def fused_warp_group_cor(
    x: jnp.ndarray,            # (B*D, 1, N)
    y: jnp.ndarray,            # (B*D, 1, N)
    src_feat_cf: jnp.ndarray,  # (B, C, N)
    ref_feat_cf: jnp.ndarray,  # (B, C, N)
    *, group_dim: int, src_h: int, src_w: int, d: int,
) -> jnp.ndarray:
    """Returns (B*D, G, N) fused correlation."""
    bd, _, n = x.shape
    b, c, _ = src_feat_cf.shape
    grid = (bd,)

    kernel = functools.partial(
        _warp_cor_kernel, group_dim=group_dim, src_h=src_h, src_w=src_w
    )
    vmem_bytes = (2 * c * n + 8 * n + group_dim * n) * 4 + (2 << 20)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda i: (i // d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda i: (i // d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, group_dim, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bd, group_dim, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 100 << 20)
        ),
    )(x, y, src_feat_cf, ref_feat_cf)


def _pad_last(arr, multiple):
    n = arr.shape[-1]
    target = -(-n // multiple) * multiple
    if target == n:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[-1] = (0, target - n)
    return jnp.pad(arr, pad)


def pallas_warp_supported(src_feat: jnp.ndarray) -> bool:
    b, h, w, c = src_feat.shape
    return h * w * c * 4 <= MAX_FEATURE_BYTES


def warp_correlate_pallas(
    src_feat: jnp.ndarray,   # (B, Hs, Ws, C)
    ref_feat: jnp.ndarray,   # (B, H, W, C)
    x: jnp.ndarray,          # (B, D, H, W) source pixel coords
    y: jnp.ndarray,
    group_dim: int,
) -> jnp.ndarray:
    """Convenience wrapper -> (B, D, H, W, G), channels-last like the XLA path.

    Requires src and ref at the same resolution (the MVSTER contract) so the
    gather's operand and index lanes line up; pads N to a 128 multiple (the
    padded coordinate lanes are steered out of bounds so they contribute
    nothing).
    """
    b, hs, ws, c = src_feat.shape
    _, d, h, w = x.shape
    assert (hs, ws) == (h, w), "pallas warp expects matching view resolutions"
    n = h * w

    src_cf = _pad_last(src_feat.reshape(b, n, c).transpose(0, 2, 1), LANE)
    ref_cf = _pad_last(ref_feat.reshape(b, n, c).transpose(0, 2, 1), LANE)
    xf = _pad_last(x.reshape(b * d, 1, n), LANE)
    yf = _pad_last(y.reshape(b * d, 1, n), LANE)

    out = fused_warp_group_cor(
        xf.astype(jnp.float32), yf.astype(jnp.float32),
        src_cf.astype(jnp.float32), ref_cf.astype(jnp.float32),
        group_dim=group_dim, src_h=hs, src_w=ws, d=d,
    )  # (B*D, G, Npad)
    out = out[:, :, :n].reshape(b, d, group_dim, h, w)
    return out.transpose(0, 1, 3, 4, 2)
