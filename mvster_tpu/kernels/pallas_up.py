"""Pallas TPU kernel: align-corners 2x upsample along W for NHWC features.

Why a kernel: the FPN top-down pathway (nn/fpn.py, reference FPN4 at
/root/reference/models/mvs4net_utils.py:419-502) doubles H and W of a
64-channel feature three times per forward.  The H-axis interleave is
layout-free for NHWC (the (h,2)->2h reshape leaves the minor (w,c) dims
untouched), but the W-axis interleave shuffles the second-minor dim, which
XLA lowers as a tiled relayout running at ~30 GB/s effective — measured
34.6 ms for the /2->/1 64ch upsample at raw DTU size (probe_fpn_layers,
BENCHNOTES round 4) against a ~1.5 ms bandwidth floor.

The kernel dodges every relayout by viewing the array as (rows, w*C) flat
lanes — a free reshape on both ends:

  * one output column pair (2j, 2j+1) occupies 2*C consecutive flat lanes
    and reads input columns j-1, j, j+1 (the 3-tap align-corners stencil of
    core/sampling._stencil2x_weights, weights position-dependent because
    align-corners 2x is not shift-invariant);
  * an output block of 2*IB lanes therefore reads the matching IB-lane
    input block plus one column of halo each side.  Pallas BlockSpecs can't
    express halos, so the input is passed THREE times with column-shifted,
    edge-clamped index maps;
  * inside the kernel the taps are STATIC lane-segment slices of the
    concatenated (halo | block | halo) tile — Mosaic lowers them as vreg
    shuffles in VMEM, no gathers, no HBM relayout;
  * tap weights arrive as three precomputed (1, 2*w*C) lane vectors
    (np.repeat of the per-output-column stencil weights over C), so the
    multiply-add is pure VPU work.  Edge-clamped halo blocks read garbage
    that always carries weight 0: _stencil2x_weights guarantees cm[o] = 0
    for o < 2 and cp[o] = 0 for o >= 2w-2.

Numerics match core/sampling._upsample2x_align_corners_axis exactly (same
f32 tap weights, same multiply-add order), so routing between this kernel
and the XLA stencil never changes results beyond f32 associativity of the
surrounding fusion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
IB = 256          # input block width in flat lanes (2 vregs)
ROWS = 64         # rows per block (B*h flattened; padded to a multiple)


def _interpret_forced() -> bool:
    try:
        from jax._src import config as _jax_config

        return (
            _jax_config.pallas_tpu_interpret_mode_context_manager.value
            is not None
        )
    except Exception:
        return False


def up2w_supported(x: jnp.ndarray) -> bool:
    """Static guard: (B, h, w, C) f32 with C in {32, 64, 128} and w*C
    divisible by the input block (the static-slice construction emits
    3 * 2*IB/C slices per block — bounded only for C >= 32)."""
    if x.ndim != 4 or x.dtype != jnp.float32:
        return False
    _, h, w, c = x.shape
    if c not in (32, 64, 128) or (w * c) % IB:
        return False
    if jax.devices()[0].platform != "tpu" and not _interpret_forced():
        return False
    return True


def _up2w_kernel(wm_ref, w0_ref, wp_ref, left_ref, mid_ref, right_ref,
                 out_ref, *, c):
    """One (ROWS, 2*IB) output block from (ROWS, IB) input + column halos."""
    cb = IB // c                     # input columns per block
    cat = jnp.concatenate(
        [left_ref[:, IB - c:], mid_ref[...], right_ref[:, :c]], axis=-1
    )                                # (ROWS, IB + 2c): columns -1 .. cb

    def tap(b):
        # output local column u reads input local column 1 + u//2 + b
        segs = [
            cat[:, (1 + u // 2 + b) * c:(2 + u // 2 + b) * c]
            for u in range(2 * cb)
        ]
        return jnp.concatenate(segs, axis=-1)   # (ROWS, 2*IB)

    out_ref[...] = (
        wm_ref[...] * tap(-1) + w0_ref[...] * tap(0) + wp_ref[...] * tap(1)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _up2w_call(x, wm, w0, wp, *, interpret=False):
    b, h, w, c = x.shape
    rows = b * h
    rp = -(-rows // ROWS) * ROWS
    xf = x.reshape(rows, w * c)
    if rp != rows:
        xf = jnp.pad(xf, ((0, rp - rows), (0, 0)))
    nc = (w * c) // IB
    nr = rp // ROWS

    def im(shift):
        return lambda r, j: (r, jnp.clip(j + shift, 0, nc - 1))

    out = pl.pallas_call(
        functools.partial(_up2w_kernel, c=c),
        grid=(nr, nc),
        in_specs=[
            pl.BlockSpec((1, 2 * IB), lambda r, j: (0, j)),
            pl.BlockSpec((1, 2 * IB), lambda r, j: (0, j)),
            pl.BlockSpec((1, 2 * IB), lambda r, j: (0, j)),
            pl.BlockSpec((ROWS, IB), im(-1)),
            pl.BlockSpec((ROWS, IB), im(0)),
            pl.BlockSpec((ROWS, IB), im(1)),
        ],
        out_specs=pl.BlockSpec((ROWS, 2 * IB), lambda r, j: (r, j)),
        out_shape=jax.ShapeDtypeStruct((rp, 2 * w * c), x.dtype),
        interpret=interpret,
    )(wm, w0, wp, xf, xf, xf)
    return out[:rows].reshape(b, h, 2 * w, c)


def up2w_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, C) -> (B, h, 2w, C) align-corners 2x along W.

    Caller must have checked up2w_supported(x)."""
    from mvster_tpu.core.sampling import _stencil2x_weights

    _, _, w, c = x.shape
    cm, c0, cp = _stencil2x_weights(w)
    wm = jnp.asarray(np.repeat(cm, c)[None, :])
    w0 = jnp.asarray(np.repeat(c0, c)[None, :])
    wp = jnp.asarray(np.repeat(cp, c)[None, :])
    return _up2w_call(x, wm, w0, wp, interpret=_interpret_forced())
