"""Pallas TPU kernel: the plane-sweep warp BACKWARD (bilinear scatter-add).

Training differentiates the cost volume w.r.t. source-view features; the
VJP of the bilinear gather is a 4-tap scatter-add, which XLA lowers to a
near-serial scatter on TPU — measured ~580 ms for ONE view-stage of the
DTU-mid batch-2 train step (vs 74 ms for its forward gather), making the
backward ~5x the forward and dominating the 2.86 s train step.

This kernel computes dL/dsrc for one source view by mirroring the forward
warp kernel's window structure (kernels/pallas_warp.py) in the transpose
direction:

  * Grid over (batch, SOURCE band of B2 rows, output 128-lane block); the
    out block (the band's dsrc rows x full padded width) stays in VMEM
    across the j-sweep and accumulates contributions from every output
    block (Pallas revisiting-output pattern).
  * Per (depth, band, block), XLA-computed metadata gives the contiguous
    range of OUTPUT rows whose vertical taps touch the band; their
    cotangent/coordinate rows are DMA'd into VMEM slabs.
  * For each contributing output row, the per-lane x-taps become a
    weighted one-hot matrix Mx (output-lane x target-column), built from a
    TRANSPOSED x-coordinate slab so the per-lane values sit on sublanes
    (Mosaic cannot transpose in-kernel cheaply; XLA pre-transposes).
    The scatter across lanes is then one MXU matmul per scanned source
    row: dsrc_rows += (cot_row * row_mask) @ Mx — no lane-scatter op,
    which Mosaic does not have, is ever needed.  At C<=8 stages
    (b2 * cp <= _BAND_MM_ROWS = 128) the source-row loop itself folds
    into the matmul: one (b2*cp, LANE) @ (LANE, nk*LANE) product per
    output row computes EVERY band row's contribution at full MXU row
    utilization, replacing scnt serialized 6%-utilization matmuls and
    their per-row dynamic read-modify-writes.
  * Row masks replicate the forward's exact per-tap validity and weights,
    so the kernel is the exact mathematical transpose of the forward
    gather (accumulation order differs from XLA's scatter, so gradients
    match to f32 tolerance, not bitwise).

Used via `grid_sample_zeros_vjp` — a custom-vjp wrapper selected by the
training path, with a runtime `lax.cond` fallback to the XLA scatter when
the geometry exceeds the static windows.  Coordinates receive ZERO
cotangents: in MVSTER training they are functions of stop_gradient'ed
hypotheses and constant projections (train_mvs4.py's cascade detaches
inter-stage depths), so no gradient flows through them; the wrapper is
not a general-purpose differentiable sampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvster_tpu.kernels.pallas_warp import (
    LANE,
    PADX,
    _band_rows,
    _interpret_forced,
    _nk,
)

_BIAS = 4096
# Band-matmul row budget: when b2 * cp fits the MXU's 128 rows, the
# backward folds its source-row loop into one full-utilization matmul
# per output row (see _scatter_kernel).  128 selects exactly the C<=8
# stages (raw/mid stage 4) where the per-row matmul wastes 94% of the
# array; wider stages keep the tight scnt-bounded scan, whose MAC count
# is b2/scnt (~5x) lower.
_BAND_MM_ROWS = 128
# Output rows stacked per band-matmul trip.  The per-row trip is
# latency-bound (measured ~1.9 us/row at mid s4: slice + mask synth +
# one matmul + a 128 KB RMW, all serialized by the fori carry); stacking
# OC rows contracts them in ONE (b2*cp, OC*LANE) @ (OC*LANE, nko*LANE)
# product — identical tap math, OC-fold fewer serialized trips and RMWs.
_OCHUNK = 8


def pallas_scatter_supported(src_shape, dtype) -> bool:
    """Static guard: same platform/dtype/band constraints as the forward."""
    b, h, w, c = src_shape
    if _band_rows(h) == 0 or dtype != jnp.float32:
        return False
    if jax.devices()[0].platform != "tpu" and not _interpret_forced():
        return False
    return True


def _scatter_kernel(rowm_ref, blkm_ref, cot_hbm, x_hbm, y_hbm, out_ref,
                    cot_s, x_s, y_s, sem, *, b2, nk, d, cp, h, w, nxb, nb,
                    ocnt_max, wp):
    b = pl.program_id(0)
    k = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    for d_i in range(d):
        word = blkm_ref[((b * d + d_i) * nb + k) * nxb + j]
        lo = word >> 16
        start = (word >> 8) & 0xFF
        ocnt = word & 0xFF

        @pl.when(ocnt > 0)
        def _process():
            c1 = pltpu.make_async_copy(
                cot_hbm.at[b, d_i, j, pl.ds(lo, ocnt_max)], cot_s, sem)
            c1.start()
            c1.wait()
            c2 = pltpu.make_async_copy(
                x_hbm.at[b, d_i, j, pl.ds(lo, ocnt_max)], x_s, sem)
            c2.start()
            c2.wait()
            c3 = pltpu.make_async_copy(
                y_hbm.at[b, d_i, j, pl.ds(lo, ocnt_max)], y_s, sem)
            c3.start()
            c3.wait()

            cols = jax.lax.broadcasted_iota(
                jnp.int32, (LANE, nk * LANE), 1)
            # lane->sublane transposer: Mosaic has no cheap in-kernel
            # transpose, so a (1, 128) row becomes a (128, 1) column via
            # broadcast * identity + lane reduction
            ident = (
                jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
            ).astype(jnp.float32)

            def _mx_for(xrow, base, colsi):
                """Weighted x-tap one-hot for one output row: (LANE,
                ncols) matrix mapping output lanes to window columns
                relative to `base` (colsi: matching column iota)."""
                xt = jnp.sum(
                    jnp.broadcast_to(xrow, (LANE, LANE)) * ident,
                    axis=1, keepdims=True,
                )  # per-lane x values moved onto sublanes: (128, 1)
                x0f = jnp.floor(xt)
                wx = xt - x0f
                x0i = x0f.astype(jnp.int32)
                vx0 = ((x0i >= 0) & (x0i < w)).astype(jnp.float32)
                vx1 = ((x0i + 1 >= 0) & (x0i + 1 < w)).astype(jnp.float32)
                rx0 = x0i + PADX - base
                return (colsi == rx0) * ((1.0 - wx) * vx0) + (
                    colsi == rx0 + 1
                ) * (wx * vx1)

            def _yw_for(yrow):
                """Per-lane vertical tap weights for one output row:
                (w_y0, w_y1, y0i), each (1, LANE)."""
                y0f = jnp.floor(yrow)
                wy = yrow - y0f
                y0i = y0f.astype(jnp.int32)
                vy0 = ((y0i >= 0) & (y0i < h)).astype(jnp.float32)
                vy1 = ((y0i + 1 >= 0) & (y0i + 1 < h)).astype(jnp.float32)
                return (1.0 - wy) * vy0, wy * vy1, y0i

            if b2 * cp <= _BAND_MM_ROWS:
                # band-matmul: fold BOTH the source-row loop and _OCHUNK
                # output rows into one MXU product.  The per-source-row
                # matmul of the scan branch runs (cp, LANE) rows through
                # the systolic array — 8/128 = 6% row utilization at the
                # C=8 stage-4 shapes that dominate the train backward —
                # and pays a serialized fori trip + dynamic RMW per source
                # row.  When the WHOLE band fits the MXU's 128 rows, the
                # y-tap band mask ym selects exactly the taps the scan
                # would visit (rows outside [src_lo, src_lo+scnt) match no
                # tap and add zero), so every band row's contribution is
                # one matmul row; stacking _OCHUNK output rows along the
                # contraction axis then collapses the remaining per-row
                # trips: (b2*cp, OC*LANE) @ (OC*LANE, nko*LANE), one RMW
                # per chunk.  Rows of one chunk share a window of nko =
                # nk+1 lane-blocks based at their min xb; the rare chunk
                # whose rows spread wider falls back to per-row matmuls.
                nko = min(nk + 1, wp // LANE)
                colso = jax.lax.broadcasted_iota(
                    jnp.int32, (LANE, nko * LANE), 1)
                srow = k * b2 + jax.lax.broadcasted_iota(
                    jnp.int32, (b2, LANE), 0
                )

                def _band_ym(yrow):
                    w_y0, w_y1, y0i = _yw_for(yrow)
                    return (y0i == srow).astype(jnp.float32) * w_y0 + (
                        y0i + 1 == srow
                    ).astype(jnp.float32) * w_y1  # (b2, LANE)

                def chunk_body(t, _):
                    obase = start + t * _OCHUNK
                    # slab slice start: clamped so the OC-row window fits
                    # the slab; rows below obase (already done by earlier
                    # trips) and at/after start+ocnt are masked invalid
                    sc = jnp.clip(
                        jnp.minimum(obase, start + ocnt - _OCHUNK),
                        0, ocnt_max - _OCHUNK,
                    )
                    valid, xbr = [], []
                    for r in range(_OCHUNK):
                        vr = (sc + r >= obase) & (sc + r < start + ocnt)
                        rw = rowm_ref[
                            ((b * d + d_i) * h + lo + sc + r) * nxb + j
                        ]
                        valid.append(vr)
                        xbr.append((rw >> 22) * LANE)
                    big = jnp.int32(2 ** 30)
                    xb_min = functools.reduce(jnp.minimum, [
                        jnp.where(v, x, big) for v, x in zip(valid, xbr)
                    ])
                    xb_max = functools.reduce(jnp.maximum, [
                        jnp.where(v, x, -1) for v, x in zip(valid, xbr)
                    ])
                    xcb = pl.multiple_of(
                        jnp.clip(xb_min, 0, wp - nko * LANE), LANE
                    )

                    cot8 = cot_s[pl.ds(sc, _OCHUNK)]  # (OC, cp, LANE)
                    x8 = x_s[pl.ds(sc, _OCHUNK), :]   # (OC, LANE)
                    y8 = y_s[pl.ds(sc, _OCHUNK), :]   # (OC, LANE)

                    @pl.when(xb_max - xb_min <= (nko - nk) * LANE)
                    def _fast():
                        v_parts, m_parts = [], []
                        for r in range(_OCHUNK):
                            ym = _band_ym(y8[r:r + 1, :]) * valid[
                                r
                            ].astype(jnp.float32)
                            v_parts.append(
                                (ym[:, None, :] * cot8[r][None, :, :])
                                .reshape(b2 * cp, LANE)
                            )
                            m_parts.append(
                                _mx_for(x8[r:r + 1, :], xcb, colso)
                            )
                        seg = jax.lax.dot_general(
                            jnp.concatenate(v_parts, axis=1),
                            jnp.concatenate(m_parts, axis=0),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # (b2*cp, nko*LANE)
                        cur = out_ref[
                            0, pl.ds(0, b2), :, pl.ds(xcb, nko * LANE)
                        ].reshape(b2 * cp, nko * LANE)
                        out_ref[
                            0, pl.ds(0, b2), :, pl.ds(xcb, nko * LANE)
                        ] = (cur + seg).reshape(b2, cp, nko * LANE)

                    @pl.when(xb_max - xb_min > (nko - nk) * LANE)
                    def _slow():
                        for r in range(_OCHUNK):
                            @pl.when(valid[r])
                            def _row(r=r):
                                xc = pl.multiple_of(xbr[r], LANE)
                                v = (
                                    _band_ym(y8[r:r + 1, :])[:, None, :]
                                    * cot8[r][None, :, :]
                                ).reshape(b2 * cp, LANE)
                                seg = jax.lax.dot_general(
                                    v, _mx_for(x8[r:r + 1, :], xc, cols),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST,
                                )  # (b2*cp, nk*LANE)
                                cur = out_ref[
                                    0, pl.ds(0, b2), :,
                                    pl.ds(xc, nk * LANE),
                                ].reshape(b2 * cp, nk * LANE)
                                out_ref[
                                    0, pl.ds(0, b2), :,
                                    pl.ds(xc, nk * LANE),
                                ] = (cur + seg).reshape(b2, cp, nk * LANE)

                    return 0

                jax.lax.fori_loop(
                    0, (ocnt + _OCHUNK - 1) // _OCHUNK, chunk_body, 0
                )
                return

            def o_body(oi, _):
                orow = start + oi          # slab-relative output row
                or_abs = lo + orow
                rw = rowm_ref[((b * d + d_i) * h + or_abs) * nxb + j]
                xb = (rw >> 22) * LANE
                src_lo = ((rw >> 8) & 0x3FFF) - _BIAS
                scnt = rw & 0xFF

                mx = _mx_for(x_s[pl.ds(orow, 1), :], xb, cols)
                w_y0, w_y1, y0i = _yw_for(y_s[pl.ds(orow, 1), :])
                cot_row = cot_s[pl.ds(orow, 1)].reshape(cp, LANE)

                def s_body(r, _):
                    sr_abs = src_lo + r
                    sr_loc = sr_abs - k * b2

                    @pl.when((sr_loc >= 0) & (sr_loc < b2))
                    def _add():
                        m0 = (y0i == sr_abs).astype(jnp.float32)
                        m1 = (y0i + 1 == sr_abs).astype(jnp.float32)
                        v = cot_row * (m0 * w_y0 + m1 * w_y1)  # (cp, LANE)
                        seg = jax.lax.dot_general(
                            v, mx, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )  # (cp, nk*LANE); HIGHEST: the MXU's default
                        # bf16 passes cost ~1e-3 relative error on grads
                        sl = jnp.clip(sr_loc, 0, b2 - 1)
                        xc = pl.multiple_of(xb, LANE)
                        cur = out_ref[
                            0, pl.ds(sl, 1), :, pl.ds(xc, nk * LANE)
                        ].reshape(cp, nk * LANE)
                        out_ref[
                            0, pl.ds(sl, 1), :, pl.ds(xc, nk * LANE)
                        ] = (cur + seg).reshape(1, cp, nk * LANE)

                    return 0

                jax.lax.fori_loop(0, scnt, s_body, 0)
                return 0

            jax.lax.fori_loop(0, ocnt, o_body, 0)


def scatter_meta(x, y, h, w, b2, nk, wp, ocnt_max):
    """Backward-kernel metadata from (B, D, H, NXB*LANE) lane-padded coords.

    Returns (rowm, blkm, pred): per-output-row words
    xb/128 << 22 | (src_lo + _BIAS) << 8 | scnt, per-(depth, src-band,
    out-block) words dma_lo << 16 | start << 8 | ocnt, and the
    feasibility predicate.
    """
    b, d, _, wc = x.shape
    nxb = wc // LANE
    nb = h // b2

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    rel = (x > -1) & (x < w) & (y > -1) & (y < h)

    def blk(v):  # (B, D, H, WC) -> (B, D, H, NXB, LANE)
        return v.reshape(b, d, h, nxb, LANE)

    inf = jnp.float32(jnp.inf)
    rel_b, x_b, y_b = blk(rel), blk(x0f), blk(y0f)
    ymin = jnp.min(jnp.where(rel_b, y_b, inf), axis=4)   # (B, D, H, NXB)
    ymax = jnp.max(jnp.where(rel_b, y_b, -inf), axis=4)
    xmin = jnp.min(jnp.where(rel_b, x_b, inf), axis=4)
    xmax = jnp.max(jnp.where(rel_b, x_b + 1, -inf), axis=4)
    any_rel = jnp.any(rel_b, axis=4)

    src_lo = jnp.where(any_rel, ymin, 0.0).astype(jnp.int32)
    scnt = jnp.where(any_rel, ymax - ymin + 2.0, 0.0).astype(jnp.int32)
    xbase = jnp.clip(
        jnp.floor((jnp.where(any_rel, xmin, 0.0) + PADX) / LANE) * LANE,
        0.0, wp - nk * LANE,
    ).astype(jnp.int32)

    ok_x = (xmax + PADX - xbase.astype(jnp.float32) < nk * LANE) & (
        xmin + PADX >= xbase.astype(jnp.float32)
    )
    ok_row = scnt <= 255
    pred_rows = jnp.all(jnp.where(any_rel, ok_x & ok_row, True))

    src_lo_c = jnp.clip(src_lo, -_BIAS, 0x3FFF - _BIAS)
    rowm = ((xbase // LANE) << 22) | ((src_lo_c + _BIAS) << 8) | jnp.clip(
        scnt, 0, 255
    )  # (B, D, H, NXB)

    # per (band, block): contiguous range of output rows touching the band
    kb = jnp.arange(nb, dtype=jnp.int32) * b2  # band start rows
    touch = (
        (scnt[:, :, :, None, :] > 0)
        & (src_lo[:, :, :, None, :] < (kb + b2)[None, None, None, :, None])
        & ((src_lo + scnt)[:, :, :, None, :] > kb[None, None, None, :, None])
    )  # (B, D, H, NB, NXB)
    orr = jnp.arange(h, dtype=jnp.int32)[None, None, :, None, None]
    big = jnp.int32(h + ocnt_max)
    obase = jnp.min(jnp.where(touch, orr, big), axis=2)  # (B, D, NB, NXB)
    oend = jnp.max(jnp.where(touch, orr, -1), axis=2)
    has = oend >= 0
    ocnt = jnp.where(has, oend - obase + 1, 0)
    pred_blk = jnp.all(ocnt <= ocnt_max)

    lo_dma = jnp.clip(jnp.where(has, obase, 0), 0, max(h - ocnt_max, 0))
    start = jnp.where(has, obase, 0) - lo_dma
    blkm = (lo_dma << 16) | (start << 8) | ocnt  # (B, D, NB, NXB)

    return rowm, blkm, pred_rows & pred_blk


def scatter_grad_pallas(cot, x, y, src_shape, *, interpret=False):
    """dL/dsrc for the plane-sweep bilinear gather (zeros padding,
    align_corners).  cot: (B, D, H, W, C) cotangent of the warped tensor;
    x/y: (B, D, H, W) source coordinates; returns (B, H, W, C)."""
    b, h, w, c = src_shape
    d = x.shape[1]
    b2 = _band_rows(h)
    assert b2, f"height {h} not divisible by 8"
    nb = h // b2
    nxb = -(-w // LANE)
    wc = nxb * LANE
    wp = wc + 2 * PADX
    cp = -(-c // 8) * 8
    nk = min(_nk(cp), wp // LANE)
    ocnt_max = min(h, 128)

    # lane padding: cot must pad with ZEROS (edge-padded coords then add 0)
    xc = jnp.pad(x, ((0, 0),) * 3 + ((0, wc - w),), mode="edge")
    yc = jnp.pad(y, ((0, 0),) * 3 + ((0, wc - w),), mode="edge")
    cot_p = jnp.pad(
        cot, ((0, 0),) * 2 + ((0, 0), (0, wc - w), (0, cp - c))
    )  # (B, D, H, WC, CP)

    rowm, blkm, pred = scatter_meta(xc, yc, h, w, b2, nk, wp, ocnt_max)
    rowm = rowm.reshape(-1)
    blkm = blkm.reshape(-1)

    # kernel-friendly layouts: cot (B, D, NXB, H, CP, LANE);
    # x and y lane-blocked (B, D, NXB, H, LANE)
    cot_b = jnp.transpose(
        cot_p.reshape(b, d, h, nxb, LANE, cp), (0, 1, 3, 2, 5, 4)
    )
    xt = jnp.transpose(xc.reshape(b, d, h, nxb, LANE), (0, 1, 3, 2, 4))
    yb = jnp.transpose(yc.reshape(b, d, h, nxb, LANE), (0, 1, 3, 2, 4))

    def kernel_path(_):
        kernel = functools.partial(
            _scatter_kernel, b2=b2, nk=nk, d=d, cp=cp, h=h, w=w, nxb=nxb,
            nb=nb, ocnt_max=ocnt_max, wp=wp,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nb, nxb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # cot (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # xT (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # y (HBM)
            ],
            out_specs=pl.BlockSpec(
                (1, b2, cp, wp),
                lambda bb, kk, jj, *_: (bb, kk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((ocnt_max, cp, LANE), jnp.float32),
                pltpu.VMEM((ocnt_max, LANE), jnp.float32),
                pltpu.VMEM((ocnt_max, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, cp, wp), jnp.float32),
            interpret=interpret,
        )(rowm, blkm, cot_b, xt, yb)
        return jnp.transpose(
            out[:, :, :c, PADX:PADX + w], (0, 1, 3, 2)
        )  # (B, H, W, C)

    def xla_path(_):
        from mvster_tpu.core.sampling import grid_sample_zeros

        _, vjp = jax.vjp(
            lambda s: grid_sample_zeros(s, x, y),
            jnp.zeros(src_shape, cot.dtype),
        )
        return vjp(cot)[0]

    return jax.lax.cond(pred, kernel_path, xla_path, operand=None)


def _warp_primal(src, x, y):
    """Forward gather: the Pallas warp-only kernel where supported (bitwise
    equal to grid_sample_zeros — same tap order), XLA otherwise."""
    from mvster_tpu.core.sampling import grid_sample_zeros
    from mvster_tpu.kernels.pallas_warp import (
        pallas_warp_supported,
        warp_pallas,
    )

    if pallas_warp_supported(src) and src.shape[1:3] == x.shape[2:]:
        return warp_pallas(src, x, y)
    return grid_sample_zeros(src, x, y)


@jax.custom_vjp
def grid_sample_zeros_vjp(src, x, y):
    """grid_sample(zeros, align_corners) with Pallas kernels on BOTH sides:
    the forward gather (warp-only kernel) and the source gradient (scatter
    kernel).  TRAINING-PATH op: coordinates receive zero cotangents (in
    MVSTER they are stop_gradient'ed hypothesis functions — see module
    docstring); use core.sampling.grid_sample_zeros when coordinate
    gradients are needed."""
    return _warp_primal(src, x, y)


def _gsv_fwd(src, x, y):
    # src rides along only for its shape/dtype (residuals must be JAX
    # types); its value is dead in the backward and DCE-able
    return _warp_primal(src, x, y), (x, y, src)


def _gsv_bwd(res, cot):
    x, y, src = res
    src_shape, dtype = src.shape, src.dtype
    if pallas_scatter_supported(src_shape, dtype):
        dsrc = scatter_grad_pallas(cot, x, y, src_shape)
    else:
        from mvster_tpu.core.sampling import grid_sample_zeros

        _, vjp = jax.vjp(
            lambda s: grid_sample_zeros(s, x, y), jnp.zeros(src_shape, dtype)
        )
        dsrc = vjp(cot)[0]
    return dsrc, jnp.zeros_like(x), jnp.zeros_like(y)


grid_sample_zeros_vjp.defvjp(_gsv_fwd, _gsv_bwd)
