"""Pallas TPU kernel: fused plane-sweep warp + group correlation.

THE hot op of the pipeline (BASELINE.json north star): for every depth
hypothesis, bilinearly sample the source-view feature map at projectively
warped coordinates and correlate with the reference feature — the
reference's homo_warping + group-wise correlation
(/root/reference/models/mvs4net_utils.py:13-59, 1036-1040).

Why a kernel at all: XLA lowers the 4-tap bilinear gather to a row-at-a-time
TPU gather running at ~1.6 G taps/s — 20.6 ms for ONE source view at the
512x640 stage-4 shape, ~120 ms of a 168 ms DTU-mid forward (BENCHNOTES.md).
Mosaic's `dynamic_gather` only supports a single source vreg along the
gather dimension (<=128 lanes), so a naive in-kernel `take_along_axis`
across an image row does not compile either ("Not implemented: Multiple
source vregs along gather dimension").  This kernel restructures the warp
so every gather IS a single-vreg gather:

  * The output is tiled into (band of B2 rows) x (128-lane blocks); the
    grid walks (batch, band, block) with the depth loop inside.
  * Source rows for a band (+/- one band of margin) are DMA'd from HBM
    into a VMEM scratch once per band; features are laid out (B, H, C, W)
    so channels sit on sublanes and image columns on lanes.
  * Plane-sweep coordinates are *locally coherent*: within a 128-pixel
    block, floor(y) - row spans a few rows and floor(x) spans ~a window of
    lanes.  Per-(depth, band, block) int32 window bases and trip counts
    are computed in XLA (cheap reduces) and handed to the kernel as
    scalar-prefetch arguments.
  * Inside the window every gather is `take_along_axis` on a (C, 128)
    tile with lane indices clamped to [0, 128) — the supported single-vreg
    form.  Out-of-window taps carry zero weight by construction.
  * The group correlation (mean over C/G sub-channels of warped * ref) is
    fused in-kernel, so the (B, D, H, W, C) warped tensor never exists:
    only the (B, D, G, H, W) correlation reaches HBM.

Zero-padding semantics match grid_sample(padding_mode='zeros',
align_corners=True) exactly: each of the 4 taps is individually masked by
its own in-image validity, and accumulation order (y0x0, y0x1, y1x0, y1x1)
matches core/sampling.bilinear_sample, so agreement with the XLA path is
bitwise up to the sub-channel mean reduction order.

The static window sizes (a parallax-tracking source window of 4-8 bands
DMA'd per band, 3-4x128-lane columns) comfortably hold for plane-sweep
geometry at MVS baselines; a runtime predicate verifies them per call over
the *relevant* (at least partially in-image) pixels and `lax.cond`s to the
XLA formulation when violated, so the kernel is never wrong, only
sometimes bypassed.  Row scans have dynamic trip counts, so wide windows
cost VMEM scratch, not compute.

Inference forwards use the fused form via build_cost_volume(impl="pallas").
Training uses the warp-only output mode (warp_pallas) as the forward
primal of grid_sample_zeros_vjp, paired with the Pallas scatter backward
(kernels/pallas_scatter.py) — coordinates carry no gradient (hypotheses
are stop_gradient'ed), so only the source-feature VJP is needed.

Measured (v5e, f32, batch 1, one source view, chained protocol —
scripts/bench_warp.py, 2026-08-16, the SCAN_R=2-era kernel; max-err vs
XLA <= 5e-7, stage4 bitwise):

    stage               XLA gather   this kernel   speedup
    mid-stage1  64x80      662 us      ~185 us      ~3x (noise-limited)
    mid-stage2  128x160   2618 us       653 us       4.0x
    mid-stage3  256x320   7197 us       885 us       8.1x
    mid-stage4  512x640  20660 us      2709 us       7.6x
    raw-stage1  144x200   6473 us      1100 us       5.9x
    raw-stage2  288x400  27330 us      3513 us       7.8x
    raw-stage3  576x800  57886 us      4530 us      12.8x
    raw-stage4 1152x1600 185293 us    16870 us      11.0x
    per-view total: mid 31.1 -> 4.4 ms (7x), raw 277.0 -> 26.0 ms (10.6x)

NOTE on that table: the synthetic bench coords are near-translational
(scan rcnt ~4-5); REAL cascade geometry at raw stage4 scans rcnt ~5-16
per view and cost 37.1 ms/view on this kernel until the round-5 SCAN_R
rework amortized the latency-bound trip chain — production raw-s4 is now
16.65 ms/view (probe_cv_fused, real geometry), i.e. the production row
matches the old synthetic number with ~2.4x harder scans.  Time is
linear in the scan-row count (BENCHNOTES.md "the latency-bound scan").

On the bench geometry (tests/helpers.synthetic_sample cameras — stronger
rotation than real DTU scans) every stage/view of the mid and raw cascades
satisfies the window predicate (scripts/probe_warp_pred.py), so production
forwards run fully on the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
PADX = 128          # left/right lane margin on the padded source
# scan rows gathered per loop trip: the row scan is latency-bound (a
# serialized slice -> gather -> FMA chain per trip), so wide trips
# amortize it — the per-vreg gather micro-ops inside one
# (SCAN_R*cp, LANE) take_along_axis pipeline, unlike successive trips.
# Rows past a vreg's span are zero-weighted by construction, so the only
# cost of width is wasted gather lanes on small spans.  On-chip A/B at
# raw stage4 (probe_cv_fused, real cascade geometry, 2026-08-19): R=2
# 35.8 ms/view, R=8 16.65 ms/view (2.15x — confirming the scan is
# latency-bound: the earlier pure op-count trim moved it only
# 37.1 -> 35.8).  R=16 is VMEM-infeasible at raw stage1 (C=64: the 15
# spare scratch rows push the scoped allocation to 18.02M > 16M).
SCAN_R = 8
# measurement-only override consulted by _scan_r (scripts/probe_cv_fused.py
# --scan-r sweep); production leaves it None
FORCE_SCAN_R = None
# scratch budget for the source row window (VMEM is ~16 MB/core; the other
# kernel buffers — ref/coords/out blocks, the acc scratch — total < 2 MB).
# Calls whose 2-band minimum window exceeds this fall back to XLA.
MAX_FEATURE_BYTES = 12 << 20

# Geometry-fallback observability: the lax.cond fallback is silent by
# design (numerics never change), but a production forward quietly
# degrading to the 3-12x slower XLA gather must be visible.  The predicate
# is therefore threaded OUT as a model output ("warp_fallbacks" per stage,
# summed by build_cost_volume(with_fallbacks=True)) rather than reported
# via jax.debug.callback — the hosted axon runtime does not support host
# callbacks at all (UNIMPLEMENTED at compile time), and an output scalar
# is free while a callback would cost a device->host sync per call.


def _band_rows(h: int) -> int:
    """Band height: largest of {16, 8} dividing the stage height."""
    if h % 16 == 0:
        return 16
    if h % 8 == 0:
        return 8
    return 0


def _window_bands(cp: int, wp: int, b2: int, nb: int, w: int,
                  scan_r: int = SCAN_R) -> int:
    """Source-window height in bands, from the VMEM budget + a geometry
    envelope.  The row-scan loop has a dynamic trip count, so a wider
    window costs VMEM scratch and band-DMA volume, not compute.

    The window must absorb three y-effects per band (diagnosed on
    converging look-at rigs, tests/test_warp_geometry.py): the IMAGE-WIDE
    epipolar tilt (the per-band DMA shift is shared across the whole row,
    so a tilt slope t costs ~t*w rows — the dominant term at wide
    baselines; ~0.10-0.12*w at a 15-20 degree DTU pair), the band's own
    row drift, and the packed depth spread.  The round-2 fixed tiers
    (8/6/4 bands) made even a 10deg-azimuth + 5deg-elevation DTU rig fall
    back at raw stage 4 — the most expensive stage."""
    # the SCAN_R - 1 zeroed spare rows live in the same scratch buffer —
    # omitting them from the budget OOM'd scoped VMEM at raw stage1
    # (C=64) when SCAN_R grew past the old slack
    budget = (
        MAX_FEATURE_BYTES - (scan_r - 1) * cp * wp * 4
    ) // (b2 * cp * wp * 4)
    tilt = -(-(int(0.15 * w) + 2 * b2 + 32) // b2)
    return max(2, min(nb + 2, budget, tilt))


def _scan_r(d: int, h: int, cp: int, wp: int, b2: int, nb: int,
            w: int) -> int:
    """Per-call scan width.  The row scan is latency-bound, so wider trips
    amortize the serialized slice -> gather -> FMA chain — but a wider trip
    also doubles the gather payload, which only pays off where the scan
    spans are long (raw stage4's wide-baseline views: rcnt mean ~16, vs
    ~5-6 at mid — probe_cv_fused --stats).  The same shape gate as
    _row_pack picks the long-span stages; 16 is used only when its extra
    spare scratch rows leave the window-band budget unchanged (so the
    fallback envelope and supported() feasibility are identical to the
    SCAN_R=8 call)."""
    if FORCE_SCAN_R is not None:
        return FORCE_SCAN_R
    if d == 4 and h >= 1152:
        if _window_bands(cp, wp, b2, nb, w, 16) == _window_bands(
            cp, wp, b2, nb, w, SCAN_R
        ):
            return 16
    return SCAN_R


def _nk(cp: int) -> int:
    """MAX lane-window width in 128-lane vregs (static bound; the kernel
    gathers only each vreg's measured `nkr` windows — mean 1.1-1.3 on MVS
    geometry, scripts/probe_row_pack.py).  With per-vreg aligned window
    bases 3 vregs cover the span for all geometry we've probed; vregs that
    exceed it trip the runtime predicate and fall back to XLA."""
    return 3


def _row_pack(d: int, h: int) -> int:
    """Output rows packed per 128-lane vreg (lanes = rp rows x d depths x
    128/(rp*d) columns) for the FUSED inference layout.

    Packing more rows amortizes the per-scan fixed terms (depth spread +
    bilinear +2) over rp rows and shrinks the epipolar-tilt term by
    narrowing the column group; the cost is the rp-row drift joining the
    span plus deeper per-vreg window metadata.  The scan-work model
    (scripts/probe_row_pack.py) predicted rp=4 wins at the big stages,
    but the ON-CHIP sweep (scripts/bench_components.py --rp-sweep,
    v5e, DTU rig, full cost-volume latency in ms) says predicted scan
    work is not latency:

      raw  stage1 144x200  D8: rp1  6.9 | rp2  9.9
      raw  stage2 288x400  D8: rp1 24.1 | rp2 31.4 | rp4 34.6
      raw  stage3 576x800  D4: rp1 43.0 | rp2 46.8 | rp4 51.7
      raw  stage4 1152x1600 D4: rp1 215.8 | rp2 198.9 | rp4 202.6
      mid  stage4 512x640  D4: rp1 20.2 | rp4 24.3 (judge r3)

    So: rp=1 everywhere except D4 at h>=1152 (raw/eth3d stage4) where
    rp=2's narrower column groups win ~8%.  The band height scales to
    8*rp vreg-rows (Mosaic needs block second-to-last dims divisible by
    8), so h must divide 8*rp."""
    if d <= 0 or LANE % d:
        return 1
    rp = 2 if (d == 4 and h >= 1152) else 1
    while rp > 1 and (LANE % (rp * d) or h % (8 * rp)):
        rp //= 2
    return rp


def _interpret_forced() -> bool:
    """True inside pltpu.force_tpu_interpret_mode() (CPU kernel testing)."""
    try:
        from jax._src import config as _jax_config

        return (
            _jax_config.pallas_tpu_interpret_mode_context_manager.value
            is not None
        )
    except Exception:
        return False


def pallas_warp_supported(src_feat: jnp.ndarray) -> bool:
    """Static guard consulted by build_cost_volume(impl='pallas')."""
    b, h, w, c = src_feat.shape
    b2 = _band_rows(h)
    if b2 == 0 or src_feat.dtype != jnp.float32:
        return False
    if jax.devices()[0].platform != "tpu" and not _interpret_forced():
        return False
    cp = -(-c // 8) * 8
    wp = -(-w // LANE) * LANE + 2 * PADX
    winb = _window_bands(cp, wp, b2, h // b2, w)
    # checked at the default scan width: _scan_r widens to 16 only when
    # the window-band budget is unchanged, which keeps the 16-row scratch
    # under the same MAX_FEATURE_BYTES (see _window_bands' budget term)
    scratch_bytes = (winb * b2 + SCAN_R - 1) * cp * wp * 4
    return scratch_bytes <= MAX_FEATURE_BYTES


def _warp_kernel(row_ref, shift_ref, src_hbm, ref_ref, x_ref,
                 y_ref, out_ref, scratch, acc, sem, *, b2, winb, nk, d,
                 group_dim, sub, h_real, w_real, nb, nxb, nvr,
                 scan_r=SCAN_R, fuse_cor=True):
    SCAN_R = scan_r  # noqa: N806 — per-call scan width (see _scan_r)
    b = pl.program_id(0)
    k = pl.program_id(1)
    j = pl.program_id(2)
    cp = scratch.shape[1]
    # the winb-band source window tracks the vertical parallax: its top row
    # is original row k*b2 + shift (shift pre-clamped in XLA so the padded
    # slice is in bounds)
    shift = shift_ref[b * nb + k]

    @pl.when(j == 0)
    def _fetch_band():
        # the spare rows past the window are read (zero-weighted) by the
        # last trip's overrun rows when pb + rcnt approaches winb*b2;
        # they must hold ZEROS, not stale VMEM (0 * NaN = NaN)
        scratch[winb * b2:winb * b2 + SCAN_R - 1, :, :] = jnp.zeros(
            (SCAN_R - 1, cp, scratch.shape[2]), jnp.float32
        )
        dma = pltpu.make_async_copy(
            src_hbm.at[b, pl.ds(k * b2 + b2 + shift, winb * b2)],
            scratch.at[pl.ds(0, winb * b2)], sem,
        )
        dma.start()
        dma.wait()

    for d_i in range(d):
        # meta is FLAT 1-D: multi-dim SMEM operands are tile-padded (last
        # two dims to (8, 128)), which overflows the 1 MB SMEM at raw-stage4
        # ((1,4,72,13,4) pads to 2.25 MB); flat arrays pad to lanes only.
        blk = ((b * d + d_i) * nb + k) * nxb + j
        rowbase = blk * nvr

        def row_body(i, _):
            # per-output-VREG window, packed nkr << 27 | xb/128 << 22 |
            # pb << 8 | rcnt (window_meta).  Per-vreg granularity keeps the
            # scan count at the vreg's own span, and nkr lets the scan
            # gather only the lane windows this vreg's x-span actually
            # needs (mean 1.1-1.3 of the static 3).
            word = row_ref[rowbase + i]
            nkr = (word >> 27) & 0x7
            xb = pl.multiple_of(((word >> 22) & 0x1F) * LANE, LANE)
            pb = (word >> 8) & 0x3FFF      # first scan row, window coords
            rcnt = word & 0xFF

            def dead(_):
                # fully out-of-image vregs (~14% at raw stage4,
                # probe_cv_fused --stats) skip the weight prep too
                return jnp.zeros((cp, LANE), jnp.float32)

            def alive(_):
                x = x_ref[0, d_i, pl.ds(i, 1), :]          # (1, 128)
                y = y_ref[0, d_i, pl.ds(i, 1), :]
                x0f = jnp.floor(x)
                y0f = jnp.floor(y)
                wx = x - x0f
                wy = y - y0f
                x0i = x0f.astype(jnp.int32)
                y0i = y0f.astype(jnp.int32)
                vx0 = ((x0i >= 0) & (x0i < w_real)).astype(jnp.float32)
                vx1 = ((x0i + 1 >= 0) &
                       (x0i + 1 < w_real)).astype(jnp.float32)
                vy0 = ((y0i >= 0) & (y0i < h_real)).astype(jnp.float32)
                vy1 = ((y0i + 1 >= 0) &
                       (y0i + 1 < h_real)).astype(jnp.float32)
                w_y0 = (1.0 - wy) * vy0
                w_y1 = wy * vy1
                # source row indices relative to the window origin (row 0
                # of the scratch window is original row k*b2 + shift)
                y0_rel = y0i - k * b2 - shift

                rx0 = x0i + PADX - xb  # window-relative x0 tap index
                w_x0 = (1.0 - wx) * vx0
                w_x1 = wx * vx1
                # shared modular gather indices: the tap at window column
                # rx lives in vreg rx >> 7 at lane rx & 127, so one
                # broadcast index per tap serves every unrolled window and
                # membership is a single compare (negative/out-of-window
                # rx yield k_of outside [0, nkr) and drop).  The indices
                # span 2*cp sublanes so ONE gather per tap serves both
                # scan rows of a trip.
                k_of0 = rx0 >> 7
                k_of1 = (rx0 + 1) >> 7
                ixm0 = jnp.broadcast_to(
                    rx0 & (LANE - 1), (SCAN_R * cp, LANE)
                )
                ixm1 = jnp.broadcast_to(
                    (rx0 + 1) & (LANE - 1), (SCAN_R * cp, LANE)
                )

                def variant(nwin):
                    # one statically-unrolled scan loop per lane-window
                    # count; nkr selects a variant below, so a vreg whose
                    # x-span fits one window gathers one (a dynamic
                    # fori_loop over the count measured ~2x SLOWER —
                    # Mosaic lowers per-iteration dynamic lane-slices
                    # poorly).  The per-window masked x-weights are
                    # row-invariant and hoisted out of the scan.
                    u0 = [w_x0 * (k_of0 == k3).astype(jnp.float32)
                          for k3 in range(nwin)]
                    u1 = [w_x1 * (k_of1 == k3).astype(jnp.float32)
                          for k3 in range(nwin)]

                    def r_body(r, acc_w):
                        # SCAN_R adjacent scan rows per trip: ONE slice
                        # and ONE gather per tap over a (SCAN_R*cp, lanes)
                        # tile.  The scan is LATENCY-bound, not
                        # throughput-bound (stripping ~40% of its vector
                        # ops moved raw s4 only 37.1 -> 35.8 ms/view):
                        # each loop trip pays a serialized
                        # slice -> gather -> FMA chain, so amortizing it
                        # over more rows is the lever — the per-vreg
                        # micro-ops inside one wide gather pipeline.
                        # No clip or liveness mask needed: rows
                        # [pb, pb + rcnt) hold the span's data, rows past
                        # it match no y0_rel (rcnt = span + 2), and
                        # overrun rows are either real data
                        # (zero-weighted) or the zeroed spare rows at
                        # winb*b2.
                        row0 = pb + SCAN_R * r
                        tiler = scratch[
                            pl.ds(row0, SCAN_R), :, pl.ds(xb, nwin * LANE)
                        ].reshape(SCAN_R * cp, nwin * LANE)
                        # per-row y-weights: the y1 tap of row t is the
                        # y0 tap of row t+1, so one compare per row
                        w_rs = []
                        m_prev = (y0_rel + 1 == row0).astype(jnp.float32)
                        for t in range(SCAN_R):
                            m_t = (y0_rel == row0 + t).astype(jnp.float32)
                            w_rs.append(m_t * w_y0 + m_prev * w_y1)
                            m_prev = m_t
                        for k3 in range(nwin):
                            tile = tiler[:, k3 * LANE:(k3 + 1) * LANE]
                            g0 = jnp.take_along_axis(tile, ixm0, axis=1)
                            g1 = jnp.take_along_axis(tile, ixm1, axis=1)
                            t0 = g0[:cp] * w_rs[0]
                            t1 = g1[:cp] * w_rs[0]
                            for t in range(1, SCAN_R):
                                t0 = t0 + g0[t * cp:(t + 1) * cp] * w_rs[t]
                                t1 = t1 + g1[t * cp:(t + 1) * cp] * w_rs[t]
                            acc_w = acc_w + t0 * u0[k3] + t1 * u1[k3]
                        return acc_w

                    def run(_):
                        return jax.lax.fori_loop(
                            0, (rcnt + SCAN_R - 1) // SCAN_R, r_body,
                            jnp.zeros((cp, LANE), jnp.float32),
                        )

                    return run

                return jax.lax.cond(
                    nkr <= 1, variant(1),
                    lambda o: jax.lax.cond(
                        nkr == 2, variant(2), variant(min(3, nk)), o
                    ),
                    0,
                )

            warped = jax.lax.cond(rcnt == 0, dead, alive, 0)
            if fuse_cor:
                acc[pl.ds(i, 1)] = warped.reshape(1, cp, LANE)
            else:
                out_ref[0, d_i, pl.ds(i, 1)] = warped.reshape(1, cp, LANE)
            return 0

        jax.lax.fori_loop(0, nvr, row_body, 0)

        if not fuse_cor:
            continue
        # fused group correlation: mean over C/G sub-channels of warped*ref
        prod = acc[:] * ref_ref[0]  # (B2, CP, 128); padded ref rows are zero
        inv = jnp.float32(1.0 / sub)
        for g in range(group_dim):
            out_ref[0, d_i, g] = (
                jnp.sum(prod[:, g * sub:(g + 1) * sub, :], axis=1) * inv
            )


def _pallas_call(rows, shift, src_p, ref_p, xc, yc, *, b2, winb, nk, d,
                 group_dim, sub, h, w, nb, nxb, nvr, hp, cp, wp,
                 scan_r=SCAN_R, interpret=False, fuse_cor=True):
    kernel = functools.partial(
        _warp_kernel, b2=b2, winb=winb, nk=nk, d=d, group_dim=group_dim,
        sub=sub, h_real=h, w_real=w, nb=nb, nxb=nxb, nvr=nvr,
        scan_r=scan_r, fuse_cor=fuse_cor,
    )
    if fuse_cor:
        out_spec = pl.BlockSpec(
            (1, d, group_dim, nvr, LANE),
            lambda b, k, j, *_: (b, 0, 0, k, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (src_p.shape[0], d, group_dim, hp, nxb * LANE), jnp.float32
        )
    else:
        out_spec = pl.BlockSpec(
            (1, d, nvr, cp, LANE),
            lambda b, k, j, *_: (b, 0, k, 0, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (src_p.shape[0], d, hp, cp, nxb * LANE), jnp.float32
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(src_p.shape[0], nb, nxb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # src (HBM)
            pl.BlockSpec(                                      # ref window
                (1, nvr, cp, LANE),
                lambda b, k, j, *_: (b, k + 1, 0, j + 1),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(                                      # x coords
                (1, d, nvr, LANE),
                lambda b, k, j, *_: (b, 0, k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(                                      # y coords
                (1, d, nvr, LANE),
                lambda b, k, j, *_: (b, 0, k, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            # + scan_r - 1: zeroed spare rows read (zero-weighted) by the
            # last trip's overrun when a vreg's scan ends at the window
            pltpu.VMEM((winb * b2 + scan_r - 1, cp, wp), jnp.float32),
            pltpu.VMEM((nvr, cp, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(rows, shift, src_p, ref_p, xc, yc)


def _pad_feature(feat, b2, wp):
    """(B, H, W, C) -> zero-padded (B, H + 2*b2, CP, WP), channels on dim 2."""
    b, h, w, c = feat.shape
    cp = -(-c // 8) * 8
    f = jnp.transpose(feat, (0, 1, 3, 2))  # (B, H, C, W)
    return jnp.pad(
        f,
        ((0, 0), (b2, b2), (0, cp - c), (PADX, wp - w - PADX)),
    )


def warp_correlate_pallas(
    src_feat: jnp.ndarray,   # (B, Hs, Ws, C)
    ref_feat: jnp.ndarray,   # (B, H, W, C)
    x: jnp.ndarray,          # (B, D, H, W) source pixel coords
    y: jnp.ndarray,
    group_dim: int,
    *,
    interpret: bool = False,
    return_pred: bool = False,
    force_rp: int | None = None,
):
    """Fused warp + group correlation -> (B, D, H, W, G), channels-last.

    Requires src and ref at the same resolution (the MVSTER contract).
    Falls back to the XLA gather path at runtime (lax.cond) when the
    plane-sweep geometry exceeds the kernel's static windows — decided over
    pixels with at least one in-image tap, so wild out-of-frustum
    projections (which contribute zero either way) cannot force a fallback.

    return_pred=True also returns the bool predicate (True = ran on the
    kernel) so callers can surface silent degradation (build_cost_volume
    aggregates it into the per-stage "warp_fallbacks" model output).

    force_rp pins the row-pack layout to a single variant (no rp/2 chain)
    — measurement-only knob behind scripts/bench_warp.py's rp sweep, which
    is how `_row_pack`'s thresholds are placed; production callers leave it
    None.
    """
    out, pred = _warp_impl(src_feat, ref_feat, x, y, group_dim, True,
                           interpret, force_rp=force_rp)
    return (out, pred) if return_pred else out


def warp_correlate_pallas_geom(
    src_feat: jnp.ndarray,   # (B, H, W, C)
    ref_feat: jnp.ndarray,   # (B, H, W, C)
    src_proj: jnp.ndarray,   # (B, 4, 4) composed source projection
    ref_proj: jnp.ndarray,   # (B, 4, 4) composed reference projection
    depth_hypo: jnp.ndarray,  # (B, D, H, W) per-pixel hypotheses
    group_dim: int,
    *,
    interpret: bool = False,
    return_pred: bool = False,
    force_rp: int | None = None,
):
    """warp_correlate_pallas taking the GEOMETRY instead of precomputed
    coordinate grids: plane-sweep coords are emitted directly in the
    kernel lane layout (one fused elementwise pass over the packed
    per-pixel hypotheses, shared-transposed once), and window metadata
    reduces contiguous lanes — removing the per-view coordinate build +
    two pack_lanes transposes + the unconditional second variant's
    metadata pass of the x/y entry (the round-4 cost-volume glue attack;
    BENCHNOTES.md).  Numerics: same taps/weights as the x/y entry up to
    f32 reassociation of the (rot @ pixel) dot products (<= 1e-4 px)."""
    out, pred = _warp_impl_geom(
        src_feat, ref_feat, src_proj, ref_proj, depth_hypo, group_dim,
        True, interpret, force_rp=force_rp,
    )
    return (out, pred) if return_pred else out


def warp_pallas(
    src_feat: jnp.ndarray,   # (B, H, W, C)
    x: jnp.ndarray,          # (B, D, H, W) source pixel coords
    y: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Warp only (no fused correlation) -> (B, D, H, W, C).

    The training-forward primal of grid_sample_zeros_vjp
    (kernels/pallas_scatter.py): the warped tensor must materialize for
    the differentiable correlation, but its gather can still run on the
    kernel instead of XLA's slow row-at-a-time gather.  Matches
    core.sampling.grid_sample_zeros to ulp (same taps and masks; weight
    multiply association differs), with the usual lax.cond fallback on
    infeasible geometry.
    """
    return _warp_impl(src_feat, src_feat, x, y, 1, False, interpret)[0]


def _coord_windows(c: int, x, y, rp: int | None = None):
    """Shared layout + window-metadata computation for a kernel call with
    `c`-channel features and plane-sweep coords x/y ((B, D, H, W)).

    Returns (meta_row, shift, pred, layout) where layout carries the
    static tile geometry plus the (possibly output-width-padded) x/y and
    a `pack_lanes` closure producing the lane-layout coords (materialized
    inside the selected lax.cond branch so unselected layout variants cost
    nothing at runtime).  `warp_predicate` and scripts/probe_warp_pred.py
    evaluate the EXACT production predicate by calling this — any layout
    change here changes both the kernel call and its feasibility probe
    together.

    rp overrides the row-pack heuristic: `_warp_impl` chains layout
    variants (rp0, then rp0/2, then XLA) because taller rp bands add
    b2*slope rows to the shared band window's y-extent, which on
    wide-baseline rigs at wide images can exceed the VMEM window the
    heuristic's rp fits comfortably on DTU-envelope geometry.

    Row/depth-packed lane layout: each 128-lane vreg holds rp consecutive
    output ROWS x all D hypotheses x pc = 128/(rp*D) columns.  The scan
    count per vreg is ~slope * pc + depth-spread + rp-drift + 2, so
    narrowing the column group cuts the dominant tilt term while packing
    rows amortizes the fixed terms — but the on-chip rp sweep shows scan
    work is not latency (rp>1 only wins at D4 h>=1152; measured table in
    _row_pack).  Widths not divisible by the group are OUTPUT-padded
    (edge coords) to the next multiple and sliced after: the unpacked
    layout's out block (d x cp x band) otherwise overflows VMEM in
    warp-only mode at wide narrow-group shapes (e.g. raw stage1, 200
    wide, D=8).
    """
    b, d, h, w = x.shape
    L = _layout(c, d, h, w, rp)
    wo = L["wo"]
    if wo != w:
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, wo - w),), mode="edge")
        y = jnp.pad(y, ((0, 0),) * 3 + ((0, wo - w),), mode="edge")

    if L["pack"]:
        hp, rp, nwj, pc = L["hp"], L["rp"], L["knxb"], L["pc"]

        def pack_lanes(v):  # (B, D, H, WO) -> (B, 1, HP, NWJ*LANE)
            return jnp.transpose(
                v.reshape(b, d, hp, rp, nwj, pc), (0, 2, 4, 3, 1, 5)
            ).reshape(b, 1, hp, nwj * LANE)
    else:
        def pack_lanes(v):  # already edge-padded to wo == wc above
            return v

    meta_row, shift, pred = window_meta(
        x, y, h, w, L["b2"], L["winb"], L["nk"], L["wp"], rp=L["rp"],
        pc=L["pc"], share_d=L["pack"],
    )
    layout = dict(L, x=x, y=y, pack_lanes=pack_lanes)
    return meta_row, shift, pred, layout


def _layout(c: int, d: int, h: int, w: int, rp: int | None = None) -> dict:
    """Static tile geometry for one kernel layout variant (no coords)."""
    nxb = -(-w // LANE)
    wc = nxb * LANE
    wp = wc + 2 * PADX

    if rp is None:
        rp = _row_pack(d, h)
    pack = d > 1 and LANE % (rp * d) == 0
    if not pack:
        rp = 1
    # band height scales with rp so a band is always >= 8 vreg-rows
    # (Mosaic: block second-to-last dims must be multiples of 8 for f32;
    # nvr = b2/rp is the out/coord block's second-to-last dim)
    b2 = 8 * rp if rp > 1 else _band_rows(h)
    assert b2 and h % b2 == 0, f"height {h} not divisible by 8"
    nb = h // b2
    pc = LANE // (rp * d) if pack else LANE
    wo = -(-w // pc) * pc if pack else wc  # padded OUTPUT width

    cp = -(-c // 8) * 8
    # _window_bands caps at the padded buffer height (nb + 2 bands): a
    # wider window would make the per-band DMA slice unsatisfiable at small
    # images and invert the shift clamp range
    scan_r = _scan_r(d, h, cp, wp, b2, nb, w)
    winb = _window_bands(cp, wp, b2, nb, w, scan_r)
    # cap the lane window at the padded source width (small images)
    nk = min(_nk(cp), wp // LANE)
    nvr = b2 // rp    # vreg-rows per band
    hp = h // rp      # packed height
    if pack:
        kd, knxb = 1, (wo * d * rp) // LANE  # output vregs per packed row
    else:
        kd, knxb = d, nxb
    return dict(
        d=d, b2=b2, nb=nb, nxb=nxb, wc=wc, wp=wp, pack=pack, pc=pc, wo=wo,
        cp=cp, winb=winb, nk=nk, kd=kd, knxb=knxb, rp=rp, nvr=nvr, hp=hp,
        scan_r=scan_r,
    )


def _pack_depth(depth_hypo: jnp.ndarray, L: dict) -> jnp.ndarray:
    """(B, D, H, W) per-pixel hypotheses -> packed (B, 1, HP, NWJ*LANE)
    in the kernel lane layout (rp rows x d depths x pc cols per vreg),
    edge-padded to the layout's output width.  One cheap transpose of the
    D-sized hypothesis instead of two full (B, D, H, W) coordinate-tensor
    transposes per view — and shareable across all source views."""
    b, d, h, w = depth_hypo.shape
    wo, hp, rp, nwj, pc = L["wo"], L["hp"], L["rp"], L["knxb"], L["pc"]
    if wo != w:
        depth_hypo = jnp.pad(
            depth_hypo, ((0, 0),) * 3 + ((0, wo - w),), mode="edge"
        )
    return jnp.transpose(
        depth_hypo.reshape(b, d, hp, rp, nwj, pc), (0, 2, 4, 3, 1, 5)
    ).reshape(b, 1, hp, nwj * LANE)


def _packed_plane_sweep(rot, trans, dpk, L, w_real):
    """Plane-sweep coords emitted DIRECTLY in the packed kernel lane
    layout: x, y each (B, 1, HP, NWJ*LANE) matching `_pack_depth`'s dpk.

    The source coordinate of reference pixel (px, py) at depth d is
    ((rot @ (px, py, 1)) * d + trans) / z (core.geometry.plane_sweep_rt).
    The pixel position for every packed lane is decoded from iotas, so
    the whole computation is one fused elementwise pass writing the
    coords already in kernel order — replacing (per view) the unpacked
    (B, D, H, W) coordinate build AND the two pack_lanes transposes
    (~700 MB of HBM round-trips at raw stage4)."""
    b = dpk.shape[0]
    rp, d, pc = L["rp"], L["d"], L["pc"]
    lane = jax.lax.broadcasted_iota(jnp.int32, dpk.shape, 3)
    rowp = jax.lax.broadcasted_iota(jnp.int32, dpk.shape, 2)
    c_i = lane % pc
    rp_i = (lane // (pc * d)) % rp
    jw = lane // (pc * d * rp)
    # edge clamp mirrors the mode="edge" output-width pad of the coords
    col = jnp.minimum(jw * pc + c_i, w_real - 1)
    px = col.astype(jnp.float32)
    py = (rowp * rp + rp_i).astype(jnp.float32)

    def a(i):
        return (
            rot[:, i, 0].reshape(b, 1, 1, 1) * px
            + rot[:, i, 1].reshape(b, 1, 1, 1) * py
            + rot[:, i, 2].reshape(b, 1, 1, 1)
        )

    def t(i):
        return trans[:, i].reshape(b, 1, 1, 1)

    z = a(2) * dpk + t(2)
    z = jnp.where(z == 0.0, jnp.asarray(1e-9, z.dtype), z)
    x = (a(0) * dpk + t(0)) / z
    y = (a(1) * dpk + t(1)) / z
    return x, y


def _variant_rps(d: int, h: int) -> list:
    """Layout variants tried in order: the heuristic rp, then rp/2 (whose
    shorter bands shed ~b2/2*slope rows of shared-window y-extent, holding
    on wide-baseline rigs where the taller bands overflow), then XLA."""
    rp0 = _row_pack(d, h)
    return [rp0] + ([rp0 // 2] if rp0 > 1 else [])


def warp_predicate(channels: int, x, y) -> jnp.ndarray:
    """True iff this geometry would run on SOME Pallas layout variant of
    the production chain (same `_coord_windows` calls the production
    `_warp_impl` makes); False = the lax.cond chain would bottom out on
    the XLA fallback.  Drives the geometry-sweep tests
    (tests/test_warp_geometry.py) and scripts/probe_warp_pred.py."""
    _, d, h, _ = x.shape
    preds = [
        _coord_windows(channels, x, y, rp=rp)[2]
        for rp in _variant_rps(d, h)
    ]
    return functools.reduce(jnp.logical_or, preds)


def _pack_ref(ref_feat, L, w):
    """Reference feature in the packed lane order (rp rows, d depths, pc
    cols — the fused correlation multiplies warped and ref lane-wise),
    band/width-padded for the kernel.  The ref is IDENTICAL for every
    source view of a stage, so the fused multi-view path hoists this out
    of the per-view loop (it builds a d-fold duplicated ~4x-feature-sized
    tensor — one of the big per-view glue costs of the legacy entry)."""
    b, _, _, c = ref_feat.shape
    d, hp, rp, pc, wo, nvr = (L["d"], L["hp"], L["rp"], L["pc"], L["wo"],
                              L["nvr"])
    nwj = L["knxb"]
    nwc = wo // pc
    rf = ref_feat
    if wo != w:
        rf = jnp.pad(rf, ((0, 0), (0, 0), (0, wo - w), (0, 0)))
    ref_lanes = jnp.broadcast_to(
        jnp.transpose(
            rf.reshape(b, hp, rp, nwc, pc, c), (0, 1, 3, 2, 4, 5)
        ).reshape(b, hp, nwc, rp, 1, pc, c),
        (b, hp, nwc, rp, d, pc, c),
    ).reshape(b, hp, nwj * LANE, c)
    return _pad_feature(ref_lanes, nvr, nwj * LANE + 2 * PADX)


def _run_kernel_raw(src_feat, ref_p, xc, yc, meta_row, shift, L, group_dim,
                    sub, fuse_cor, interpret, h, w):
    """Invoke the Pallas kernel with pre-packed ref/coords; returns the
    RAW kernel output ((B, KD, G, HP, KNXB*LANE) fused, or the warp-only
    layout) without unpacking."""
    b2, wp = L["b2"], L["wp"]
    kd, knxb, cp = L["kd"], L["knxb"], L["cp"]
    nb, winb, nk, nvr, hp = L["nb"], L["winb"], L["nk"], L["nvr"], L["hp"]
    # flatten the scalar-prefetch operands: multi-dim SMEM arrays are
    # tile-padded (last two dims to (8,128)) and overflow SMEM at raw
    src_p = _pad_feature(src_feat, b2, wp)
    assert src_p.shape[2] == cp
    return _pallas_call(
        meta_row.reshape(-1), shift.reshape(-1), src_p, ref_p, xc, yc,
        b2=b2, winb=winb, nk=nk, d=kd, group_dim=group_dim,
        sub=sub, h=h, w=w, nb=nb, nxb=knxb, nvr=nvr, hp=hp, cp=cp,
        wp=wp, scan_r=L.get("scan_r", SCAN_R), interpret=interpret,
        fuse_cor=fuse_cor,
    )


def _unpack_cor(out, L, group_dim, h, w, folded=False):
    """(B, KD, G, HP, KNXB*LANE) raw fused output -> (B, D, H, W, G).

    folded=True instead emits the depth-folded lane layout
    (B, 1, H, W, D*G) consumed by the folded reg2d (nn/reg.py) — ONE
    transpose from packed space, replacing the standard unpack PLUS the
    re-fold the regularizer would otherwise pay on a (B,D,H,W,G) tensor.
    """
    b = out.shape[0]
    d, hp, rp, pc, wo, pack = (L["d"], L["hp"], L["rp"], L["pc"], L["wo"],
                               L["pack"])
    if pack:
        nwc = wo // pc
        r = out.reshape(b, group_dim, hp, nwc, rp, d, pc)
        if folded:
            return jnp.transpose(r, (0, 2, 4, 3, 6, 5, 1)).reshape(
                b, h, wo, d * group_dim
            )[:, None, :, :w]
        return jnp.transpose(r, (0, 5, 2, 4, 3, 6, 1)).reshape(
            b, d, h, wo, group_dim
        )[:, :, :, :w]
    r = jnp.transpose(out[..., :w], (0, 1, 3, 4, 2))  # (B, D, H, W, G)
    if folded:
        bb, dd, hh, ww, gg = r.shape
        return jnp.transpose(r, (0, 2, 3, 1, 4)).reshape(
            bb, 1, hh, ww, dd * gg
        )
    return r


def _pack_cor(cor, L, group_dim, w):
    """Inverse of _unpack_cor: (B, D, H, W, G) -> (B, KD=1, G, HP, NL).
    Used by the fused multi-view path's fallback branches so every branch
    returns the PRIMARY layout (lax.cond branches must agree on shape);
    width padding is edge-valued — padded lanes never reach real output
    pixels (the final unpack slices them away, and the packed softmax
    mixes lanes only within one (pixel, depth) column group)."""
    b, d, h, _, g = cor.shape
    hp, rp, pc, wo = L["hp"], L["rp"], L["pc"], L["wo"]
    nwc = wo // pc
    if wo != w:
        cor = jnp.pad(
            cor, ((0, 0),) * 3 + ((0, wo - w), (0, 0)), mode="edge"
        )
    out = jnp.transpose(
        cor.reshape(b, d, hp, rp, nwc, pc, g), (0, 6, 2, 4, 3, 1, 5)
    ).reshape(b, g, hp, nwc * rp * d * pc)
    return out[:, None]


def _run_kernel(src_feat, ref_feat, xc, yc, meta_row, shift, L, group_dim,
                sub, fuse_cor, interpret, h, w):
    """Pack features, invoke the Pallas kernel, unpack the output — the
    shared tail of both coordinate entries (`_warp_impl`'s legacy x/y path
    and `_warp_impl_geom`'s packed-emission path).  xc/yc are coords
    ALREADY in this layout's kernel lane order."""
    b, _, _, c = src_feat.shape
    pack = L["pack"]
    if pack:
        ref_p = _pack_ref(ref_feat, L, w)
    else:
        ref_p = _pad_feature(ref_feat, L["b2"], L["wp"])
    out = _run_kernel_raw(src_feat, ref_p, xc, yc, meta_row, shift, L,
                          group_dim, sub, fuse_cor, interpret, h, w)
    if fuse_cor:
        return _unpack_cor(out, L, group_dim, h, w)
    # warp-only: (B, KD, HP, CP, KNXB*LANE)
    d, hp, rp, pc, wo, cp = (L["d"], L["hp"], L["rp"], L["pc"], L["wo"],
                             L["cp"])
    if pack:
        nwc = wo // pc
        return jnp.transpose(
            out.reshape(b, hp, cp, nwc, rp, d, pc),
            (0, 5, 1, 4, 3, 6, 2),
        ).reshape(b, d, h, wo, cp)[:, :, :, :w, :c]
    return jnp.transpose(out[..., :w], (0, 1, 2, 4, 3))[..., :c]


def _warp_impl_geom(src_feat, ref_feat, src_proj, ref_proj, depth_hypo,
                    group_dim, fuse_cor, interpret, force_rp=None):
    """Geometry-direct variant chain: coords are emitted per layout
    variant DIRECTLY in the kernel lane order (`_packed_plane_sweep`) and
    the window metadata reduces contiguous lanes (`window_meta_packed`).
    vs the legacy x/y entry this removes, per view: the unpacked
    (B, D, H, W) coordinate build, both pack_lanes transposes, and —
    because each later variant lives inside the previous variant's
    fallback cond — the unconditional second window_meta pass.  The
    terminal fallback computes the unpacked XLA path inside its own
    branch.  Returns (out, ran_on_kernel)."""
    from mvster_tpu.core.geometry import plane_sweep_coords, plane_sweep_rt

    b, hs, ws, c = src_feat.shape
    _, d, h, w = depth_hypo.shape
    assert (hs, ws) == (h, w), "pallas warp expects matching view resolutions"
    assert c % group_dim == 0
    sub = c // group_dim

    rps = [force_rp] if force_rp is not None else _variant_rps(d, h)
    layouts = [_layout(c, d, h, w, rp) for rp in rps]
    if not all(L["pack"] for L in layouts):
        # unpacked lane layout (d == 1): the packed emission does not
        # apply; route through the legacy coordinate entry
        x, y = plane_sweep_coords(src_proj, ref_proj, depth_hypo)
        return _warp_impl(src_feat, ref_feat, x, y, group_dim, fuse_cor,
                          interpret, force_rp=force_rp)

    rot, trans = plane_sweep_rt(src_proj, ref_proj)
    return _geom_chain(src_feat, ref_feat, src_proj, ref_proj, depth_hypo,
                       rot, trans, layouts, group_dim, sub, fuse_cor,
                       interpret)


def _geom_chain(src_feat, ref_feat, src_proj, ref_proj, depth_hypo, rot,
                trans, layouts, group_dim, sub, fuse_cor, interpret):
    """The packed-variant cond chain over `layouts`, terminating in the
    unpacked XLA path.  Returns ((B, D, H, W, *) out, ran_on_kernel)."""
    from mvster_tpu.core.geometry import plane_sweep_coords

    _, d, h, w = depth_hypo.shape

    def xla_tail(_):
        from mvster_tpu.core.sampling import grid_sample_zeros
        from mvster_tpu.kernels.cost_volume import correlate

        x, y = plane_sweep_coords(src_proj, ref_proj, depth_hypo)
        warped = grid_sample_zeros(src_feat, x, y)
        out = correlate(warped, ref_feat, True, group_dim) if fuse_cor \
            else warped
        return out, jnp.zeros((), bool)

    def run(i):
        L = layouts[i]
        dpk = _pack_depth(depth_hypo, L)
        xk, yk = _packed_plane_sweep(rot, trans, dpk, L, w)
        meta_row, shift, pred = window_meta_packed(xk, yk, L, h, w)

        def hit(_):
            out = _run_kernel(
                src_feat, ref_feat, xk, yk, meta_row, shift, L,
                group_dim, sub, fuse_cor, interpret, h, w,
            )
            return out, jnp.ones((), bool)

        nxt = (lambda _: run(i + 1)) if i + 1 < len(layouts) else xla_tail
        return jax.lax.cond(pred, hit, nxt, operand=None)

    return run(0) if layouts else xla_tail(None)


def fused_cost_volume_geom(
    ref_feat, src_feats, ref_proj, src_projs, depth_hypo, group_dim,
    attn_temp, attn_fuse_d, *, interpret=False, force_rp=None,
    folded=False,
):
    """The COMPLETE multi-view fused cost volume in packed lane space.

    The round-4 glue decomposition (scripts/probe_cv_glue.py, BENCHNOTES)
    showed the per-view kernel WRAPPER — not coords or metadata — owns
    ~100 ms of the ~199 ms raw stage4 cost volume: each view rebuilt the
    d-fold-duplicated packed reference, transposed x/y into lane order,
    and transposed its correlation back to (B, D, H, W, G) just for the
    attention fusion to consume it elementwise.  This path instead:

      * packs the hypotheses and the reference ONCE per stage (both are
        view-invariant) and emits each view's coords directly in lane
        order (_packed_plane_sweep);
      * keeps each view's raw kernel output (B, 1, G, HP, NL) packed and
        computes the cross-view attention (score = sum over G, softmax
        over the depth positions INSIDE each lane group, 1/sqrt(C)) and
        the online weighted accumulation in packed space — depth sits in
        the lanes, so the softmax is a reshape + axis softmax;
      * unpacks ONCE after the final normalization.

    Per-view graceful degradation is preserved: a view whose primary
    layout predicate fails drops into the remaining variant chain + XLA
    tail and its result is REPACKED into the primary layout (rare path
    pays the transposes the common path no longer does).

    Returns (out (B, D, H, W, G), fallback_count int32) — same contract
    as build_cost_volume's per-view loop.  Behavioral reference:
    stagenet's view loop (/root/reference/models/mvs4net_utils.py:
    1025-1060)."""
    from mvster_tpu.core.geometry import plane_sweep_rt

    b, h, w, c = ref_feat.shape
    _, d, _, _ = depth_hypo.shape
    assert c % group_dim == 0
    sub = c // group_dim
    num_views = len(src_feats)

    rps = [force_rp] if force_rp is not None else _variant_rps(d, h)
    layouts = [_layout(c, d, h, w, rp) for rp in rps]
    L = layouts[0]
    assert L["pack"], "fused_cost_volume_geom requires a packed layout"
    rp, pc, hp = L["rp"], L["pc"], L["hp"]
    nwj = L["knxb"]

    dpk = _pack_depth(depth_hypo, L)
    ref_p = _pack_ref(ref_feat, L, w)

    fallbacks = jnp.asarray(0, jnp.int32)
    weight_sum = jnp.asarray(1e-8, jnp.float32)
    feats_sum = jnp.asarray(0.0, jnp.float32)
    inv_sqrt_c = jnp.float32(1.0 / (c ** 0.5))

    def packed_softmax_d(score):
        # score (B, 1, HP, NL); depth positions live inside each lane
        # group (lane order nwj | rp, d, pc) — softmax over that axis
        s = score.reshape(b, 1, hp, nwj, rp, d, pc)
        s = jax.nn.softmax(s / attn_temp, axis=-2)
        return s.reshape(b, 1, hp, nwj * LANE)

    for v in range(num_views):
        rot, trans = plane_sweep_rt(src_projs[v], ref_proj)
        xk, yk = _packed_plane_sweep(rot, trans, dpk, L, w)
        meta_row, shift, pred = window_meta_packed(xk, yk, L, h, w)

        def hit(_, xk=xk, yk=yk, meta_row=meta_row, shift=shift, v=v):
            out = _run_kernel_raw(
                src_feats[v], ref_p, xk, yk, meta_row, shift, L,
                group_dim, sub, True, interpret, h, w,
            )
            return out, jnp.ones((), bool)

        def miss(_, v=v):
            rot_v, trans_v = plane_sweep_rt(src_projs[v], ref_proj)
            out, ran = _geom_chain(
                src_feats[v], ref_feat, src_projs[v], ref_proj,
                depth_hypo, rot_v, trans_v, layouts[1:], group_dim, sub,
                True, interpret,
            )
            return _pack_cor(out, L, group_dim, w), ran

        cor, ran = jax.lax.cond(pred, hit, miss, operand=None)
        fallbacks = fallbacks + (1 - ran.astype(jnp.int32))
        cor = cor.astype(jnp.float32)  # (B, 1, G, HP, NL)
        score = jnp.sum(cor, axis=2)   # (B, 1, HP, NL)
        if attn_fuse_d:
            wt = packed_softmax_d(score) * inv_sqrt_c
        else:
            s = score.reshape(b, 1, hp, nwj, rp, d, pc)
            s = jnp.max(jax.nn.softmax(s, axis=-2), axis=-2, keepdims=True)
            wt = jnp.broadcast_to(
                s, (b, 1, hp, nwj, rp, d, pc)
            ).reshape(b, 1, hp, nwj * LANE)
        weight_sum = weight_sum + wt
        feats_sum = feats_sum + wt[:, :, None] * cor

    out = feats_sum / weight_sum[:, :, None]
    return _unpack_cor(out, L, group_dim, h, w, folded=folded), fallbacks


def _warp_impl(src_feat, ref_feat, x, y, group_dim, fuse_cor, interpret,
               force_rp=None):
    b, hs, ws, c = src_feat.shape
    _, d, h, w = x.shape
    assert (hs, ws) == (h, w), "pallas warp expects matching view resolutions"
    assert c % group_dim == 0
    sub = c // group_dim
    x_orig, y_orig = x, y

    def make_kernel_path(meta_row, shift, L):
        """Branch fn for one layout variant.  All heavy operand packing
        (lane transposes, band/width pads) happens INSIDE the branch so an
        unselected variant costs nothing at runtime — XLA's conditional
        executes only the taken branch."""
        x, y, pack_lanes = L["x"], L["y"], L["pack_lanes"]

        def kernel_path(_):
            return _run_kernel(
                src_feat, ref_feat, pack_lanes(x), pack_lanes(y),
                meta_row, shift, L, group_dim, sub, fuse_cor, interpret,
                h, w,
            )

        return kernel_path

    def xla_path(_):
        from mvster_tpu.core.sampling import grid_sample_zeros
        from mvster_tpu.kernels.cost_volume import correlate

        warped = grid_sample_zeros(src_feat, x_orig, y_orig)
        if fuse_cor:
            return correlate(warped, ref_feat, True, group_dim)
        return warped

    # variant chain: heuristic rp first, then rp/2, then XLA — preds are
    # cheap coord reductions; the branch bodies (packing + kernel) only
    # execute when selected
    rps = [force_rp] if force_rp is not None else _variant_rps(d, h)
    variants = [_coord_windows(c, x, y, rp=rp) for rp in rps]
    branch = xla_path
    pred_any = jnp.zeros((), bool)
    for meta_row, shift, pred, L in reversed(variants):
        branch = functools.partial(
            lambda nxt, kp, p, _: jax.lax.cond(p, kp, nxt, operand=None),
            branch, make_kernel_path(meta_row, shift, L), pred,
        )
        pred_any = pred_any | pred
    return branch(None), pred_any


def window_meta(x, y, h, w, b2, winb, nk, wp_src, rp=1, pc=LANE,
                share_d=False):
    """Kernel window metadata + feasibility predicate, per output VREG.

    x/y are the (B, D, H, WO) output-width-padded coordinates (UNPACKED —
    this function mirrors whatever lane grouping `_coord_windows` chose via
    rp/pc/share_d: each 128-lane vreg holds rp consecutive rows x
    (D if share_d else 1) depths x pc columns).  Returns
    (meta_row, shift, pred):

      * meta_row (B, KD, NB, NW, NVR_B) int32 — per-vreg window, packed
        nkr << 27 | (xb/128) << 22 | pb << 8 | rcnt, where xb is the
        vreg's aligned lane-window base in padded source columns, nkr how
        many 128-lane windows from xb its x-span actually needs (the
        kernel gathers only those — mean 1.1-1.3 vs the static nk=3
        bound), pb the vreg's first scan row in window coordinates and
        rcnt its scan count.  Per-vreg granularity keeps the scan count at
        the vreg's own span (tilt*pc + depth spread + rp drift) instead of
        the whole band's.
      * shift (B, NB) int32 — per-band DMA window offset.
      * pred — True iff every relevant vreg fits the static windows.

    wp_src is the padded SOURCE width the lane-window base indexes into.
    """
    b, d, _, wo = x.shape
    nb = h // b2
    nvr_b = b2 // rp
    nw = wo // pc

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    rel = (x > -1) & (x < w) & (y > -1) & (y < h)  # >=1 tap in-image

    def blockify(v):  # -> (B, D, NB, NVR_B, RP, NW, PC)
        return v.reshape(b, d, nb, nvr_b, rp, nw, pc)

    red = (1, 4, 6) if share_d else (4, 6)  # the packed-lane axes
    inf = jnp.float32(jnp.inf)
    rel_b = blockify(rel)
    y0_b = blockify(y0f)
    x0_b = blockify(x0f)
    # per-vreg extents: (B, KD, NB, NVR_B, NW)
    ymin_r = jnp.min(jnp.where(rel_b, y0_b, inf), axis=red)
    ymax_r = jnp.max(jnp.where(rel_b, y0_b, -inf), axis=red)
    xmin_r = jnp.min(jnp.where(rel_b, x0_b, inf), axis=red)
    xmax_r = jnp.max(jnp.where(rel_b, x0_b + 1, -inf), axis=red)
    rel_r = jnp.any(rel_b, axis=red)
    if share_d:
        ymin_r, ymax_r = ymin_r[:, None], ymax_r[:, None]
        xmin_r, xmax_r = xmin_r[:, None], xmax_r[:, None]
        rel_r = rel_r[:, None]

    return _meta_from_extents(
        ymin_r, ymax_r, xmin_r, xmax_r, rel_r,
        h=h, b2=b2, winb=winb, nk=nk, wp=wp_src, nb=nb,
    )


def window_meta_packed(x, y, L, h, w):
    """window_meta for coords ALREADY in the packed kernel lane layout
    ((B, 1, HP, NWJ*LANE), lane order (nwj | rp, d, pc) — the layout
    `_packed_plane_sweep` emits).  The per-vreg extents become one
    contiguous 128-lane reduction per vreg instead of window_meta's
    strided gathers over the unpacked (B, D, H, W) tensor — the whole
    point of emitting coords in kernel layout."""
    b = x.shape[0]
    nb, nvr, nwj = L["nb"], L["nvr"], L["knxb"]
    rp, d, pc = L["rp"], L["d"], L["pc"]

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    rel = (x > -1) & (x < w) & (y > -1) & (y < h)

    def blockify(v):  # -> (B, NB, NVR, NWJ, 128): vreg lanes contiguous
        return v.reshape(b, nb, nvr, nwj, rp * d * pc)

    inf = jnp.float32(jnp.inf)
    rel_b = blockify(rel)
    y0_b = blockify(y0f)
    x0_b = blockify(x0f)
    ymin_r = jnp.min(jnp.where(rel_b, y0_b, inf), axis=-1)
    ymax_r = jnp.max(jnp.where(rel_b, y0_b, -inf), axis=-1)
    xmin_r = jnp.min(jnp.where(rel_b, x0_b, inf), axis=-1)
    xmax_r = jnp.max(jnp.where(rel_b, x0_b + 1, -inf), axis=-1)
    rel_r = jnp.any(rel_b, axis=-1)

    def kdim(v):  # (B, NB, NVR, NWJ) -> (B, KD=1, NB, NVR, NWJ)
        return v[:, None]

    return _meta_from_extents(
        kdim(ymin_r), kdim(ymax_r), kdim(xmin_r), kdim(xmax_r), kdim(rel_r),
        h=h, b2=L["b2"], winb=L["winb"], nk=L["nk"], wp=L["wp"], nb=nb,
    )


def _meta_from_extents(ymin_r, ymax_r, xmin_r, xmax_r, rel_r, *, h, b2,
                       winb, nk, wp, nb):
    """Shared meta/shift/predicate backend over per-vreg extents
    ((B, KD, NB, NVR, NW) each) — see window_meta for field semantics."""
    inf = jnp.float32(jnp.inf)
    # per-band window shift: the kernel addresses scan rows absolutely
    # within the window (row_scr = pb + rs, no output-row offset), so the
    # optimal window top is the band's absolute MIN source row — a
    # residual-based top (min of y0 - output_row, round 2's layout) wastes
    # up to b2*slope rows of the window when the min residual comes from a
    # different output row than the min source row, which with rp-scaled
    # b2 = 32 tripped the predicate on wide-baseline raw stage4 rigs.
    # Clamped so the padded slice [k*b2 + b2 + shift, +winb*b2) stays
    # inside the padded source.
    k_idx = jnp.arange(nb, dtype=jnp.float32)[None]
    shift_raw = (
        jnp.min(jnp.where(rel_r, ymin_r, inf), axis=(1, 3, 4))
        - k_idx * b2
    )  # (B, NB)
    shift_raw = jnp.where(jnp.isfinite(shift_raw), shift_raw, 0.0)
    shift = jnp.clip(
        shift_raw, -(k_idx + 1) * b2, h + (1 - winb) * b2 - k_idx * b2
    ).astype(jnp.int32)

    # window-relative per-vreg scan base/count (absolute source rows
    # relative to the window top = original row k*b2 + shift)
    win_top = (
        jnp.arange(nb, dtype=jnp.int32)[None, None, :, None, None] * b2
        + shift[:, None, :, None, None]
    )
    pb = jnp.where(rel_r, ymin_r, 0.0).astype(jnp.int32) - win_top
    rcnt = jnp.where(rel_r, ymax_r - ymin_r + 2.0, 0.0).astype(jnp.int32)

    xbase = jnp.clip(
        jnp.floor((jnp.where(rel_r, xmin_r, 0.0) + PADX) / LANE) * LANE,
        0.0, wp - nk * LANE,
    ).astype(jnp.int32)
    span = jnp.where(rel_r, xmax_r, 0.0) + PADX - xbase.astype(jnp.float32)
    nkr = jnp.clip(jnp.ceil(span / LANE), 1.0, nk).astype(jnp.int32)

    # feasibility: scan rows [pb, pb + rcnt) within the window, x-span
    # within nk aligned windows from xbase, fields within their packed
    # bit widths (rcnt 8 bits; xb/128 5 bits — the latter is static)
    ok_y = (pb >= 0) & (pb + rcnt <= winb * b2) & (rcnt <= 0xFF)
    ok_x = (span < nk * LANE) & (
        xmin_r + PADX >= xbase.astype(jnp.float32)
    )
    pred = jnp.all(jnp.where(rel_r, ok_y & ok_x, True))
    if (wp - nk * LANE) // LANE > 0x1F:  # images wider than ~4200 px
        pred = jnp.zeros((), bool)

    pb = jnp.clip(pb, 0, 0x3FFF)
    rcnt = jnp.clip(rcnt, 0, min(winb * b2, 255))
    meta_row = (
        (nkr << 27) | ((xbase // LANE) << 22) | (pb << 8) | rcnt
    )  # (B, KD, NB, NVR_B, NW)
    meta_row = jnp.transpose(meta_row, (0, 1, 2, 4, 3))  # vreg-rows innermost
    return meta_row, shift, pred
