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
scripts/bench_warp.py, 2026-08-16; max-err vs XLA <= 5e-7, stage4 bitwise):

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
_ROW_BIAS = 4096    # bias for the packed per-row scan base (see window_meta)
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


def _window_bands(cp: int, wp: int, b2: int, nb: int, w: int) -> int:
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
    budget = MAX_FEATURE_BYTES // (b2 * cp * wp * 4)
    tilt = -(-(int(0.15 * w) + 2 * b2 + 32) // b2)
    return max(2, min(nb + 2, budget, tilt))


def _nk(cp: int) -> int:
    """Lane-window width in 128-lane vregs.  With PER-ROW aligned window
    bases a row's horizontal span is ~128*dx/dlane + alignment slack, which
    3 vregs cover for all MVS geometry we've probed (block-level bases
    needed 4 at full-res stages); rows that exceed it trip the runtime
    predicate and fall back to XLA."""
    return 3


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
    scratch_bytes = winb * b2 * cp * wp * 4
    return scratch_bytes <= MAX_FEATURE_BYTES


def _warp_kernel(row_ref, shift_ref, src_hbm, ref_ref, x_ref,
                 y_ref, out_ref, scratch, acc, sem, *, b2, winb, nk, d,
                 group_dim, sub, h_real, w_real, nb, nxb, fuse_cor=True):
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
        dma = pltpu.make_async_copy(
            src_hbm.at[b, pl.ds(k * b2 + b2 + shift, winb * b2)],
            scratch, sem,
        )
        dma.start()
        dma.wait()

    for d_i in range(d):
        # meta is FLAT 1-D: multi-dim SMEM operands are tile-padded (last
        # two dims to (8, 128)), which overflows the 1 MB SMEM at raw-stage4
        # ((1,4,72,13,4) pads to 2.25 MB); flat arrays pad to lanes only.
        blk = ((b * d + d_i) * nb + k) * nxb + j
        rowbase = blk * b2

        def row_body(i, _):
            # per-output-row window, packed xb/128 << 22 | (pb+BIAS) << 8
            # | rcnt.  Per-row granularity matters twice: the band drift
            # otherwise inflates every row's scan count ~2x, and a per-row
            # aligned lane base needs only 3 window vregs where a shared
            # block base needed 4 (window_meta packs; see _ROW_BIAS).
            word = row_ref[rowbase + i]
            xb = pl.multiple_of((word >> 22) * LANE, LANE)
            pb = ((word >> 8) & 0x3FFF) - _ROW_BIAS
            rcnt = word & 0xFF
            x = x_ref[0, d_i, pl.ds(i, 1), :]          # (1, 128)
            y = y_ref[0, d_i, pl.ds(i, 1), :]
            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            wx = x - x0f
            wy = y - y0f
            x0i = x0f.astype(jnp.int32)
            y0i = y0f.astype(jnp.int32)
            vx0 = ((x0i >= 0) & (x0i < w_real)).astype(jnp.float32)
            vx1 = ((x0i + 1 >= 0) & (x0i + 1 < w_real)).astype(jnp.float32)
            vy0 = ((y0i >= 0) & (y0i < h_real)).astype(jnp.float32)
            vy1 = ((y0i + 1 >= 0) & (y0i + 1 < h_real)).astype(jnp.float32)
            w_y0 = (1.0 - wy) * vy0
            w_y1 = wy * vy1
            # source row indices relative to the window origin (row 0 of
            # the scratch window is original row k*b2 + shift)
            y0_rel = y0i - k * b2 - shift

            rx0 = x0i + PADX - xb  # window-relative x0 tap index
            w_x0 = (1.0 - wx) * vx0
            w_x1 = wx * vx1
            # shared modular gather indices: the tap at window column rx
            # lives in vreg rx >> 7 at lane rx & 127, so one broadcast index
            # per tap serves every unrolled window and membership is a
            # single compare (replaces per-window index prep + range masks;
            # negative/out-of-window rx yield k_of outside [0, nk) and drop)
            k_of0 = rx0 >> 7
            k_of1 = (rx0 + 1) >> 7
            ixm0 = jnp.broadcast_to(rx0 & (LANE - 1), (cp, LANE))
            ixm1 = jnp.broadcast_to((rx0 + 1) & (LANE - 1), (cp, LANE))

            def scan_row(row_scr, w_row, acc_w):
                tile3 = scratch[
                    pl.ds(row_scr, 1), :, pl.ds(xb, nk * LANE)
                ].reshape(cp, nk * LANE)
                a0 = w_row * w_x0
                a1 = w_row * w_x1
                # statically unrolled lane windows (a dynamic fori_loop over
                # the window count measured ~2x SLOWER — Mosaic lowers the
                # per-iteration dynamic lane-slice poorly)
                for k3 in range(nk):
                    tile = tile3[:, k3 * LANE:(k3 + 1) * LANE]
                    g0 = jnp.take_along_axis(tile, ixm0, axis=1)
                    g1 = jnp.take_along_axis(tile, ixm1, axis=1)
                    w0 = a0 * (k_of0 == k3).astype(jnp.float32)
                    w1 = a1 * (k_of1 == k3).astype(jnp.float32)
                    acc_w = acc_w + g0 * w0 + g1 * w1
                return acc_w

            def r_body(r, acc_w):
                # two scan rows per trip: halves loop overhead; the extra
                # row is masked out when rcnt is odd
                for rr in range(2):
                    rs = 2 * r + rr
                    row_scr = jnp.clip(i + pb + rs, 0, winb * b2 - 1)
                    m0 = (y0_rel == row_scr).astype(jnp.float32)
                    m1 = (y0_rel + 1 == row_scr).astype(jnp.float32)
                    live = (rs < rcnt).astype(jnp.float32)
                    w_row = (m0 * w_y0 + m1 * w_y1) * live  # (1, 128)
                    acc_w = scan_row(row_scr, w_row, acc_w)
                return acc_w

            warped = jax.lax.fori_loop(
                0, (rcnt + 1) // 2, r_body,
                jnp.zeros((cp, LANE), jnp.float32),
            )
            if fuse_cor:
                acc[pl.ds(i, 1)] = warped.reshape(1, cp, LANE)
            else:
                out_ref[0, d_i, pl.ds(i, 1)] = warped.reshape(1, cp, LANE)
            return 0

        jax.lax.fori_loop(0, b2, row_body, 0)

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
                 group_dim, sub, h, w, nb, nxb, cp, wp, interpret=False,
                 fuse_cor=True):
    kernel = functools.partial(
        _warp_kernel, b2=b2, winb=winb, nk=nk, d=d, group_dim=group_dim,
        sub=sub, h_real=h, w_real=w, nb=nb, nxb=nxb, fuse_cor=fuse_cor,
    )
    if fuse_cor:
        out_spec = pl.BlockSpec(
            (1, d, group_dim, b2, LANE),
            lambda b, k, j, *_: (b, 0, 0, k, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (src_p.shape[0], d, group_dim, h, nxb * LANE), jnp.float32
        )
    else:
        out_spec = pl.BlockSpec(
            (1, d, b2, cp, LANE),
            lambda b, k, j, *_: (b, 0, k, 0, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (src_p.shape[0], d, h, cp, nxb * LANE), jnp.float32
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(src_p.shape[0], nb, nxb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # src (HBM)
            pl.BlockSpec(                                      # ref window
                (1, b2, cp, LANE),
                lambda b, k, j, *_: (b, k + 1, 0, j + 1),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(                                      # x coords
                (1, d, b2, LANE),
                lambda b, k, j, *_: (b, 0, k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(                                      # y coords
                (1, d, b2, LANE),
                lambda b, k, j, *_: (b, 0, k, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((winb * b2, cp, wp), jnp.float32),
            pltpu.VMEM((b2, cp, LANE), jnp.float32),
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
    """
    out, pred = _warp_impl(src_feat, ref_feat, x, y, group_dim, True,
                           interpret)
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


def _coord_windows(c: int, x, y):
    """Shared layout + window-metadata computation for a kernel call with
    `c`-channel features and plane-sweep coords x/y ((B, D, H, W)).

    Returns (meta_row, shift, pred, layout) where layout carries the
    static tile geometry plus the (possibly output-width-padded) x/y and
    the lane-layout coords xc/yc.  `warp_predicate` and
    scripts/probe_warp_pred.py evaluate the EXACT production predicate by
    calling this — any layout change here changes both the kernel call and
    its feasibility probe together.

    Depth-packed lane layout: all D hypotheses share each 128-lane vreg
    (D groups of 128/D columns).  The scan count per row is
    ~slope * lane_cols + depth-spread, so narrowing the column group from
    128 to 128/D cuts the dominant term by D at full vreg utilization —
    decisive at raw sizes where steep epipolar slopes drive 30+-row scans.
    Widths not divisible by the group are OUTPUT-padded (edge coords) to
    the next multiple and sliced after: the unpacked layout's out block
    (d x cp x band) otherwise overflows VMEM in warp-only mode at wide
    narrow-group shapes (e.g. raw stage1, 200 wide, D=8).
    """
    b, d, h, w = x.shape
    b2 = _band_rows(h)
    assert b2, f"height {h} not divisible by 8"
    nb = h // b2
    nxb = -(-w // LANE)
    wc = nxb * LANE
    wp = wc + 2 * PADX

    pc = LANE // d if (d > 1 and LANE % d == 0) else 0
    pack = bool(pc)
    wo = -(-w // pc) * pc if pack else w  # padded OUTPUT width
    if pack and wo != w:
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, wo - w),), mode="edge")
        y = jnp.pad(y, ((0, 0),) * 3 + ((0, wo - w),), mode="edge")

    cp = -(-c // 8) * 8
    # _window_bands caps at the padded buffer height (nb + 2 bands): a
    # wider window would make the per-band DMA slice unsatisfiable at small
    # images and invert the shift clamp range
    winb = _window_bands(cp, wp, b2, nb, w)
    # cap the lane window at the padded source width (small images)
    nk = min(_nk(cp), wp // LANE)

    if pack:
        nw = wo // pc

        def pack_lanes(v):  # (B, D, H, WO) -> (B, 1, H, WO*D)
            return jnp.transpose(
                v.reshape(b, d, h, nw, pc), (0, 2, 3, 1, 4)
            ).reshape(b, 1, h, wo * d)

        xc, yc = pack_lanes(x), pack_lanes(y)
        kd, knxb = 1, (wo * d) // LANE
    else:
        xc = jnp.pad(x, ((0, 0),) * 3 + ((0, wc - w),), mode="edge")
        yc = jnp.pad(y, ((0, 0),) * 3 + ((0, wc - w),), mode="edge")
        kd, knxb = d, nxb

    meta_row, shift, pred = window_meta(xc, yc, h, w, b2, winb, nk, wp)
    layout = dict(
        b2=b2, nb=nb, nxb=nxb, wc=wc, wp=wp, pack=pack, pc=pc, wo=wo,
        cp=cp, winb=winb, nk=nk, kd=kd, knxb=knxb, x=x, y=y, xc=xc, yc=yc,
    )
    return meta_row, shift, pred, layout


def warp_predicate(channels: int, x, y) -> jnp.ndarray:
    """The kernel's runtime geometry-feasibility predicate, evaluated
    without running the kernel (same `_coord_windows` the production call
    uses).  True = this geometry would run on the Pallas kernel; False =
    the lax.cond would take the XLA fallback.  Drives the geometry-sweep
    tests (tests/test_warp_geometry.py) and scripts/probe_warp_pred.py."""
    _, _, pred, _ = _coord_windows(channels, x, y)
    return pred


def _warp_impl(src_feat, ref_feat, x, y, group_dim, fuse_cor, interpret):
    b, hs, ws, c = src_feat.shape
    _, d, h, w = x.shape
    assert (hs, ws) == (h, w), "pallas warp expects matching view resolutions"
    assert c % group_dim == 0
    sub = c // group_dim

    meta_row, shift, pred, L = _coord_windows(c, x, y)
    x, y, xc, yc = L["x"], L["y"], L["xc"], L["yc"]
    b2, wp, wo, pack, pc = L["b2"], L["wp"], L["wo"], L["pack"], L["pc"]
    nb, nxb, winb, nk = L["nb"], L["nxb"], L["winb"], L["nk"]
    kd, knxb, cp = L["kd"], L["knxb"], L["cp"]

    # --- XLA-side precompute: padded operands
    src_p = _pad_feature(src_feat, b2, wp)
    assert src_p.shape[2] == cp
    if pack:
        nw = wo // pc
        if wo != w:
            ref_feat = jnp.pad(
                ref_feat, ((0, 0), (0, 0), (0, wo - w), (0, 0))
            )
        ref_lanes = jnp.broadcast_to(
            ref_feat.reshape(b, h, nw, 1, pc, c), (b, h, nw, d, pc, c)
        ).reshape(b, h, wo * d, c)
        ref_p = _pad_feature(ref_lanes, b2, wo * d + 2 * PADX)
    else:
        ref_p = _pad_feature(ref_feat, b2, wp)

    # flatten the scalar-prefetch operands: multi-dim SMEM arrays are
    # tile-padded (last two dims to (8,128)) and overflow SMEM at raw sizes
    meta_row = meta_row.reshape(-1)
    shift = shift.reshape(-1)

    def kernel_path(_):
        out = _pallas_call(
            meta_row, shift, src_p, ref_p, xc, yc,
            b2=b2, winb=winb, nk=nk, d=kd, group_dim=group_dim, sub=sub,
            h=h, w=w, nb=nb, nxb=knxb, cp=cp, wp=wp,
            interpret=interpret, fuse_cor=fuse_cor,
        )
        if fuse_cor:  # (B, KD, G, H, KNXB*LANE)
            if pack:
                return jnp.transpose(
                    out.reshape(b, group_dim, h, nw, d, pc),
                    (0, 4, 2, 3, 5, 1),
                ).reshape(b, d, h, wo, group_dim)[:, :, :, :w]
            return jnp.transpose(out[..., :w], (0, 1, 3, 4, 2))
        # warp-only: (B, KD, H, CP, KNXB*LANE)
        if pack:
            return jnp.transpose(
                out.reshape(b, h, cp, nw, d, pc), (0, 4, 1, 3, 5, 2)
            ).reshape(b, d, h, wo, cp)[:, :, :, :w, :c]
        return jnp.transpose(out[..., :w], (0, 1, 2, 4, 3))[..., :c]

    def xla_path(_):
        from mvster_tpu.core.sampling import grid_sample_zeros
        from mvster_tpu.kernels.cost_volume import correlate

        # x/y/ref may carry the output-width padding; slice it back off
        warped = grid_sample_zeros(src_feat, x, y)
        if fuse_cor:
            return correlate(warped, ref_feat, True, group_dim)[
                :, :, :, :w
            ]
        return warped[:, :, :, :w]

    return jax.lax.cond(pred, kernel_path, xla_path, operand=None), pred


def window_meta(xc, yc, h, w, b2, winb, nk, wp_src=None):
    """Kernel window metadata + feasibility predicate.

    xc/yc are the (B, D, H, WC) lane-padded coordinates; returns
    (meta_row, shift, pred):

      * meta_row (B, D, NB, NXB, B2) int32 — PER-OUTPUT-ROW window, packed
        (xb/128) << 22 | (pb + _ROW_BIAS) << 8 | rcnt, where xb is the
        row's aligned lane-window base in padded columns, pb the scan base
        relative to the output row (window coordinates) and rcnt the scan
        count.  Per-row granularity matters twice: a per-block scan window
        would add the band's row drift (y_src - y_out scale mismatch) to
        every row's scan count (~2x extra scanning on DTU-like geometry),
        and a per-row lane base covers a row's x-span with 3 window vregs
        where a shared block base needed 4.
      * shift (B, NB) int32 — per-band DMA window offset.
      * pred — True iff every relevant pixel fits the static windows.

    wp_src is the padded SOURCE width the lane-window base indexes into
    (differs from the coords width in the depth-packed lane layout).
    """
    b, d, _, wcols = xc.shape
    nb = h // b2
    nxb = wcols // LANE
    wp = wp_src if wp_src is not None else nxb * LANE + 2 * PADX

    x0f = jnp.floor(xc)
    y0f = jnp.floor(yc)
    rel = (xc > -1) & (xc < w) & (yc > -1) & (yc < h)  # >=1 tap in-image
    i_abs = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    yres = y0f - i_abs

    def blockify(v):  # (B, D, H, WC) -> (B, D, NB, B2, NXB, LANE)
        return v.reshape(b, d, nb, b2, nxb, LANE)

    inf = jnp.float32(jnp.inf)
    rel_b = blockify(rel)
    yres_b = blockify(yres)
    x0_b = blockify(x0f)
    # per-row (over lanes only) extents: (B, D, NB, B2, NXB)
    ymin_r = jnp.min(jnp.where(rel_b, yres_b, inf), axis=5)
    ymax_r = jnp.max(jnp.where(rel_b, yres_b, -inf), axis=5)
    xmin_r = jnp.min(jnp.where(rel_b, x0_b, inf), axis=5)
    xmax_r = jnp.max(jnp.where(rel_b, x0_b + 1, -inf), axis=5)
    rel_r = jnp.any(rel_b, axis=5)

    # per-band window shift: let the winb-band source window track the
    # vertical parallax (min scan base over the band's relevant rows and
    # depths), clamped so the padded slice [k*b2 + b2 + shift, +winb*b2)
    # stays inside the (H + 2*b2)-row padded source
    shift_raw = jnp.min(
        jnp.where(rel_r, ymin_r, inf), axis=(1, 3, 4)
    )  # (B, NB)
    shift_raw = jnp.where(jnp.isfinite(shift_raw), shift_raw, 0.0)
    k_idx = jnp.arange(nb, dtype=jnp.float32)[None]
    shift = jnp.clip(
        shift_raw, -(k_idx + 1) * b2, h + (1 - winb) * b2 - k_idx * b2
    ).astype(jnp.int32)

    # window-relative per-row scan base/count
    pb = (
        jnp.where(rel_r, ymin_r, 0.0).astype(jnp.int32)
        - shift[:, None, :, None, None]
    )
    rcnt = jnp.where(rel_r, ymax_r - ymin_r + 2.0, 0.0).astype(jnp.int32)

    xbase = jnp.clip(
        jnp.floor((jnp.where(rel_r, xmin_r, 0.0) + PADX) / LANE) * LANE,
        0.0, wp - nk * LANE,
    ).astype(jnp.int32)

    # feasibility: scan rows [i + pb, i + pb + rcnt) within the window
    i_in = jnp.arange(b2, dtype=jnp.int32)[None, None, None, :, None]
    ok_y = (i_in + pb >= 0) & (i_in + pb + rcnt <= winb * b2)
    ok_x = (xmax_r + PADX - xbase.astype(jnp.float32) < nk * LANE) & (
        xmin_r + PADX >= xbase.astype(jnp.float32)
    )
    pred = jnp.all(jnp.where(rel_r, ok_y & ok_x, True))

    pb = jnp.clip(pb, -_ROW_BIAS, 0x3FFF - _ROW_BIAS)
    rcnt = jnp.clip(rcnt, 0, winb * b2)
    meta_row = (
        ((xbase // LANE) << 22) | ((pb + _ROW_BIAS) << 8) | rcnt
    )  # (B, D, NB, B2, NXB)
    meta_row = jnp.transpose(meta_row, (0, 1, 2, 4, 3))  # rows innermost
    return meta_row, shift, pred
