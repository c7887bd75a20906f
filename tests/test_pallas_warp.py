"""Pallas fused warp+correlation kernel vs the XLA path (interpret mode)."""

from contextlib import nullcontext

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tests.helpers import plane_scene_sample
from mvster_tpu.core.geometry import compose_projection, plane_sweep_coords
from mvster_tpu.core.hypothesis import init_inverse_range
from mvster_tpu.kernels.cost_volume import correlate, warp_src_feature


def test_interpret_forced_detects_context():
    """_interpret_forced reads a private jax config attribute; if a jax
    upgrade breaks it, pallas_warp_supported would silently return False
    under force_tpu_interpret_mode and every kernel parity test here would
    compare XLA against XLA, passing vacuously.  Fail loudly instead."""
    from mvster_tpu.kernels.pallas_warp import _interpret_forced

    assert not _interpret_forced()
    with pltpu.force_tpu_interpret_mode():
        assert _interpret_forced(), (
            "private-API probe broke: pallas parity tests would be vacuous"
        )


@pytest.mark.parametrize("group_dim", [1, 3])
def test_pallas_warp_matches_xla(group_dim):
    from mvster_tpu.kernels.pallas_warp import warp_correlate_pallas

    sample = plane_scene_sample(0)
    imgs = jnp.asarray(sample["imgs"])  # (1, 3, 64, 64, 3)
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)

    ref = imgs[:, 0]
    src = imgs[:, 1]
    warped = warp_src_feature(src, composed[:, 1], composed[:, 0], hypo)
    cor_xla = correlate(warped, ref, True, group_dim)

    x, y = plane_sweep_coords(composed[:, 1], composed[:, 0], hypo)
    with pltpu.force_tpu_interpret_mode():
        cor_pls = warp_correlate_pallas(src, ref, x, y, group_dim)

    np.testing.assert_allclose(
        np.asarray(cor_pls), np.asarray(cor_xla), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("scan_r", [4, 16])
def test_pallas_warp_scan_r_variants(monkeypatch, scan_r):
    """Per-call scan width (_scan_r / FORCE_SCAN_R): numerics must be
    identical at any width — the spare zero rows absorb trip overrun, so
    widening only changes the trip schedule.  16 is the raw-stage4 routed
    width; 4 exercises a sub-default trip count."""
    from mvster_tpu.kernels import pallas_warp
    from mvster_tpu.kernels.cost_volume import build_cost_volume

    sample = plane_scene_sample(1)
    imgs = jnp.asarray(sample["imgs"])
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    args = (
        imgs[:, 0], [imgs[:, 1], imgs[:, 2]],
        composed[:, 0], [composed[:, 1], composed[:, 2]], hypo,
    )
    kw = dict(group_cor=True, group_dim=3, attn_temp=2.0)
    ref_out = build_cost_volume(*args, **kw, impl="xla")
    monkeypatch.setattr(pallas_warp, "FORCE_SCAN_R", scan_r)
    with pltpu.force_tpu_interpret_mode():
        pls_out = build_cost_volume(*args, **kw, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(pls_out), np.asarray(ref_out), rtol=1e-5, atol=1e-6
    )


def test_pallas_vmem_guard_falls_back_to_xla(monkeypatch):
    """Oversized feature maps must route impl='pallas' through the XLA path
    (round-1 review: pallas_warp_supported was never consulted)."""
    from mvster_tpu.kernels import cost_volume, pallas_warp

    sample = plane_scene_sample(2)
    imgs = jnp.asarray(sample["imgs"])
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    args = (
        imgs[:, 0], [imgs[:, 1]], composed[:, 0], [composed[:, 1]], hypo,
    )
    kw = dict(group_cor=True, group_dim=3, attn_temp=2.0)

    monkeypatch.setattr(pallas_warp, "MAX_FEATURE_BYTES", 1)  # force fallback

    def boom(*a, **k):
        raise AssertionError("guard bypassed: pallas kernel invoked")

    monkeypatch.setattr(pallas_warp, "warp_correlate_pallas", boom)
    out = cost_volume.build_cost_volume(*args, **kw, impl="pallas")
    ref_out = cost_volume.build_cost_volume(*args, **kw, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out))


def test_build_cost_volume_pallas_impl_matches():
    from mvster_tpu.kernels.cost_volume import build_cost_volume

    sample = plane_scene_sample(1)
    imgs = jnp.asarray(sample["imgs"])
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    args = (
        imgs[:, 0], [imgs[:, 1], imgs[:, 2]],
        composed[:, 0], [composed[:, 1], composed[:, 2]], hypo,
    )
    kw = dict(group_cor=True, group_dim=3, attn_temp=2.0)
    ref_out = build_cost_volume(*args, **kw, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        pls_out = build_cost_volume(*args, **kw, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(pls_out), np.asarray(ref_out), rtol=1e-5, atol=1e-6
    )


def test_pallas_warp_unpacked_width_and_batch():
    """Widths not divisible by the depth-group size take the unpacked lane
    layout; batch > 1 exercises the grid's batch dimension.  Both must
    match the XLA path (interpret mode)."""
    from mvster_tpu.core.sampling import grid_sample_zeros
    from mvster_tpu.kernels.pallas_warp import warp_correlate_pallas

    rng = np.random.default_rng(3)
    B, D, H, W, C = 2, 4, 32, 40, 6  # W=40 % (128//4=32) != 0 -> unpacked
    src = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = jnp.asarray(np.broadcast_to(
        np.stack([gx * 1.05 + 1.5 * k - 2 for k in range(D)])[None],
        (B, D, H, W)).astype(np.float32))
    y = jnp.asarray(np.broadcast_to(
        np.stack([gy * 0.95 + 0.5 * k + gx * 0.08 for k in range(D)])[None],
        (B, D, H, W)).astype(np.float32))

    ref_out = correlate(grid_sample_zeros(src, x, y), ref, True, 3)
    with pltpu.force_tpu_interpret_mode():
        got = warp_correlate_pallas(src, ref, x, y, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_out), rtol=1e-5, atol=1e-6
    )


def test_warp_pallas_warp_only_matches():
    """The warp-only output mode (training-forward primal) matches
    grid_sample_zeros to ulp (same taps/masks; multiply association in the
    weight products differs, so last-bit equality is not guaranteed)."""
    from mvster_tpu.core.sampling import grid_sample_zeros
    from mvster_tpu.kernels.pallas_warp import warp_pallas

    rng = np.random.default_rng(4)
    B, D, H, W, C = 1, 4, 64, 64, 5
    src = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = jnp.asarray(np.stack(
        [gx * 1.02 + 2 * k - 3 for k in range(D)])[None].astype(np.float32))
    y = jnp.asarray(np.stack(
        [gy * 0.97 + 0.6 * k + gx * 0.05 for k in range(D)])[None].astype(np.float32))
    ref_out = grid_sample_zeros(src, x, y)
    with pltpu.force_tpu_interpret_mode():
        got = warp_pallas(src, x, y)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_out), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("d,rp", [(4, 4), (4, 2), (8, 2)])
def test_pallas_warp_rowpacked_layouts(monkeypatch, d, rp):
    """The production rp>1 row-packed lane layouts (raw/mid stages pick
    rp up to 4 via _row_pack's size heuristic) must match the XLA path.
    The heuristic needs h >= 192 to engage — too slow for interpret mode —
    so force the layout directly; everything downstream (packing
    transposes, per-vreg metadata, kernel scan variants, unpacking) is the
    exact production code for those stages."""
    from mvster_tpu.kernels import pallas_warp
    from mvster_tpu.kernels.pallas_warp import warp_correlate_pallas

    monkeypatch.setattr(pallas_warp, "_row_pack", lambda dd, hh: rp)
    sample = plane_scene_sample(3)
    imgs = jnp.asarray(sample["imgs"])  # (1, 3, 64, 64, 3)
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), d, 64, 64)
    ref, src = imgs[:, 0], imgs[:, 1]
    warped = warp_src_feature(src, composed[:, 1], composed[:, 0], hypo)
    cor_xla = correlate(warped, ref, True, 3)

    x, y = plane_sweep_coords(composed[:, 1], composed[:, 0], hypo)
    with pltpu.force_tpu_interpret_mode():
        got, pred = warp_correlate_pallas(src, ref, x, y, 3, return_pred=True)
    assert bool(pred), "row-packed layout unexpectedly fell back to XLA"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(cor_xla), rtol=1e-5, atol=1e-6
    )


def test_pallas_warp_adaptive_chain_uses_fallback_variant(monkeypatch):
    """When the primary rp layout's window predicate fails but rp/2 holds,
    the lax.cond chain must run the rp/2 KERNEL (pred True, kernel
    numerics), not the XLA fallback — the graceful-degradation contract of
    wide-baseline geometry at wide images."""
    from mvster_tpu.kernels import pallas_warp
    from mvster_tpu.kernels.pallas_warp import (
        _coord_windows,
        warp_correlate_pallas,
    )

    monkeypatch.setattr(pallas_warp, "_row_pack", lambda dd, hh: 4)
    # At H=64 the default 12 MB budget caps the window at the padded
    # buffer height, which always covers any in-image span — shrink it to
    # a 64-row window (the raw-size regime, where the budget binds both
    # layouts at the same row count) so the rp=4 bands' source span
    # (b2=32 rows of 2.5x drift) overflows while rp=2's (16 rows) fits.
    monkeypatch.setattr(pallas_warp, "MAX_FEATURE_BYTES", 64 * 8 * 384 * 4)
    rng = np.random.default_rng(5)
    B, D, H, W, C = 1, 4, 64, 64, 6
    src = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = jnp.asarray(np.stack(
        [gx * 1.01 + k for k in range(D)])[None].astype(np.float32))
    y = jnp.asarray(np.stack(
        [gy * 2.5 - 20.0 + 1.5 * k for k in range(D)])[None].astype(np.float32))

    p4 = _coord_windows(C, x, y, rp=4)[2]
    p2 = _coord_windows(C, x, y, rp=2)[2]
    assert not bool(p4) and bool(p2), (
        f"geometry no longer splits the variants (p4={p4}, p2={p2}); "
        f"re-tune the vertical scale"
    )

    from mvster_tpu.core.sampling import grid_sample_zeros

    want = correlate(grid_sample_zeros(src, x, y), ref, True, 3)
    with pltpu.force_tpu_interpret_mode():
        got, pred = warp_correlate_pallas(src, ref, x, y, 3, return_pred=True)
    assert bool(pred), "chain should report a kernel variant ran"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_packed_plane_sweep_matches_coords():
    """Coords emitted directly in kernel lane layout must equal
    plane_sweep_coords + pack_lanes (the legacy entry's operands) to f32
    reassociation (the (rot @ pixel) dot products associate differently)."""
    from mvster_tpu.core.geometry import plane_sweep_rt
    from mvster_tpu.kernels.pallas_warp import (
        _layout,
        _pack_depth,
        _packed_plane_sweep,
    )

    sample = plane_scene_sample(4)
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    x, y = plane_sweep_coords(composed[:, 1], composed[:, 0], hypo)

    L = _layout(3, 4, 64, 64, rp=2)
    assert L["pack"]
    rot, trans = plane_sweep_rt(composed[:, 1], composed[:, 0])
    dpk = _pack_depth(hypo, L)
    xk, yk = _packed_plane_sweep(rot, trans, dpk, L, 64)
    # _pack_depth applies the same edge pad + lane transpose to any
    # (B, D, H, W) tensor, so it converts the reference coords too
    np.testing.assert_allclose(np.asarray(xk), np.asarray(_pack_depth(x, L)),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(_pack_depth(y, L)),
                               rtol=1e-5, atol=1e-3)


def test_build_cost_volume_packed_coords_matches():
    """build_cost_volume(pallas_coords='packed') — the geometry-direct
    entry — must match the XLA formulation end-to-end (interpret mode).
    Tolerance is one decade looser than the x/y-entry test: the packed
    emission reassociates the coordinate dot products (<= 1e-4 px), which
    shifts bilinear weights by the same order."""
    from mvster_tpu.kernels.cost_volume import build_cost_volume

    sample = plane_scene_sample(1)
    imgs = jnp.asarray(sample["imgs"])
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    args = (
        imgs[:, 0], [imgs[:, 1], imgs[:, 2]],
        composed[:, 0], [composed[:, 1], composed[:, 2]], hypo,
    )
    kw = dict(group_cor=True, group_dim=3, attn_temp=2.0)
    ref_out = build_cost_volume(*args, **kw, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        pls_out, fb = build_cost_volume(
            *args, **kw, impl="pallas", pallas_coords="packed",
            with_fallbacks=True,
        )
    assert int(fb) == 0, "packed-coords path unexpectedly fell back"
    np.testing.assert_allclose(
        np.asarray(pls_out), np.asarray(ref_out), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("rp", [1, 2])
def test_geom_entry_rowpacked_layouts(rp):
    """The geometry-direct entry across forced rp layout variants."""
    from mvster_tpu.core.sampling import grid_sample_zeros
    from mvster_tpu.kernels.pallas_warp import warp_correlate_pallas_geom

    sample = plane_scene_sample(3)
    imgs = jnp.asarray(sample["imgs"])
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    ref, src = imgs[:, 0], imgs[:, 1]
    x, y = plane_sweep_coords(composed[:, 1], composed[:, 0], hypo)
    cor_xla = correlate(grid_sample_zeros(src, x, y), ref, True, 3)

    with pltpu.force_tpu_interpret_mode():
        got, pred = warp_correlate_pallas_geom(
            src, ref, composed[:, 1], composed[:, 0], hypo, 3,
            return_pred=True, force_rp=rp,
        )
    assert bool(pred), "geom entry unexpectedly fell back to XLA"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(cor_xla), rtol=1e-4, atol=1e-5
    )


def test_geom_entry_xla_tail(monkeypatch):
    """When every packed layout's predicate fails, the geom entry's
    terminal branch computes the unpacked XLA path (flag False; numerics
    match the eager XLA reference to FMA-fusion noise — the branch body
    compiles under lax.cond, which fuses a*d+t differently)."""
    from mvster_tpu.core.sampling import grid_sample_zeros
    from mvster_tpu.kernels import pallas_warp
    from mvster_tpu.kernels.pallas_warp import warp_correlate_pallas_geom

    orig = pallas_warp.window_meta_packed

    def veto(*a, **k):
        meta, shift, _ = orig(*a, **k)
        return meta, shift, jnp.zeros((), bool)

    monkeypatch.setattr(pallas_warp, "window_meta_packed", veto)
    sample = plane_scene_sample(6)
    imgs = jnp.asarray(sample["imgs"])
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    ref, src = imgs[:, 0], imgs[:, 1]
    x, y = plane_sweep_coords(composed[:, 1], composed[:, 0], hypo)
    cor_xla = correlate(grid_sample_zeros(src, x, y), ref, True, 3)

    with pltpu.force_tpu_interpret_mode():
        got, pred = warp_correlate_pallas_geom(
            src, ref, composed[:, 1], composed[:, 0], hypo, 3,
            return_pred=True,
        )
    assert not bool(pred)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(cor_xla), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("attn_fuse_d", [True, False])
def test_fused_cost_volume_fallback_repacks(monkeypatch, attn_fuse_d):
    """The fused multi-view packed path: when a view's primary layout
    predicate fails it must route through the variant chain's XLA tail
    and REPACK into the primary layout — fallbacks counted, numerics
    matching the reference formulation in both attention modes."""
    from mvster_tpu.kernels import pallas_warp
    from mvster_tpu.kernels.cost_volume import build_cost_volume

    sample = plane_scene_sample(5)
    imgs = jnp.asarray(sample["imgs"])
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    args = (
        imgs[:, 0], [imgs[:, 1], imgs[:, 2]],
        composed[:, 0], [composed[:, 1], composed[:, 2]], hypo,
    )
    kw = dict(group_cor=True, group_dim=3, attn_temp=2.0,
              attn_fuse_d=attn_fuse_d)
    ref_out = build_cost_volume(*args, **kw, impl="xla")

    orig = pallas_warp.window_meta_packed

    def veto(*a, **k):
        meta, shift, _ = orig(*a, **k)
        return meta, shift, jnp.zeros((), bool)

    monkeypatch.setattr(pallas_warp, "window_meta_packed", veto)
    with pltpu.force_tpu_interpret_mode():
        out, fb = build_cost_volume(
            *args, **kw, impl="pallas", pallas_coords="packed",
            with_fallbacks=True,
        )
    assert int(fb) == 2, "vetoed predicates must count as fallbacks"
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_build_cost_volume_folded_layout_matches(impl):
    """out_layout='folded' must be a pure relayout of the bdhwc output:
    (B, D, H, W, G) -> (B, 1, H, W, D*G) with lanes ordered depth-major.

    On impl='pallas' the fused geom path emits folded lanes directly from
    packed space (fused_cost_volume_geom(folded=True)) — a different
    transpose route than the explicit bdhwc fold, so the equality is a
    real check, not a tautology.  This is the layout the folded reg2d
    (nn/reg.py) consumes when reg2d_fold routes (models/mvs4net.py)."""
    from mvster_tpu.kernels.cost_volume import build_cost_volume

    sample = plane_scene_sample(7)
    imgs = jnp.asarray(sample["imgs"])
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    args = (
        imgs[:, 0], [imgs[:, 1], imgs[:, 2]],
        composed[:, 0], [composed[:, 1], composed[:, 2]], hypo,
    )
    kw = dict(group_cor=True, group_dim=3, attn_temp=2.0, impl=impl)
    ctx = pltpu.force_tpu_interpret_mode() if impl == "pallas" else nullcontext()
    with ctx:
        bdhwc = build_cost_volume(*args, **kw)
        folded = build_cost_volume(*args, **kw, out_layout="folded")
    b, d, h, w, g = bdhwc.shape
    assert folded.shape == (b, 1, h, w, d * g)
    expect = jnp.transpose(bdhwc, (0, 2, 3, 1, 4)).reshape(b, 1, h, w, d * g)
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(expect), rtol=1e-6, atol=1e-6
    )
