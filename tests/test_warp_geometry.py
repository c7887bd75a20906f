"""Adversarial-geometry coverage for the Pallas warp kernel's feasibility
predicate.

Round-2 verdict: the kernel's static windows were only ever probed on
tests/helpers.synthetic_sample cameras (small random rotations + random
translations).  Real MVS rigs are *converging*: cameras sit on an arc and
look AT the object (DTU: ~65 positions on a sphere sector of radius
~650 mm, f = 2892.33 px at 1600 wide, depth 425-935 mm — reference
datasets/dtu_yao4.py + scan cam files).  This file sweeps look-at rigs at
DTU-scale intrinsics/baselines through the cascade's hypothesis schedule
and asserts the EXACT production predicate (pallas_warp.warp_predicate ==
the _coord_windows call _warp_impl makes) holds, i.e. production forwards
run fully on the kernel; plus a graceful-degradation check that a
predicate-violating geometry still returns XLA-exact results through the
lax.cond fallback.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mvster_tpu.core.geometry import plane_sweep_coords
from mvster_tpu.core.hypothesis import init_inverse_range, schedule_inverse_range
from mvster_tpu.kernels.pallas_warp import warp_predicate

# dtu_default cascade facts: FPN channels / hypothesis counts / interval
# ratios per stage (models/mvs4net.py MVS4NetConfig)
STAGE_C = (64, 32, 16, 8)
STAGE_D = (8, 8, 4, 4)
STAGE_SPLIT = (0.5, 0.5, 0.5, 1.0)
DMIN, DMAX = 425.0, 935.0


def lookat_rig(h, w, angle_deg, elev_deg=0.0, z0=650.0, focal=None):
    """Converging two-camera rig: ref at origin looking +z at the object
    center (0, 0, z0); the source camera is the ref position orbited about
    the center by angle_deg (azimuth) + elev_deg (elevation), re-aimed at
    the center — the canonical MVS acquisition geometry.

    Returns (src_proj, ref_proj) composed (1, 4, 4) K@E projections at
    image size (h, w) with DTU-scaled intrinsics (f = 2892.33 * w / 1600).
    """
    if focal is None:
        focal = 2892.33 * w / 1600.0
    center = np.array([0.0, 0.0, z0])

    def w2c(cam_center):
        z_cam = center - cam_center
        z_cam = z_cam / np.linalg.norm(z_cam)
        x_cam = np.cross([0.0, 1.0, 0.0], z_cam)
        x_cam = x_cam / np.linalg.norm(x_cam)
        y_cam = np.cross(z_cam, x_cam)
        extr = np.eye(4)
        extr[:3, :3] = np.stack([x_cam, y_cam, z_cam])
        extr[:3, 3] = -extr[:3, :3] @ cam_center
        return extr

    az, el = np.radians(angle_deg), np.radians(elev_deg)
    # orbit the ref position (center + (0,0,-z0)) about the center
    offset = z0 * np.array(
        [np.sin(az) * np.cos(el), np.sin(el), -np.cos(az) * np.cos(el)]
    )
    intr = np.eye(4)
    intr[:3, :3] = [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]]
    ref = intr @ w2c(np.array([0.0, 0.0, 0.0]))
    src = intr @ w2c(center + offset)
    return (
        jnp.asarray(src[None].astype(np.float32)),
        jnp.asarray(ref[None].astype(np.float32)),
    )


def cascade_hypos(h, w, gt_depth_fn):
    """Per-stage hypothesis grids as the production cascade computes them,
    assuming the WTA depth converges to gt_depth_fn(y, x) (mvs4net.py
    _stage: inverse_min/max = 1/d -+ split * itv, schedule_inverse_range).
    """
    hypos = []
    inv_min = inv_max = None
    for s in range(4):
        hs, ws = h // 2 ** (3 - s), w // 2 ** (3 - s)
        if s == 0:
            dv = jnp.asarray([[DMIN, DMAX]], jnp.float32)
            hypo = init_inverse_range(dv, STAGE_D[s], hs, ws)
        else:
            hypo = schedule_inverse_range(
                inv_min, inv_max, STAGE_D[s], hs, ws
            )
        hypos.append(hypo)
        yy, xx = np.meshgrid(
            np.arange(hs) / max(hs - 1, 1), np.arange(ws) / max(ws - 1, 1),
            indexing="ij",
        )
        depth = jnp.asarray(gt_depth_fn(yy, xx)[None].astype(np.float32))
        itv = 1.0 / hypo[:, 2] - 1.0 / hypo[:, 1]
        inv_min = 1.0 / depth + STAGE_SPLIT[s] * itv
        inv_max = 1.0 / depth - STAGE_SPLIT[s] * itv
    return hypos


# DTU pair.txt source views for a reference span single-digit to ~20-degree
# baselines; elevation rows differ by ~10 degrees.  The tilted plane keeps
# the scheduled windows spatially varying (a flat plane is too easy).
RIGS = [
    pytest.param(3.0, 0.0, id="az3"),
    pytest.param(6.0, 0.0, id="az6"),
    pytest.param(10.0, 0.0, id="az10"),
    pytest.param(15.0, 5.0, id="az15-el5"),
    pytest.param(20.0, 10.0, id="az20-el10"),
    pytest.param(-12.0, -8.0, id="az-12-el-8"),
]


@pytest.mark.parametrize("az,el", RIGS)
def test_predicate_holds_on_dtu_mid_rigs(az, el):
    h, w = 512, 640
    hypos = cascade_hypos(
        h, w, lambda yy, xx: 550.0 + 250.0 * xx + 80.0 * yy
    )
    for s in range(4):
        src, ref = lookat_rig(h // 2 ** (3 - s), w // 2 ** (3 - s), az, el)
        x, y = plane_sweep_coords(src, ref, hypos[s])
        pred = bool(warp_predicate(STAGE_C[s], x, y))
        assert pred, (
            f"stage{s + 1} predicate fails at az={az} el={el}: production "
            f"inference would silently degrade to the XLA warp"
        )


def test_predicate_holds_on_dtu_raw_rigs():
    """Raw eval size (1152x1600, the snapped 1200x1600) at a mid-strength
    and a wide baseline.  With the round-2 fixed window tiers even
    az=10/el=5 fell back at raw stage 4 (the 11x-slower-on-XLA stage); the
    budget-based window must hold through az=15/el=8 at every stage."""
    h, w = 1152, 1600
    hypos = cascade_hypos(
        h, w, lambda yy, xx: 500.0 + 300.0 * xx + 100.0 * yy
    )
    for az, el in [(6.0, 0.0), (10.0, 5.0), (15.0, 8.0)]:
        for s in range(4):
            src, ref = lookat_rig(h // 2 ** (3 - s), w // 2 ** (3 - s), az, el)
            x, y = plane_sweep_coords(src, ref, hypos[s])
            assert bool(warp_predicate(STAGE_C[s], x, y)), (
                f"raw stage{s + 1} predicate fails at az={az} el={el}"
            )
    # beyond the envelope (az=20, el=10 — wider than DTU pair.txt sources):
    # stages 2-4 still hold; stage 1 (64-channel window, tightest VMEM
    # budget) may fall back — bounded cost (~5 ms/view) and now observable
    hypos = cascade_hypos(h, w, lambda yy, xx: 500.0 + 300.0 * xx + 100.0 * yy)
    for s in range(1, 4):
        src, ref = lookat_rig(h // 2 ** (3 - s), w // 2 ** (3 - s), 20.0, 10.0)
        x, y = plane_sweep_coords(src, ref, hypos[s])
        assert bool(warp_predicate(STAGE_C[s], x, y)), (
            f"raw stage{s + 1} predicate fails at az=20 el=10"
        )


def test_infeasible_geometry_degrades_gracefully():
    """A geometry that violates the static windows must take the lax.cond
    XLA path and still match the XLA formulation exactly."""
    from mvster_tpu.core.sampling import grid_sample_zeros
    from mvster_tpu.kernels.cost_volume import correlate
    from mvster_tpu.kernels.pallas_warp import warp_correlate_pallas

    rng = np.random.default_rng(0)
    B, D, H, W, C = 1, 4, 16, 512, 6
    src = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # 150-px horizontal disparity step per hypothesis: the packed vreg's
    # x-span (3 * 150 + 32-column group) exceeds the 3-vreg lane window
    # DETERMINISTICALLY (span > nk * LANE regardless of alignment)
    x = jnp.asarray((np.broadcast_to(gx[None], (D, H, W))
                     + 150.0 * np.arange(D)[:, None, None] - 220.0
                     )[None].astype(np.float32))
    y = jnp.asarray(np.broadcast_to(
        (gy * 1.0)[None, None], (B, D, H, W)).astype(np.float32))
    assert not bool(warp_predicate(C, x, y)), "meant to violate the windows"

    ref_out = correlate(grid_sample_zeros(src, x, y), ref, True, 3)
    with pltpu.force_tpu_interpret_mode():
        got = warp_correlate_pallas(src, ref, x, y, 3)
    # same formulation through the lax.cond fallback; tolerance covers XLA
    # fusion/reduction-order float noise vs the eager reference expression
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_out), rtol=1e-5, atol=1e-6
    )


def test_fallback_observability_counts():
    """The lax.cond predicate is threaded out of the jitted call
    (return_pred=True / build_cost_volume with_fallbacks=True) so callers
    can count silent XLA degradations — tools/test.py + smoke_forward
    surface the count as the "warp_fallbacks" model output."""
    import jax

    from mvster_tpu.kernels import pallas_warp
    from mvster_tpu.kernels.cost_volume import build_cost_volume

    rng = np.random.default_rng(1)
    B, D, H, W, C = 1, 4, 16, 512, 4
    src = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ok_x = jnp.asarray(np.broadcast_to(gx[None, None], (B, D, H, W)).astype(np.float32))
    ok_y = jnp.asarray(np.broadcast_to(gy[None, None], (B, D, H, W)).astype(np.float32))
    # deterministic x-window violation (see the graceful-degradation test)
    bad_x = jnp.asarray((np.broadcast_to(gx[None], (D, H, W))
                         + 150.0 * np.arange(D)[:, None, None] - 220.0
                         )[None].astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        fn = jax.jit(
            lambda s, r, xx, yy: pallas_warp.warp_correlate_pallas(
                s, r, xx, yy, 2, interpret=True, return_pred=True
            )
        )
        _, pred_ok = fn(src, ref, ok_x, ok_y)
        _, pred_bad = fn(src, ref, bad_x, ok_y)
        assert bool(pred_ok) and not bool(pred_bad)

        # build_cost_volume aggregates (1 - pred) over source views into the
        # int32 the model returns as "warp_fallbacks"
        hypo = jnp.ones((B, D, H, W), jnp.float32) * 600.0
        eye = jnp.eye(4, dtype=jnp.float32)[None]
        intr = jnp.asarray(
            [[[100.0, 0, W / 2, 0], [0, 100.0, H / 2, 0],
              [0, 0, 1, 0], [0, 0, 0, 1]]], jnp.float32
        )
        proj = intr @ eye
        _, fb = build_cost_volume(
            ref, [src, src], proj, [proj, proj], hypo,
            group_cor=True, group_dim=2, impl="pallas", with_fallbacks=True,
        )
        assert int(fb) == 0, "identity rig must run fully on-kernel"
        _, fb_xla = build_cost_volume(
            ref, [src, src], proj, [proj, proj], hypo,
            group_cor=True, group_dim=2, impl="xla", with_fallbacks=True,
        )
        assert int(fb_xla) == 0, "impl=xla is not a fallback"
