"""Fusion filter + DTU metric tests on synthetic geometry."""

import numpy as np
import pytest

import jax.numpy as jnp

from mvster_tpu.infer.fusion import fuse_scene, geometric_filter
from mvster_tpu.infer.ply import read_ply, write_ply
from mvster_tpu.eval.dtu_metric import (
    evaluate_scan,
    nn_distances,
    reduce_points,
)


def make_plane_scene(h=32, w=40, z=600.0, baseline=20.0):
    """Two cameras viewing a fronto-parallel plane at depth z.

    Returns dicts keyed by view id: depth, conf, K, E (world = cam0 frame).
    """
    focal = 50.0
    k = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
    e0 = np.eye(4, dtype=np.float32)
    e1 = np.eye(4, dtype=np.float32)
    e1[0, 3] = -baseline  # camera shifted +x in world

    # plane at world z: depth in cam0 = z everywhere; in cam1 also z
    # (pure translation along x keeps depth constant)
    depth0 = np.full((h, w), z, np.float32)
    depth1 = np.full((h, w), z, np.float32)
    intr = {0: k, 1: k.copy()}
    extr = {0: e0, 1: e1}
    depths = {0: depth0, 1: depth1}
    confs = {0: np.ones((h, w), np.float32), 1: np.ones((h, w), np.float32)}
    return depths, confs, intr, extr


def test_geometric_filter_consistent_plane_passes():
    depths, confs, intr, extr = make_plane_scene()
    final, depth_avg, geo, photo = geometric_filter(
        jnp.asarray(depths[0]), jnp.asarray(confs[0]),
        jnp.asarray(intr[0]), jnp.asarray(extr[0]),
        jnp.asarray(depths[1])[None], jnp.asarray(intr[1])[None],
        jnp.asarray(extr[1])[None],
        conf_thresh=0.5, thres_view=1,
    )
    final = np.asarray(final)
    h, w = final.shape
    # pixels whose projection lands inside the source view must be inliers
    # (plane projects with ~1.7px disparity at this baseline/depth)
    interior = final[:, 3 : w - 3]
    assert interior.mean() > 0.99, interior.mean()
    np.testing.assert_allclose(
        np.asarray(depth_avg)[final], 600.0, rtol=1e-4
    )


def test_geometric_filter_rejects_inconsistent_depth():
    depths, confs, intr, extr = make_plane_scene()
    bad = depths[1].copy()
    bad[:, :20] *= 1.25  # >1% relative error in the left half
    final_good, _, _, _ = geometric_filter(
        jnp.asarray(depths[0]), jnp.asarray(confs[0]),
        jnp.asarray(intr[0]), jnp.asarray(extr[0]),
        jnp.asarray(depths[1])[None], jnp.asarray(intr[1])[None],
        jnp.asarray(extr[1])[None], thres_view=1,
    )
    final_bad, _, _, _ = geometric_filter(
        jnp.asarray(depths[0]), jnp.asarray(confs[0]),
        jnp.asarray(intr[0]), jnp.asarray(extr[0]),
        jnp.asarray(bad)[None], jnp.asarray(intr[1])[None],
        jnp.asarray(extr[1])[None], thres_view=1,
    )
    assert np.asarray(final_bad).sum() < np.asarray(final_good).sum() * 0.7


def test_fuse_scene_produces_plane_points(tmp_path):
    depths, confs, intr, extr = make_plane_scene()
    pair_data = [(0, [1]), (1, [0])]
    imgs = {v: np.full((32, 40, 3), 0.5, np.float32) for v in (0, 1)}
    xyz, rgb, masks = fuse_scene(
        pair_data, depths, confs, intr, extr, imgs, conf_thresh=0.5, thres_view=1
    )
    assert len(xyz) > 1000
    np.testing.assert_allclose(xyz[:, 2], 600.0, rtol=1e-4)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, xyz, rgb)
    rxyz, rrgb = read_ply(path)
    np.testing.assert_allclose(rxyz, xyz, rtol=1e-6)
    assert rrgb is not None and (rrgb == rgb).all()


def test_fuse_scan_tanks_layout(tmp_path):
    """tools/test.fuse_scan handles the tanks on-disk layout (round-1 gap:
    fusion was gated to general_* datasets; reference pcd_filter runs over
    any testlist, test_mvs4.py:424-455)."""
    from argparse import Namespace

    from mvster_tpu.data.common import write_cam_file
    from mvster_tpu.data.pfm import write_pfm
    from mvster_tpu.tools.test import fuse_scan, fusion_scan_list
    from mvster_tpu.data.tanks import INTERMEDIATE
    import cv2
    import os

    depths, confs, intr, extr = make_plane_scene()
    scan = "Family"
    testpath = tmp_path / "data"
    outdir = tmp_path / "out"
    # pair.txt lives under the split dir in the tanks layout
    pair_dir = testpath / "intermediate" / scan
    os.makedirs(pair_dir)
    with open(pair_dir / "pair.txt", "w") as f:
        f.write("2\n0\n1 1 100\n1\n1 0 100\n")
    # inference artifacts in the outdir layout tools/test.py writes
    for sub in ("cams", "depth_est", "confidence", "images"):
        os.makedirs(outdir / scan / sub)
    for vid in (0, 1):
        intr4 = np.zeros((4, 4), np.float32)
        intr4[:3, :3] = intr[vid]
        write_cam_file(
            str(outdir / scan / f"cams/{vid:08d}_cam.txt"), extr[vid], intr4
        )
        write_pfm(str(outdir / scan / f"depth_est/{vid:08d}.pfm"), depths[vid])
        write_pfm(str(outdir / scan / f"confidence/{vid:08d}.pfm"), confs[vid])
        cv2.imwrite(
            str(outdir / scan / f"images/{vid:08d}.jpg"),
            np.full((32, 40, 3), 128, np.uint8),
        )

    args = Namespace(
        dataset="tanks", split="intermediate", testpath=str(testpath),
        outdir=str(outdir), conf=0.5, thres_view=1,
    )
    assert fusion_scan_list(args, ["all"]) == INTERMEDIATE
    ply_path = fuse_scan(args, scan)
    assert ply_path.endswith("Family.ply") and os.path.exists(ply_path)
    xyz, _ = read_ply(ply_path)
    assert len(xyz) > 500
    np.testing.assert_allclose(xyz[:, 2], 600.0, rtol=1e-3)


def test_reduce_points_enforces_min_spacing():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 5, size=(4000, 3)).astype(np.float32)
    red = reduce_points(pts, dst=0.3, seed=1)
    assert 0 < len(red) < len(pts)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(red).query(red, k=2)
    assert d[:, 1].min() >= 0.3 - 1e-5


def test_metric_kernels_at_dtu_scale_extent():
    """0.2 mm cells over a ~1 m extent must not allocate a dense cell grid
    (the round-1 dense-CSR grid was ~1e11 cells at this operating point and
    std::bad_alloc'd — caught by the real-data drill rehearsal)."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(0.0, 1000.0, size=(200_000, 3)).astype(np.float32)
    red = reduce_points(pts, dst=0.2, seed=1)
    assert len(red) > 0
    d = nn_distances(pts[:1000], red, max_dist=60.0, accurate_radius=25.0)
    assert np.isfinite(d).all() and (d <= 60.0).all()


def test_nn_distances_clamped():
    a = np.zeros((1, 3), np.float32)
    b = np.array([[100.0, 0, 0]], np.float32)
    assert nn_distances(a, b, max_dist=60.0)[0] == 60.0
    b = np.array([[3.0, 4.0, 0.0]], np.float32)
    np.testing.assert_allclose(nn_distances(a, b, 60.0)[0], 5.0, rtol=1e-6)


def test_evaluate_scan_perfect_cloud():
    rng = np.random.default_rng(1)
    stl = rng.uniform(0, 50, size=(3000, 3)).astype(np.float32)
    obs_mask = np.ones((30, 30, 30), np.uint8)
    bb = np.array([[-5, -5, -5], [55, 55, 55]], np.float64)
    res = 2.0
    plane = np.array([0, 0, 1, 100.0])  # everything above
    stats = evaluate_scan(stl.copy(), stl, obs_mask, bb, res, plane, dst=0.05)
    assert stats["acc_mean"] < 0.06
    assert stats["comp_mean"] < 0.1


def test_error_cloud_objs(tmp_path):
    """BaseEval2Obj_web.m equivalent: per-scan colored error OBJ dumps."""
    rng = np.random.default_rng(2)
    stl = rng.uniform(0, 50, size=(500, 3)).astype(np.float32)
    obs_mask = np.ones((30, 30, 30), np.uint8)
    bb = np.array([[-5, -5, -5], [55, 55, 55]], np.float64)
    plane = np.array([0, 0, 1, -25.0])  # half of the points below the plane
    out = str(tmp_path / "vis")
    evaluate_scan(stl.copy(), stl, obs_mask, bb, 2.0, plane, dst=0.05,
                  error_obj_dir=out, scan_id=9)
    for name in ("mvsnet2Stl_9.obj", "Stl2mvsnet_9.obj"):
        lines = open(f"{out}/{name}").read().splitlines()
        assert lines and all(ln.startswith("v ") for ln in lines)
        vals = np.array([ln.split()[1:] for ln in lines], np.float64)
        assert vals.shape[1] == 6  # x y z r g b
        assert (vals[:, 3:] >= 0).all() and (vals[:, 3:] <= 1).all()
    # a perfect in-mask cloud colors white (dist 0), below-plane GT colors blue
    stl2 = np.array([ln.split()[1:] for ln in
                     open(f"{out}/Stl2mvsnet_9.obj").read().splitlines()],
                    np.float64)
    below = stl2[:, 2] < 25.0
    assert below.any() and np.allclose(stl2[below, 3:], [0, 0, 1], atol=1e-6)
    assert np.allclose(stl2[~below, 3:], [1, 1, 1], atol=1e-6)
