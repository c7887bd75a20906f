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


def test_reduce_points_enforces_min_spacing():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 5, size=(4000, 3)).astype(np.float32)
    red = reduce_points(pts, dst=0.3, seed=1)
    assert 0 < len(red) < len(pts)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(red).query(red, k=2)
    assert d[:, 1].min() >= 0.3 - 1e-5


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
