"""Smoke-drive the inference back half: filter -> fuse -> PLY -> DTU metric.

Synthetic 3-camera scene observing a fronto-parallel plane; runs the
device-side geometric filter, fuses a colored cloud, writes/reads binary PLY,
and scores the cloud against a synthetic GT with the native metric kernels.
"""

import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np

from mvster_tpu.eval.dtu_metric import evaluate_scan
from mvster_tpu.infer.fusion import fuse_scene
from mvster_tpu.infer.ply import read_ply, write_ply


def main():
    h, w, z = 64, 80, 600.0
    focal = 100.0
    k = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
    views = [0, 1, 2]
    extr = {}
    for v in views:
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = -15.0 * v
        extr[v] = e
    depths = {v: np.full((h, w), z, np.float32) for v in views}
    # corrupt a block in view 2 to exercise rejection
    depths[2][:16, :16] *= 1.3
    confs = {v: np.ones((h, w), np.float32) for v in views}
    intr = {v: k.copy() for v in views}
    imgs = {v: np.full((h, w, 3), 0.6, np.float32) for v in views}
    pair_data = [(0, [1, 2]), (1, [0, 2]), (2, [0, 1])]

    xyz, rgb, masks = fuse_scene(
        pair_data, depths, confs, intr, extr, imgs, conf_thresh=0.5, thres_view=2
    )
    print(f"fused {len(xyz)} points; z-range [{xyz[:,2].min():.2f}, {xyz[:,2].max():.2f}]")
    assert len(xyz) > 3000
    assert abs(xyz[:, 2].mean() - z) < 1.0

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/fused.ply"
        write_ply(path, xyz, rgb)
        back, back_rgb = read_ply(path)
        assert len(back) == len(xyz)
        print(f"PLY round-trip OK ({path.split('/')[-1]}, {len(back)} pts)")

    # score against synthetic GT: the true plane sampled at 0.5 spacing
    gx, gy = np.meshgrid(
        np.arange(-400, 400, 0.5), np.arange(-200, 200, 0.5)
    )
    stl = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, z)], 1).astype(
        np.float32
    )
    bb = np.array([xyz.min(0) - 5, xyz.max(0) + 5])
    obs = np.ones((64, 64, 64), np.uint8)
    res = float((bb[1] - bb[0]).max() / 60)
    plane = np.array([0, 0, 1, -z + 50])  # everything above
    stats = evaluate_scan(xyz, stl, obs, bb, res, plane, dst=0.2)
    print("metric:", {k: round(v, 4) for k, v in stats.items() if isinstance(v, float)})
    assert stats["acc_mean"] < 0.3
    print("OK")


if __name__ == "__main__":
    main()
