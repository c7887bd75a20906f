"""Edge semantics: ObsMask rounding, cam 3-field depth lines, ckpt rotation."""

import os

import numpy as np

from mvster_tpu.eval.dtu_metric import points_in_obs_mask
from mvster_tpu.train.checkpoint import CheckpointManager


def test_obs_mask_matlab_rounding():
    """MATLAB round() is half-away-from-zero: (pts-bb)/res+1 == 1.5 -> voxel 2."""
    obs = np.zeros((3, 3, 3), np.uint8)
    obs[1, 0, 0] = 1  # voxel index 2 in MATLAB 1-based
    bb = np.array([[0.0, 0.0, 0.0], [3.0, 3.0, 3.0]])
    res = 1.0
    # point at exactly 0.5: (0.5/1)+1 = 1.5 -> MATLAB round = 2 -> obs[1,0,0]
    pts = np.array([[0.5, 0.0, 0.0]])
    assert points_in_obs_mask(pts, obs, bb, res)[0]
    # numpy half-to-even would give round(1.5) = 2 as well, but round(2.5)=2
    # (wrong); check the 1.5-away case: point at 1.5 -> 2.5 -> MATLAB 3
    obs2 = np.zeros((3, 3, 3), np.uint8)
    obs2[2, 0, 0] = 1
    pts = np.array([[1.5, 0.0, 0.0]])
    assert points_in_obs_mask(pts, obs2, bb, res)[0]


def test_general_eval_three_field_depth_line(tmp_path):
    """Cam files with 'dmin interval num_depth' recompute the interval
    (general_eval4.py:72-76 semantics)."""
    import cv2

    from mvster_tpu.data import find_dataset_def

    root = str(tmp_path)
    scan = "scanZ"
    os.makedirs(f"{root}/{scan}/images", exist_ok=True)
    os.makedirs(f"{root}/{scan}/cams", exist_ok=True)
    with open(f"{root}/{scan}/pair.txt", "w") as f:
        f.write("2\n0\n1 1 10\n1\n1 0 10\n")
    rng = np.random.default_rng(0)
    for v in range(2):
        img = (rng.uniform(size=(128, 128, 3)) * 255).astype(np.uint8)
        cv2.imwrite(f"{root}/{scan}/images/{v:08d}.jpg", img)
        with open(f"{root}/{scan}/cams/{v:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in np.eye(4):
                f.write(" ".join(map(str, row)) + "\n")
            f.write("\nintrinsic\n")
            for row in [[100, 0, 64], [0, 100, 64], [0, 0, 1]]:
                f.write(" ".join(map(str, row)) + "\n")
            # dmin=400, interval=2, num_depth=100 -> dmax=600,
            # recomputed interval = (600-400)/192 * 1.06
            f.write("\n400.0 2.0 100\n")

    ds = find_dataset_def("general_eval")(
        root, [scan], "test", 2, interval_scale=1.06, max_h=128, max_w=128
    )
    s = ds[0]
    dv = s["depth_values"]
    assert len(dv) == 192
    np.testing.assert_allclose(dv[0], 400.0)
    # f32 accumulation: compare at float32 precision
    np.testing.assert_allclose(dv[1] - dv[0], (600 - 400) / 192 * 1.06, rtol=2e-5)


def test_checkpoint_rotation_and_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    state = {"w": np.arange(4, dtype=np.float32), "epoch": 0}
    for step in (10, 20, 30):
        state["epoch"] = step // 10
        mgr.save(step, state)
    assert mgr.all_steps() == [20, 30]  # keep=2 rotated out step 10
    restored, step = mgr.restore({"w": np.zeros(4, np.float32), "epoch": 0})
    assert step == 30 and restored["epoch"] == 3
    np.testing.assert_array_equal(restored["w"], state["w"])
