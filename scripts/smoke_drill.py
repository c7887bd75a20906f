"""Synthetic rehearsal of the real-data drill (scripts/real_data_drill.sh).

Exercises the EXACT chain that will score the released reference checkpoint
the day data appears: a genuine torch .ckpt (random-init reference-format
state dict) -> convert_torch_ckpt CLI -> tools/test.py inference + fusion ->
--dtu_gt_dir Python DTU metric against a synthetic SampleSet (stl PLY +
ObsMask/Plane .mat files).  Asserts dtu_metrics.json lands with finite
numbers.  Mirrors the reference flow test_mvs4.py:465-488.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from smoke_test_cli import write_scan  # noqa: E402
from mvster_tpu.infer.ply import write_ply  # noqa: E402


def write_gt_dir(root, scan_id=1, h=128, w=128, z=600.0, focal=None):
    """Synthetic SampleSet 'MVS Data' layout for one scan.

    GT surface = the textured plane of smoke_test_cli.write_scan: world
    points at depth z across the reference frustum; ObsMask covers the whole
    bounding box; ground plane sits below the surface.
    """
    if focal is None:
        focal = 1.1 * w
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    x = (us - w / 2) / focal * z
    y = (vs - h / 2) / focal * z
    stl = np.stack([x, y, np.full_like(x, z)], -1).reshape(-1, 3).astype(
        np.float32
    )
    os.makedirs(f"{root}/Points/stl", exist_ok=True)
    os.makedirs(f"{root}/ObsMask", exist_ok=True)
    write_ply(f"{root}/Points/stl/stl{scan_id:03d}_total.ply", stl)

    from scipy.io import savemat

    lo = stl.min(0) - 50.0
    hi = stl.max(0) + 50.0
    res = 10.0
    shape = np.ceil((hi - lo) / res).astype(int) + 2
    savemat(
        f"{root}/ObsMask/ObsMask{scan_id}_10.mat",
        {
            "ObsMask": np.ones(shape, np.uint8),
            "BB": np.stack([lo, hi]).astype(np.float64),
            "Res": np.float64(res),
        },
    )
    savemat(
        f"{root}/ObsMask/Plane{scan_id}.mat",
        {"P": np.array([0.0, 0.0, 1.0, -(z - 100.0)], np.float64).reshape(4, 1)},
    )


def main():
    import torch

    sys.path.insert(0, "/root/reference")
    from tests.test_model_parity import build_torch_model

    tmp = tempfile.mkdtemp(prefix="smoke_drill_")
    scan = write_scan(tmp)  # scan1: textured plane, 3 views, 128x128
    gt_dir = os.path.join(tmp, "gt")
    write_gt_dir(gt_dir)
    outdir = os.path.join(tmp, "out")
    os.makedirs(outdir, exist_ok=True)

    # step 0: a genuine reference-format torch checkpoint (random init)
    tmodel = build_torch_model(mono=False)
    torch_ckpt = os.path.join(tmp, "reference.ckpt")
    torch.save({"epoch": 0, "model": tmodel.state_dict()}, torch_ckpt)

    # step 1: convert (the CLI the drill runs)
    from mvster_tpu.tools import convert_torch_ckpt

    msgpack = os.path.join(tmp, "weights.msgpack")
    convert_torch_ckpt.main([torch_ckpt, msgpack])

    # step 2+3: inference + fusion + metric (one tools/test.py invocation)
    from mvster_tpu.tools import test as test_tool

    test_tool.main([
        "--testpath", tmp, "--testlist", scan, "--loadckpt", msgpack,
        "--outdir", outdir, "--dataset", "general_eval", "--num_view", "3",
        "--max_h", "128", "--max_w", "128", "--conf", "0.0",
        "--thres_view", "1", "--group_cor", "--inverse_depth",
        "--attn_temp", "2", "--dtu_gt_dir", gt_dir,
    ])

    metrics_path = os.path.join(outdir, "dtu_metrics.json")
    assert os.path.exists(metrics_path), "metric stage did not run"
    metrics = json.load(open(metrics_path))
    for k in ("accuracy", "completeness", "overall"):
        assert k in metrics, f"missing {k}"
    per_scan = metrics["per_scan"]
    assert len(per_scan) == 1 and per_scan[0]["scan"] == 1
    # a random-init network yields garbage depths, so the 20 mm outlier cut
    # may leave empty inlier sets -> NaN means (exactly what the MATLAB
    # pipeline reports there); the assertion is the CHAIN, plus that the
    # clouds actually flowed through reduction and distance kernels
    assert per_scan[0]["n_data"] > 0 and per_scan[0]["n_stl"] > 0
    print(
        f"drill rehearsal: convert -> infer -> fuse -> metric chain complete; "
        f"scored {per_scan[0]['n_data']} fused vs {per_scan[0]['n_stl']} GT "
        f"points (acc={metrics['accuracy']} comp={metrics['completeness']}; "
        f"random-init weights, magnitudes meaningless)"
    )
    print("OK")


if __name__ == "__main__":
    main()
