"""Coverage for profiling/logging/loader-workers/fix_res odds and ends."""

import json
import os

import numpy as np

import jax.numpy as jnp

from mvster_tpu.train.logging import MetricLogger
from mvster_tpu.utils.profiling import Timer, device_memory_stats
from mvster_tpu.utils.debug import DebugDumper


def test_timer_blocks_and_measures():
    with Timer() as t:
        x = t.block_on(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
    assert t.elapsed is not None and t.elapsed > 0
    assert float(x[0, 0]) == 256.0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU


def test_metric_logger_jsonl_and_images(tmp_path):
    logger = MetricLogger(str(tmp_path), enable_tb=False)
    logger.scalars("train", {"loss": jnp.float32(1.5), "x": 2.0}, step=7)
    logger.images("train", {"depth": np.random.rand(2, 8, 8)}, step=7)  # no TB: no-op
    logger.close()
    rows = [json.loads(ln) for ln in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["loss"] == 1.5 and rows[0]["step"] == 7


def test_debug_dumper(tmp_path):
    d = DebugDumper(str(tmp_path))
    outputs = {
        "stage1": {
            "attn_weight": np.random.rand(1, 4, 8, 8).astype(np.float32),
            "hypo_depth": np.random.rand(1, 4, 8, 8).astype(np.float32),
            "depth": np.random.uniform(400, 900, (1, 8, 8)).astype(np.float32),
        }
    }
    d.dump_stage_outputs(outputs)
    assert os.path.exists(tmp_path / "stage1_attn_weight.npy")
    assert os.path.exists(tmp_path / "stage1_depth.jpg")


class _ToyDataset:  # module-level: must pickle into worker processes
    def __len__(self):
        return 6

    def __getitem__(self, i):
        rng = np.random.default_rng(i)  # index-seeded: deterministic
        return {"x": rng.normal(size=(4, 4)).astype(np.float32)}


def test_loader_process_workers(tmp_path):
    """num_workers>0 decodes in subprocesses; output matches in-process."""
    from mvster_tpu.data import MVSLoader

    ds = _ToyDataset()
    sync = list(MVSLoader(ds, 2, prefetch=0))
    procs = list(MVSLoader(ds, 2, prefetch=0, num_workers=2))
    assert len(sync) == len(procs)
    for a, b in zip(sync, procs):
        np.testing.assert_array_equal(a["x"], b["x"])


def test_general_eval_fix_res_pins_resolution(tmp_path):
    """fix_res pins the FIRST sample's resolution for the whole dataset."""
    import cv2

    from mvster_tpu.data import find_dataset_def

    root = str(tmp_path)
    scan = "scanA"
    os.makedirs(f"{root}/{scan}/images", exist_ok=True)
    os.makedirs(f"{root}/{scan}/cams", exist_ok=True)
    rng = np.random.default_rng(0)
    sizes = [(128, 128), (192, 128)]  # different per view
    with open(f"{root}/{scan}/pair.txt", "w") as f:
        f.write("2\n0\n1 1 10\n1\n1 0 10\n")
    for v, (h, w) in enumerate(sizes):
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(f"{root}/{scan}/images/{v:08d}.jpg", img)
        with open(f"{root}/{scan}/cams/{v:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in np.eye(4):
                f.write(" ".join(map(str, row)) + "\n")
            f.write("\nintrinsic\n")
            for row in [[100, 0, w / 2], [0, 100, h / 2], [0, 0, 1]]:
                f.write(" ".join(map(str, row)) + "\n")
            f.write("\n425.0 2.5\n")

    ds_cls = find_dataset_def("general_eval")
    ds = ds_cls(root, [scan], "test", 2, max_h=192, max_w=192, fix_res=True)
    s0 = ds[0]
    s1 = ds[1]
    # all views of all samples share the first sample's pinned resolution
    assert s0["imgs"].shape == s1["imgs"].shape
