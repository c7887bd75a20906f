"""Data layer tests: PFM round-trip, cam parsing, DTU loader on a synthetic tree."""

import os

import numpy as np
import pytest

from mvster_tpu.data import MVSLoader, find_dataset_def
from mvster_tpu.data.common import (
    nearest_resize,
    read_cam_file,
    read_pair_file,
    stage_projections,
)
from mvster_tpu.data.pfm import read_pfm, write_pfm


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(13, 17)).astype(np.float32)
    path = str(tmp_path / "x.pfm")
    write_pfm(path, img)
    back, scale = read_pfm(path)
    np.testing.assert_array_equal(back, img)
    assert scale == 1.0


def test_pfm_matches_reference_reader(tmp_path):
    """Cross-check our PFM bytes against the reference reader."""
    import sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("no reference")
    sys.path.insert(0, "/root/reference")
    from datasets.data_io import read_pfm as ref_read

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 900, size=(8, 10)).astype(np.float32)
    path = str(tmp_path / "y.pfm")
    write_pfm(path, img)
    ref_img, _ = ref_read(path)
    np.testing.assert_array_equal(np.asarray(ref_img), img)


def test_nearest_resize_matches_cv2():
    import cv2

    rng = np.random.default_rng(2)
    img = rng.normal(size=(32, 40)).astype(np.float32)
    for oh, ow in [(16, 20), (8, 10), (4, 5)]:
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_NEAREST)
        ours = nearest_resize(img, oh, ow)
        np.testing.assert_array_equal(ours, ref)


def make_dtu_tree(root, n_views=4, n_scans=1, h=128, w=160):
    """Synthetic on-disk DTU training layout (Yao preprocessing shape)."""
    import cv2

    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/Cameras/train", exist_ok=True)
    with open(f"{root}/Cameras/pair.txt", "w") as f:
        f.write(f"{n_views}\n")
        for v in range(n_views):
            srcs = [s for s in range(n_views) if s != v]
            f.write(f"{v}\n{len(srcs)} ")
            f.write(" ".join(f"{s} {100 - i}" for i, s in enumerate(srcs)) + "\n")
    for v in range(n_views):
        extr = np.eye(4)
        extr[:3, 3] = [v * 10.0, 0, 0]
        intr = np.array([[180.0, 0, w / 2], [0, 180.0, h / 2], [0, 0, 1]])
        with open(f"{root}/Cameras/train/{v:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in extr:
                f.write(" ".join(map(str, row)) + "\n")
            f.write("\nintrinsic\n")
            for row in intr:
                f.write(" ".join(map(str, row)) + "\n")
            f.write("\n425.0 2.5\n")
    scans = [f"scan{i + 1}" for i in range(n_scans)]
    for scan in scans:
        os.makedirs(f"{root}/Rectified/{scan}_train", exist_ok=True)
        os.makedirs(f"{root}/Depths_raw/{scan}", exist_ok=True)
        for v in range(n_views):
            for light in range(7):
                img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
                cv2.imwrite(
                    f"{root}/Rectified/{scan}_train/rect_{v + 1:03d}_{light}_r5000.png",
                    img,
                )
            # raw-res GT is 2x the training crop + margin in the real data;
            # here make it exactly 2x so prepare_img's /2 + crop is identity
            depth = rng.uniform(450, 900, size=(2 * h, 2 * w)).astype(np.float32)
            write_pfm(f"{root}/Depths_raw/{scan}/depth_map_{v:04d}.pfm", depth)
            mask = (rng.uniform(size=(2 * h, 2 * w)) > 0.3).astype(np.uint8) * 255
            cv2.imwrite(f"{root}/Depths_raw/{scan}/depth_visual_{v:04d}.png", mask)
    with open(f"{root}/train.txt", "w") as f:
        f.write("\n".join(scans) + "\n")
    return scans


@pytest.fixture(scope="module")
def dtu_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu"))
    # 512x640-contract shapes scaled down: use h,w that are /8-divisible
    make_dtu_tree(root, h=128, w=160)
    return root


def test_dtu_dataset_contract(dtu_tree):
    ds_cls = find_dataset_def("dtu")
    # monkeypatch the mid-crop target to the synthetic size
    ds = ds_cls(dtu_tree, f"{dtu_tree}/train.txt", "train", 3, 1.06, seed=0)
    ds._prepare_map = lambda hr: nearest_resize(
        hr, hr.shape[0] // 2, hr.shape[1] // 2
    )
    assert len(ds) == 4 * 7  # views x lights
    sample = ds[0]
    assert sample["imgs"].shape == (3, 128, 160, 3)
    assert sample["depth_values"].shape == (2,)
    assert sample["depth_values"][1] > sample["depth_values"][0]
    for s, scale in zip(range(1, 5), [8, 4, 2, 1]):
        assert sample["depth"][f"stage{s}"].shape == (128 // scale, 160 // scale)
        assert sample["mask"][f"stage{s}"].shape == (128 // scale, 160 // scale)
        assert sample["proj_matrices"][f"stage{s}"].shape == (3, 2, 4, 4)
    # stage intrinsic scaling: stage4 = 4x stage2
    k2 = sample["proj_matrices"]["stage2"][0, 1, :2]
    k4 = sample["proj_matrices"]["stage4"][0, 1, :2]
    np.testing.assert_allclose(k4, 4 * k2, rtol=1e-6)


def test_dtu_robust_training_scales_consistently(dtu_tree):
    ds_cls = find_dataset_def("dtu")
    ds = ds_cls(dtu_tree, f"{dtu_tree}/train.txt", "train", 3, 1.06, rt=True, seed=3)
    ds._prepare_map = lambda hr: nearest_resize(
        hr, hr.shape[0] // 2, hr.shape[1] // 2
    )
    base = ds_cls(dtu_tree, f"{dtu_tree}/train.txt", "train", 3, 1.06, seed=3)
    base._prepare_map = ds._prepare_map
    s_rt = ds[0]
    s_base = base[0]
    scale = s_rt["depth_values"][0] / s_base["depth_values"][0]
    assert 0.8 <= scale <= 1.25
    # GT depth and translation scale together
    np.testing.assert_allclose(
        s_rt["depth"]["stage4"] / s_base["depth"]["stage4"], scale, rtol=1e-5
    )
    t_rt = s_rt["proj_matrices"]["stage2"][0, 0, :3, 3]
    t_base = s_base["proj_matrices"]["stage2"][0, 0, :3, 3]
    if np.abs(t_base).max() > 0:
        np.testing.assert_allclose(t_rt, t_base * scale, rtol=1e-5)


def test_loader_sharding_covers_dataset(dtu_tree):
    ds_cls = find_dataset_def("dtu")
    ds = ds_cls(dtu_tree, f"{dtu_tree}/train.txt", "val", 3, 1.06)
    ds._prepare_map = lambda hr: nearest_resize(
        hr, hr.shape[0] // 2, hr.shape[1] // 2
    )
    shard0 = MVSLoader(ds, 2, num_shards=2, shard_index=0, prefetch=0)
    shard1 = MVSLoader(ds, 2, num_shards=2, shard_index=1, prefetch=0)
    assert len(shard0) == len(shard1)
    b0 = next(iter(shard0))
    assert b0["imgs"].shape == (2, 3, 128, 160, 3)


def _half_prepare(hr):  # module-level: must pickle into worker processes
    return nearest_resize(hr, hr.shape[0] // 2, hr.shape[1] // 2)


def test_aug_rng_worker_equivalence_and_epoch_streams(dtu_tree):
    """Augmentation draws are per-(seed, epoch, idx): identical between
    in-process and pool-worker decode, distinct across epochs (the round-1
    advisor found workers replaying one pickled RNG state every epoch)."""
    ds_cls = find_dataset_def("dtu")

    def make():
        ds = ds_cls(dtu_tree, f"{dtu_tree}/train.txt", "train", 3, 1.06,
                    rt=True, seed=5)
        ds._prepare_map = _half_prepare
        return ds

    inproc = MVSLoader(make(), 2, prefetch=0)
    workers = MVSLoader(make(), 2, prefetch=0, num_workers=2)
    inproc.set_epoch(1)
    workers.set_epoch(1)
    b_in = list(inproc)
    b_wk = list(workers)
    assert len(b_in) == len(b_wk)
    for a, b in zip(b_in, b_wk):
        np.testing.assert_array_equal(a["imgs"], b["imgs"])
        np.testing.assert_array_equal(a["depth_values"], b["depth_values"])

    # a different epoch must produce different robust-train scale draws
    later = MVSLoader(make(), 2, prefetch=0)
    later.set_epoch(2)
    b2 = next(iter(later))
    assert not np.array_equal(b_in[0]["depth_values"], b2["depth_values"])


def test_loader_prefetch_matches_sync(dtu_tree):
    ds_cls = find_dataset_def("dtu")
    ds = ds_cls(dtu_tree, f"{dtu_tree}/train.txt", "val", 3, 1.06)
    ds._prepare_map = lambda hr: nearest_resize(
        hr, hr.shape[0] // 2, hr.shape[1] // 2
    )
    sync = list(MVSLoader(ds, 3, prefetch=0))
    pref = list(MVSLoader(ds, 3, prefetch=2))
    assert len(sync) == len(pref)
    np.testing.assert_array_equal(sync[0]["imgs"], pref[0]["imgs"])
