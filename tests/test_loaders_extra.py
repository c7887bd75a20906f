"""BlendedMVS / Tanks / ETH3D / general-eval loaders on synthetic disk trees."""

import os

import numpy as np
import pytest

from mvster_tpu.data import find_dataset_def
from mvster_tpu.data.pfm import write_pfm


def write_cam(path, extr, intr, depth_line):
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for row in extr:
            f.write(" ".join(map(str, row)) + "\n")
        f.write("\nintrinsic\n")
        for row in intr:
            f.write(" ".join(map(str, row)) + "\n")
        f.write(f"\n{depth_line}\n")


def write_pair(path, n_views):
    with open(path, "w") as f:
        f.write(f"{n_views}\n")
        for v in range(n_views):
            srcs = [s for s in range(n_views) if s != v]
            f.write(f"{v}\n{len(srcs)} ")
            f.write(" ".join(f"{s} {100 - i}" for i, s in enumerate(srcs)) + "\n")


def make_cam(v, focal=400.0, w=768, h=576):
    extr = np.eye(4)
    extr[:3, 3] = [v * 0.2, 0, 0]
    intr = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])
    return extr, intr


@pytest.fixture(scope="module")
def blended_tree(tmp_path_factory):
    import cv2

    root = str(tmp_path_factory.mktemp("blended"))
    rng = np.random.default_rng(0)
    scan = "5b000000000000000000000000"
    w, h = 768, 576
    os.makedirs(f"{root}/{scan}/blended_images", exist_ok=True)
    os.makedirs(f"{root}/{scan}/rendered_depth_maps", exist_ok=True)
    os.makedirs(f"{root}/{scan}/cams", exist_ok=True)
    write_pair(f"{root}/{scan}/cams/pair.txt", 4)
    for v in range(4):
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(f"{root}/{scan}/blended_images/{v:08d}.jpg", img)
        depth = rng.uniform(2.0, 8.0, size=(h, w)).astype(np.float32)
        write_pfm(f"{root}/{scan}/rendered_depth_maps/{v:08d}.pfm", depth)
        extr, intr = make_cam(v)
        write_cam(f"{root}/{scan}/cams/{v:08d}_cam.txt", extr, intr, "2.0 0.04 192 9.68")
    with open(f"{root}/list.txt", "w") as f:
        f.write(scan + "\n")
    return root, scan


def test_blendedmvs_loader_contract(blended_tree):
    root, scan = blended_tree
    ds_cls = find_dataset_def("blendedmvs")
    ds = ds_cls(root, f"{root}/list.txt", "train", 3, robust_train=True, seed=0)
    assert len(ds) == 4
    sample = ds[0]
    assert sample["imgs"].shape == (3, 576, 768, 3)
    # per-scan normalization: depth_min scaled to ~100 x robust scale
    dmin, dmax = sample["depth_values"]
    assert 80.0 <= dmin <= 125.1  # 100 * U(0.8, 1.25)
    assert dmax > dmin
    for s, scale in zip(range(1, 5), [8, 4, 2, 1]):
        assert sample["depth"][f"stage{s}"].shape == (576 // scale, 768 // scale)
        assert sample["proj_matrices"][f"stage{s}"].shape == (3, 2, 4, 4)
    # depth pyramid values lie inside the (scaled) range where mask is on
    d4 = sample["depth"]["stage4"]
    m4 = sample["mask"]["stage4"] > 0.5
    assert (d4[m4] >= dmin - 1e-3).all() and (d4[m4] <= dmax + 1e-3).all()
    # stage4 intrinsics = 8x stage1
    np.testing.assert_allclose(
        sample["proj_matrices"]["stage4"][0, 1, :2],
        8 * sample["proj_matrices"]["stage1"][0, 1, :2], rtol=1e-6,
    )


@pytest.fixture(scope="module")
def tanks_tree(tmp_path_factory):
    import cv2

    root = str(tmp_path_factory.mktemp("tanks"))
    rng = np.random.default_rng(1)
    scan = "Family"
    w, h = 480, 1080  # vertical 1080 -> cropped to 1024
    from mvster_tpu.data.tanks import INTERMEDIATE

    # the loader (like the reference) reads pair.txt for every hard-coded
    # scan at init; give the others empty pair files
    for other in INTERMEDIATE:
        os.makedirs(f"{root}/intermediate/{other}", exist_ok=True)
        with open(f"{root}/intermediate/{other}/pair.txt", "w") as f:
            f.write("0\n")
    os.makedirs(f"{root}/intermediate/{scan}/images", exist_ok=True)
    os.makedirs(f"{root}/intermediate/{scan}/cams", exist_ok=True)
    write_pair(f"{root}/intermediate/{scan}/pair.txt", 3)
    for v in range(3):
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(f"{root}/intermediate/{scan}/images/{v:08d}.jpg", img)
        extr, intr = make_cam(v, focal=1000.0, w=w, h=h)
        write_cam(
            f"{root}/intermediate/{scan}/cams/{v:08d}_cam.txt", extr, intr,
            "0.5 0.005 192 1.5",
        )
    return root


def test_tanks_loader_contract(tanks_tree):
    ds_cls = find_dataset_def("tanks")
    ds = ds_cls(tanks_tree, n_views=3, split="intermediate")
    # only Family exists on disk in the fixture; other scans' pair.txt missing
    sample = ds[0]
    assert sample["imgs"].shape == (3, 1024, 480, 3)
    # cy shifted by the 28px crop, then scaled to stage1 basis
    k1 = sample["proj_matrices"]["stage1"][0, 1]
    assert abs(k1[1, 2] - (1080 / 2 - 28) * 0.125) < 1e-4
    assert sample["filename"].startswith("Family/")


def test_tanks_build_metas_requires_all_scans(tanks_tree):
    """The reference hard-codes the full scan list; missing scans raise."""
    ds_cls = find_dataset_def("tanks")
    with pytest.raises(FileNotFoundError):
        ds_cls(tanks_tree + "/nonexistent", n_views=3)


@pytest.fixture(scope="module")
def eth3d_tree(tmp_path_factory):
    import cv2

    root = str(tmp_path_factory.mktemp("eth3d"))
    rng = np.random.default_rng(2)
    # ETH3D also hard-codes its scan list; build all test scans minimally
    from mvster_tpu.data.eth3d import TEST_SCANS

    for scan in TEST_SCANS:
        os.makedirs(f"{root}/{scan}/images", exist_ok=True)
        os.makedirs(f"{root}/{scan}/cams_1", exist_ok=True)
        write_pair(f"{root}/{scan}/pair.txt", 2)
        for v in range(2):
            img = (rng.uniform(size=(120, 192, 3)) * 255).astype(np.uint8)
            cv2.imwrite(f"{root}/{scan}/images/{v:08d}.jpg", img)
            extr, intr = make_cam(v, focal=300.0, w=192, h=120)
            write_cam(
                f"{root}/{scan}/cams_1/{v:08d}_cam.txt", extr, intr,
                "-1.0 0.01 192 5.0",  # negative dmin -> clamped to 1
            )
    return root


def test_eth3d_loader_contract(eth3d_tree):
    ds_cls = find_dataset_def("eth3d")
    ds = ds_cls(eth3d_tree, split="test", n_views=2, img_wh=(256, 128))
    sample = ds[0]
    assert sample["imgs"].shape == (2, 128, 256, 3)
    # negative depth_min clamps to 1.0 (eth3d.py:51-52 semantics)
    assert sample["depth_values"][0] == 1.0
    # intrinsics rescaled by resize factor then to stage1 basis
    k1 = sample["proj_matrices"]["stage1"][0, 1]
    assert abs(k1[0, 0] - 300.0 * (256 / 192) * 0.125) < 1e-3
