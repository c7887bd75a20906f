"""Geometric-consistency filter parity vs the reference numpy implementation.

The reference's filter lives in test_mvs4.py behind a module-level argparse;
importing it with a patched sys.argv exposes reproject_with_depth /
check_geometric_consistency as oracles (test_mvs4.py:273-328).
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from mvster_tpu.infer.fusion import _check_one_src, _reproject

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_filter():
    if not os.path.isdir("/root/reference"):
        pytest.skip("no reference")
    sys.path.insert(0, "/root/reference")
    # the reference imports torchvision/plyfile/tensorboardX, none of which
    # exist here and none of which the filter functions touch -> stub them
    import types

    for name, attrs in [
        ("torchvision", {}),
        ("torchvision.utils", {"make_grid": lambda *a, **k: None}),
        ("plyfile", {"PlyData": object, "PlyElement": object}),
        ("tensorboardX", {"SummaryWriter": object}),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]

    argv = sys.argv
    sys.argv = ["test_mvs4.py", "--interval_scale", "1.06"]
    try:
        import test_mvs4  # noqa: F401
    finally:
        sys.argv = argv
    return test_mvs4


def make_scene(seed, h=24, w=32):
    """Random smooth depth maps + mildly rotated/translated cameras."""
    rng = np.random.default_rng(seed)

    def smooth_depth():
        base = rng.uniform(500, 700)
        gy, gx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                             indexing="ij")
        return (base + 30 * np.sin(2 * gx) + 20 * np.cos(3 * gy)).astype(
            np.float32
        )

    k = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32)
    angle = rng.uniform(-0.03, 0.03, size=3)
    cx, cy, cz = np.cos(angle)
    sx, sy, sz = np.sin(angle)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    e_src = np.eye(4, dtype=np.float32)
    e_src[:3, :3] = (rx @ ry @ rz).astype(np.float32)
    e_src[:3, 3] = rng.uniform(-20, 20, size=3)
    e_ref = np.eye(4, dtype=np.float32)
    return smooth_depth(), smooth_depth(), k, e_ref, e_src


def test_reproject_matches_reference(ref_filter):
    depth_ref, depth_src, k, e_ref, e_src = make_scene(0)
    ref_out = ref_filter.reproject_with_depth(
        depth_ref, k, e_ref, depth_src, k, e_src
    )
    our_depth, our_x, our_y = _reproject(
        jnp.asarray(depth_ref), jnp.asarray(k), jnp.asarray(e_ref),
        jnp.asarray(depth_src), jnp.asarray(k), jnp.asarray(e_src),
    )
    # reference uses cv2.remap (fixed-point bilinear, ~1/32 px tables); allow
    # small differences and compare where both sampled inside the image
    np.testing.assert_allclose(
        np.asarray(our_depth), ref_out[0], rtol=5e-3, atol=0.5
    )
    np.testing.assert_allclose(np.asarray(our_x), ref_out[1], rtol=1e-3, atol=0.5)
    np.testing.assert_allclose(np.asarray(our_y), ref_out[2], rtol=1e-3, atol=0.5)


def test_consistency_mask_matches_reference(ref_filter):
    agree_total, pixels_total = 0, 0
    for seed in range(3):
        depth_ref, depth_src, k, e_ref, e_src = make_scene(seed)
        ref_mask, ref_depth, _, _ = ref_filter.check_geometric_consistency(
            depth_ref, k, e_ref, depth_src, k, e_src
        )
        our_mask, our_depth = _check_one_src(
            jnp.asarray(depth_ref), jnp.asarray(k), jnp.asarray(e_ref),
            jnp.asarray(depth_src), jnp.asarray(k), jnp.asarray(e_src),
            dist_thresh=1.0, rel_depth_thresh=0.01,
        )
        our_mask = np.asarray(our_mask)
        agree_total += (our_mask == ref_mask).sum()
        pixels_total += ref_mask.size
    # bilinear-sampler quantization (cv2.remap fixed point) flips borderline
    # pixels; overall agreement must dominate
    agreement = agree_total / pixels_total
    assert agreement > 0.97, f"mask agreement only {agreement:.3f}"
