"""Core geometry/sampling parity tests against the torch reference oracle.

The reference implementation at /root/reference is imported (not copied) and
used as a numerical oracle: identical random inputs must produce matching
outputs through our jax re-implementations.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import reference_on_path
from mvster_tpu.core import (
    compose_projection,
    init_inverse_range,
    init_range,
    inverse_affine_4x4,
    plane_sweep_coords,
    schedule_inverse_range,
    schedule_range,
    grid_sample_zeros,
)
from mvster_tpu.core.sampling import (
    resize_bilinear_align_corners,
    resize_trilinear_align_corners,
    upsample_nearest_2x,
    max_pool2d,
)

torch = pytest.importorskip("torch")

HAS_REF = reference_on_path()


def random_proj_pair(rng, b):
    """Random plausible (B, 2, 4, 4) [extrinsic, intrinsic] stacks."""
    out = np.zeros((b, 2, 4, 4), np.float32)
    for i in range(b):
        angle = rng.uniform(-0.2, 0.2, size=3)
        cx, cy, cz = np.cos(angle)
        sx, sy, sz = np.sin(angle)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        r = rx @ ry @ rz
        t = rng.uniform(-20, 20, size=3)
        extr = np.eye(4, dtype=np.float32)
        extr[:3, :3] = r
        extr[:3, 3] = t
        intr = np.array(
            [[80 + rng.uniform(-5, 5), 0, 40], [0, 80 + rng.uniform(-5, 5), 32], [0, 0, 1]],
            np.float32,
        )
        out[i, 0] = extr
        out[i, 1, :3, :3] = intr
    return out


def test_inverse_affine_4x4():
    rng = np.random.default_rng(0)
    pairs = random_proj_pair(rng, 4)
    m = np.asarray(compose_projection(jnp.asarray(pairs)))
    inv = np.asarray(inverse_affine_4x4(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.broadcast_to(np.eye(4), m.shape), atol=1e-4)
    np.testing.assert_allclose(inv, np.linalg.inv(m), rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
def test_compose_projection_matches_reference_composition():
    from models import mvs4net_utils  # noqa: F401  (oracle import)

    rng = np.random.default_rng(1)
    pairs = random_proj_pair(rng, 3)
    t = torch.from_numpy(pairs)
    # Reference composition (mvs4net_utils.py:1032-1035) done through torch ops
    ref = t[:, 0].clone()
    ref[:, :3, :4] = torch.matmul(t[:, 1, :3, :3], t[:, 0, :3, :4])
    ours = np.asarray(compose_projection(jnp.asarray(pairs)))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
def test_warp_matches_reference_homo_warping():
    from models.mvs4net_utils import homo_warping

    rng = np.random.default_rng(2)
    b, c, h, w, d = 2, 8, 16, 20, 4
    pairs_ref = random_proj_pair(rng, b)
    pairs_src = random_proj_pair(rng, b)
    ref_proj = np.asarray(compose_projection(jnp.asarray(pairs_ref)))
    src_proj = np.asarray(compose_projection(jnp.asarray(pairs_src)))
    src_fea = rng.normal(size=(b, c, h, w)).astype(np.float32)
    depth = rng.uniform(400, 900, size=(b, d, h, w)).astype(np.float32)

    ref_out = homo_warping(
        torch.from_numpy(src_fea),
        torch.from_numpy(src_proj),
        torch.from_numpy(ref_proj),
        torch.from_numpy(depth),
    ).numpy()  # (B, C, D, H, W)

    x, y = plane_sweep_coords(
        jnp.asarray(src_proj), jnp.asarray(ref_proj), jnp.asarray(depth)
    )
    # ours: channels-last (B, H, W, C) source features
    warped = grid_sample_zeros(
        jnp.asarray(src_fea.transpose(0, 2, 3, 1)), x, y
    )  # (B, D, H, W, C)
    ours = np.asarray(warped).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
def test_hypothesis_samplers_match_reference():
    from models import mvs4net_utils as ref

    rng = np.random.default_rng(3)
    b, h, w = 2, 8, 10
    depth_values = np.sort(rng.uniform(400, 900, size=(b, 2)).astype(np.float32), axis=1)
    tdv = torch.from_numpy(depth_values)

    out_ref = ref.init_range(tdv, 8, torch.device("cpu"), torch.float32, h, w).numpy()
    out_ours = np.asarray(init_range(jnp.asarray(depth_values), 8, h, w))
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-5, atol=1e-5)

    out_ref = ref.init_inverse_range(tdv, 8, torch.device("cpu"), torch.float32, h, w).numpy()
    out_ours = np.asarray(init_inverse_range(jnp.asarray(depth_values), 8, h, w))
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-5, atol=1e-5)

    inv_min = rng.uniform(1 / 900, 1 / 600, size=(b, h // 2, w // 2)).astype(np.float32)
    inv_max = inv_min - rng.uniform(1e-4, 3e-4, size=inv_min.shape).astype(np.float32)
    out_ref = ref.schedule_inverse_range(
        torch.from_numpy(inv_min), torch.from_numpy(inv_max), 4, h, w
    ).numpy()
    out_ours = np.asarray(
        schedule_inverse_range(jnp.asarray(inv_min), jnp.asarray(inv_max), 4, h, w)
    )
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-4, atol=1e-4)

    cur_depth = rng.uniform(450, 800, size=(b, h // 2, w // 2)).astype(np.float32)
    itv = rng.uniform(1.0, 3.0, size=(b,)).astype(np.float32)
    out_ref = ref.schedule_range(
        torch.from_numpy(cur_depth), 4, torch.from_numpy(itv), h, w
    ).numpy()
    out_ours = np.asarray(schedule_range(jnp.asarray(cur_depth), 4, jnp.asarray(itv), h, w))
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-4, atol=1e-4)


def test_resize_bilinear_matches_torch_interpolate():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            scale_factor=2,
            mode="bilinear",
            align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 14, 18))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_resize_trilinear_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x)[:, None],
            size=[4, 12, 16],
            mode="trilinear",
            align_corners=True,
        )
        .squeeze(1)
        .numpy()
    )
    ours = np.asarray(resize_trilinear_align_corners(jnp.asarray(x), 4, 12, 16))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_upsample2x_stencil_matches_einsum_path():
    """The exact-2x stencil fast path must agree with the dense-matrix path.

    The stencil replicates _interp_matrix's f32 pos/lo/frac arithmetic, so
    agreement is at roundoff (the two paths differ only in add order with
    one exactly-zero term).  Covers odd and even sizes, both resize entry
    points, and the trilinear H/W-double + D-change combination.
    """
    from mvster_tpu.core.sampling import _interp_matrix

    rng = np.random.default_rng(7)
    for h, w in [(5, 8), (6, 9), (1, 4), (16, 20)]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        fast = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 2 * h, 2 * w))
        mh = np.asarray(_interp_matrix(jnp.float32, h, 2 * h))
        mw = np.asarray(_interp_matrix(jnp.float32, w, 2 * w))
        dense = np.einsum("bhwc,Hh,Ww->bHWc", x, mh, mw)
        np.testing.assert_allclose(fast, dense, rtol=1e-6, atol=1e-6)

    x = rng.normal(size=(2, 8, 6, 9)).astype(np.float32)
    fast = np.asarray(resize_trilinear_align_corners(jnp.asarray(x), 4, 12, 18))
    md = np.asarray(_interp_matrix(jnp.float32, 8, 4))
    mh = np.asarray(_interp_matrix(jnp.float32, 6, 12))
    mw = np.asarray(_interp_matrix(jnp.float32, 9, 18))
    dense = np.einsum("bdhw,Dd,Hh,Ww->bDHW", x, md, mh, mw)
    np.testing.assert_allclose(fast, dense, rtol=1e-6, atol=1e-6)


def test_upsample_nearest_and_maxpool_match_torch():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 6, 8, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = (
        torch.nn.functional.interpolate(xt, scale_factor=2, mode="nearest")
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref)

    ref = (
        torch.nn.functional.max_pool2d(xt, 2, stride=2, padding=0)
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    ours = np.asarray(max_pool2d(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(ours, ref)


def test_grid_sample_identity_and_zero_padding():
    rng = np.random.default_rng(7)
    img = rng.normal(size=(1, 5, 6, 2)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(5.0), np.arange(6.0), indexing="ij")
    out = np.asarray(
        grid_sample_zeros(
            jnp.asarray(img), jnp.asarray(xs[None]), jnp.asarray(ys[None])
        )
    )
    np.testing.assert_allclose(out, img, atol=1e-6)
    # fully out-of-bounds -> zeros
    out = np.asarray(
        grid_sample_zeros(
            jnp.asarray(img),
            jnp.asarray(xs[None] + 100.0),
            jnp.asarray(ys[None] + 100.0),
        )
    )
    np.testing.assert_allclose(out, 0.0)
