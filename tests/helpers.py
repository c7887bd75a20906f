"""Shared synthetic-scene builders for tests."""

import numpy as np


def synthetic_cameras(rng, batch, nviews, h, w, focal=None):
    """Plausible multi-view rig: per-stage (B, V, 2, 4, 4) projection stacks.

    Reference view has identity extrinsics; sources are small rotations +
    translations.  Intrinsics are scaled per stage for feature resolutions
    H/8, H/4, H/2, H (the dataset contract, SURVEY.md section 2.2).
    """
    if focal is None:
        focal = 1.1 * w
    proj_full = np.zeros((batch, nviews, 2, 4, 4), np.float32)
    for bi in range(batch):
        for vi in range(nviews):
            if vi == 0:
                extr = np.eye(4, dtype=np.float32)
            else:
                angle = rng.uniform(-0.05, 0.05, size=3)
                cx, cy, cz = np.cos(angle)
                sx, sy, sz = np.sin(angle)
                rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
                ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
                rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
                extr = np.eye(4, dtype=np.float32)
                extr[:3, :3] = (rx @ ry @ rz).astype(np.float32)
                extr[:3, 3] = rng.uniform(-30, 30, size=3)
            intr = np.array(
                [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
            )
            proj_full[bi, vi, 0] = extr
            proj_full[bi, vi, 1, :3, :3] = intr

    stages = {}
    for s, scale in zip(range(1, 5), [0.125, 0.25, 0.5, 1.0]):
        p = proj_full.copy()
        p[:, :, 1, :2, :] *= scale
        stages[f"stage{s}"] = p
    return stages


def synthetic_sample(seed, batch=1, nviews=3, h=64, w=64, with_gt=False):
    """Random images + plausible cameras + DTU-like depth range."""
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(size=(batch, nviews, h, w, 3)).astype(np.float32)
    projs = synthetic_cameras(rng, batch, nviews, h, w)
    depth_values = np.broadcast_to(
        np.array([425.0, 935.0], np.float32), (batch, 2)
    ).copy()
    sample = {"imgs": imgs, "proj_matrices": projs, "depth_values": depth_values}
    if with_gt:
        depth_gt, mask = {}, {}
        for s, scale in zip(range(1, 5), [8, 4, 2, 1]):
            hs, ws = h // scale, w // scale
            depth_gt[f"stage{s}"] = rng.uniform(
                440, 920, size=(batch, hs, ws)
            ).astype(np.float32)
            mask[f"stage{s}"] = (rng.uniform(size=(batch, hs, ws)) > 0.2).astype(
                np.float32
            )
        sample["depth"] = depth_gt
        sample["mask"] = mask
    return sample


def plane_scene_sample(seed, h=64, w=64, z=600.0, baselines=(200.0, -200.0),
                       focal=None):
    """Textured fronto-parallel plane at depth z viewed by shifted cameras.

    For a plane at depth z and pure x-translation t, view v's image is the
    reference texture shifted by focal * t / z pixels — so the plane-sweep
    cost volume has a decisive peak at the correct hypothesis (unlike random
    images, whose cost is flat and whose argmax is float noise).
    """
    rng = np.random.default_rng(seed)
    if focal is None:
        focal = 1.1 * w
    pad = int(abs(max(baselines, key=abs)) * focal / z) + 4

    # smooth random texture (lightly blurred noise) so bilinear shifts
    # interpolate well; zero-mean unit-std so out-of-frustum zeros cost the
    # same as decorrelation and the true-depth alignment dip dominates
    big = rng.uniform(size=(h + 8, w + 2 * pad + 8, 3)).astype(np.float32)
    k = np.ones(3, np.float32) / 3
    for axis in (0, 1):
        big = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, big
        )
    big = big[4:-4, 4:-4]
    big = (big - big.mean()) / big.std()

    nviews = 1 + len(baselines)
    imgs = np.zeros((1, nviews, h, w, 3), np.float32)
    proj_full = np.zeros((1, nviews, 2, 4, 4), np.float32)
    intr = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
    for vi in range(nviews):
        extr = np.eye(4, dtype=np.float32)
        if vi == 0:
            shift = 0.0
        else:
            t = baselines[vi - 1]
            extr[0, 3] = t
            shift = focal * t / z
        # img_v(u) = world texture at (u - f*t/z): sample at x - shift
        xs = np.arange(w, dtype=np.float64) + pad - shift
        x0 = np.floor(xs).astype(int)
        frac = (xs - x0)[None, :, None].astype(np.float32)
        imgs[0, vi] = big[:h, x0] * (1 - frac) + big[:h, x0 + 1] * frac
        proj_full[0, vi, 0] = extr
        proj_full[0, vi, 1, :3, :3] = intr

    stages = {}
    for s, scale in zip(range(1, 5), [0.125, 0.25, 0.5, 1.0]):
        p = proj_full.copy()
        p[:, :, 1, :2, :] *= scale
        stages[f"stage{s}"] = p
    depth_values = np.array([[425.0, 935.0]], np.float32)
    return {
        "imgs": imgs,
        "proj_matrices": stages,
        "depth_values": depth_values,
        "plane_depth": z,
    }


def to_torch_inputs(sample):
    """Convert the channels-last numpy sample to the torch reference's format."""
    import torch

    imgs = [
        torch.from_numpy(np.ascontiguousarray(sample["imgs"][:, v].transpose(0, 3, 1, 2)))
        for v in range(sample["imgs"].shape[1])
    ]
    projs = {
        k: torch.from_numpy(v.copy()) for k, v in sample["proj_matrices"].items()
    }
    depth_values = torch.from_numpy(sample["depth_values"].copy())
    return imgs, projs, depth_values
