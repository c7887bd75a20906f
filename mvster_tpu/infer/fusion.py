"""Device-side geometric-consistency filtering + point-cloud fusion.

The reference runs this per-pixel in numpy + cv2.remap across a CPU process
pool (test_mvs4.py:273-455).  Here the whole cross-view consistency check is
one jitted program: project the reference depth map into each source view,
bilinearly sample the source depth, reproject back, and count inliers — all
views batched with vmap, reusing the same bilinear-gather machinery as the
training-path warp.  Criteria match the reference: reprojection distance
< 1 px AND relative depth difference < 0.01 (test_mvs4.py:313-328); final
mask = photometric confidence > conf AND >= thres_view source inliers; fused
depth = mean of inlier reprojections including the reference estimate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mvster_tpu.core.geometry import inverse_3x3, inverse_affine_4x4
from mvster_tpu.core.sampling import bilinear_sample


def _reproject(ref_depth, ref_intr, ref_extr, src_depth, src_intr, src_extr):
    """Project ref pixels into src, sample src depth, reproject back.

    ref_depth: (H, W); intrinsics (3, 3); extrinsics (4, 4).
    Returns (depth_reprojected, x_reprojected, y_reprojected) each (H, W).
    """
    h, w = ref_depth.shape
    prec = jax.lax.Precision.HIGHEST
    ys = jnp.arange(h, dtype=ref_depth.dtype)
    xs = jnp.arange(w, dtype=ref_depth.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    pix = jnp.stack([gx, gy, ones], axis=0).reshape(3, h * w)  # (3, HW)

    # ref pixel -> ref camera -> src camera -> src pixel
    cam_ref = jnp.matmul(inverse_3x3(ref_intr), pix, precision=prec) * ref_depth.reshape(
        1, h * w
    )
    ref_to_src = jnp.matmul(src_extr, inverse_affine_4x4(ref_extr), precision=prec)
    cam_src = (
        jnp.matmul(ref_to_src[:3, :3], cam_ref, precision=prec)
        + ref_to_src[:3, 3:4]
    )
    pix_src = jnp.matmul(src_intr, cam_src, precision=prec)
    xy_src = pix_src[:2] / pix_src[2:3]

    # sample source depth at the projected locations (bilinear, zero pad)
    sampled = bilinear_sample(
        src_depth[:, :, None], xy_src[0].reshape(h, w), xy_src[1].reshape(h, w)
    )[..., 0]

    # src pixel + sampled depth -> src camera -> ref camera -> ref pixel
    cam_src2 = jnp.matmul(
        inverse_3x3(src_intr),
        jnp.concatenate([xy_src, jnp.ones_like(xy_src[:1])], axis=0),
        precision=prec,
    ) * sampled.reshape(1, h * w)
    src_to_ref = jnp.matmul(ref_extr, inverse_affine_4x4(src_extr), precision=prec)
    cam_ref2 = (
        jnp.matmul(src_to_ref[:3, :3], cam_src2, precision=prec)
        + src_to_ref[:3, 3:4]
    )
    depth_reproj = cam_ref2[2].reshape(h, w)
    pix_ref2 = jnp.matmul(ref_intr, cam_ref2, precision=prec)
    xy_ref2 = pix_ref2[:2] / pix_ref2[2:3]
    return depth_reproj, xy_ref2[0].reshape(h, w), xy_ref2[1].reshape(h, w)


def _check_one_src(ref_depth, ref_intr, ref_extr, src_depth, src_intr, src_extr,
                   dist_thresh, rel_depth_thresh):
    h, w = ref_depth.shape
    depth_reproj, x2, y2 = _reproject(
        ref_depth, ref_intr, ref_extr, src_depth, src_intr, src_extr
    )
    ys = jnp.arange(h, dtype=ref_depth.dtype)
    xs = jnp.arange(w, dtype=ref_depth.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    dist = jnp.sqrt((x2 - gx) ** 2 + (y2 - gy) ** 2)
    depth_diff = jnp.abs(depth_reproj - ref_depth)
    rel = depth_diff / ref_depth
    mask = (dist < dist_thresh) & (rel < rel_depth_thresh)
    return mask, jnp.where(mask, depth_reproj, 0.0)


@functools.partial(jax.jit, static_argnames=("thres_view",))
def geometric_filter(
    ref_depth: jnp.ndarray,
    ref_conf: jnp.ndarray,
    ref_intr: jnp.ndarray,
    ref_extr: jnp.ndarray,
    src_depths: jnp.ndarray,
    src_intrs: jnp.ndarray,
    src_extrs: jnp.ndarray,
    conf_thresh: float = 0.5,
    thres_view: int = 4,
    dist_thresh: float = 1.0,
    rel_depth_thresh: float = 0.01,
):
    """Cross-view consistency filter for one reference view.

    src_depths: (S, H, W); src_intrs: (S, 3, 3); src_extrs: (S, 4, 4).
    Returns (final_mask (H,W) bool, fused_depth (H,W), geo_mask, photo_mask).
    """
    masks, reprojs = jax.vmap(
        lambda d, k, e: _check_one_src(
            ref_depth, ref_intr, ref_extr, d, k, e, dist_thresh, rel_depth_thresh
        )
    )(src_depths, src_intrs, src_extrs)

    geo_count = jnp.sum(masks.astype(jnp.int32), axis=0)  # (H, W)
    depth_avg = (jnp.sum(reprojs, axis=0) + ref_depth) / (
        geo_count.astype(ref_depth.dtype) + 1.0
    )
    geo_mask = geo_count >= thres_view
    photo_mask = ref_conf > conf_thresh
    final = geo_mask & photo_mask
    return final, depth_avg, geo_mask, photo_mask


def unproject_to_world(depth, mask, intr, extr, colors=None):
    """Masked pixels -> world-space points (numpy host side).

    Mirrors the reference unprojection (test_mvs4.py:400-405).
    """
    depth = np.asarray(depth)
    mask = np.asarray(mask)
    h, w = depth.shape
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xs, ys, ds = gx[mask], gy[mask], depth[mask]
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=0).astype(np.float64)
    cam = np.linalg.inv(np.asarray(intr, np.float64)) @ (pix * ds)
    cam_h = np.concatenate([cam, np.ones_like(cam[:1])], axis=0)
    world = (np.linalg.inv(np.asarray(extr, np.float64)) @ cam_h)[:3]
    out_colors = None
    if colors is not None:
        out_colors = np.asarray(colors)[mask]
    return world.T.astype(np.float32), out_colors


def fuse_scene(
    pair_data,
    depths: dict[int, np.ndarray],
    confs: dict[int, np.ndarray],
    intrinsics: dict[int, np.ndarray],
    extrinsics: dict[int, np.ndarray],
    images: dict[int, np.ndarray] | None = None,
    conf_thresh: float = 0.5,
    thres_view: int = 4,
):
    """Fuse all reference views of one scene into a world point cloud.

    pair_data: [(ref_view, [src_views...])].  Returns (xyz (N,3), rgb|None,
    per-view masks dict for debugging/parity dumps).
    """
    all_xyz, all_rgb = [], []
    view_masks = {}
    for ref_view, src_views in pair_data:
        src_d = jnp.stack([jnp.asarray(depths[v]) for v in src_views])
        src_k = jnp.stack([jnp.asarray(intrinsics[v]) for v in src_views])
        src_e = jnp.stack([jnp.asarray(extrinsics[v]) for v in src_views])
        final, depth_avg, geo_mask, photo_mask = geometric_filter(
            jnp.asarray(depths[ref_view]),
            jnp.asarray(confs[ref_view]),
            jnp.asarray(intrinsics[ref_view]),
            jnp.asarray(extrinsics[ref_view]),
            src_d, src_k, src_e,
            conf_thresh=conf_thresh, thres_view=thres_view,
        )
        final = np.asarray(final)
        view_masks[ref_view] = {
            "final": final,
            "geo": np.asarray(geo_mask),
            "photo": np.asarray(photo_mask),
        }
        colors = images[ref_view] if images is not None else None
        xyz, rgb = unproject_to_world(
            np.asarray(depth_avg), final,
            intrinsics[ref_view], extrinsics[ref_view], colors,
        )
        all_xyz.append(xyz)
        if rgb is not None:
            all_rgb.append((rgb * 255).astype(np.uint8) if rgb.dtype != np.uint8 else rgb)

    xyz = np.concatenate(all_xyz, axis=0) if all_xyz else np.zeros((0, 3), np.float32)
    rgb = np.concatenate(all_rgb, axis=0) if all_rgb else None
    return xyz, rgb, view_masks
