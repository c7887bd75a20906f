"""Projective geometry primitives for plane-sweep multi-view stereo.

All functions are pure jax, jit-friendly (static shapes, no data-dependent
control flow) and broadcast over leading batch dimensions.

Behavioral contract mirrors the reference MVSTER pipeline
(/root/reference/models/mvs4net_utils.py:13-59 `homo_warping`,
/root/reference/models/mvs4net_utils.py:1032-1035 projection composition),
re-derived here in closed form: the reference inverts general 4x4 matrices with
MAGMA (`torch.inverse`); since every projection in this pipeline is an affine
4x4 (last row [0,0,0,1]) we use the adjugate-based affine inverse, which is
exact, branch-free, and inlines into XLA without a LAPACK call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Camera math is tiny but precision-critical (pixel coordinates at 1600px
# scale need every f32 bit); never let these matmuls drop to bf16.
_HI = jax.lax.Precision.HIGHEST


def inverse_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of 3x3 matrices. Broadcasts over leading dims.

    m: (..., 3, 3) -> (..., 3, 3)
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    co00 = e * i - f * h
    co01 = f * g - d * i
    co02 = d * h - e * g
    det = a * co00 + b * co01 + c * co02

    adj = jnp.stack(
        [
            jnp.stack([co00, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([co01, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([co02, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def inverse_affine_4x4(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of affine 4x4 matrices (last row [0,0,0,1]). Broadcasts.

    m: (..., 4, 4) -> (..., 4, 4).  inv([[A, t],[0,1]]) = [[A^-1, -A^-1 t],[0,1]].
    """
    a_inv = inverse_3x3(m[..., :3, :3])
    t = m[..., :3, 3:4]
    top = jnp.concatenate([a_inv, -jnp.matmul(a_inv, t, precision=_HI)], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def compose_projection(proj_pair: jnp.ndarray) -> jnp.ndarray:
    """Fold a (extrinsic, intrinsic) pair into a single affine 4x4 projection.

    proj_pair: (..., 2, 4, 4) where [..., 0] is the 4x4 world-to-camera
    extrinsic and [..., 1, :3, :3] the 3x3 intrinsic.  Returns (..., 4, 4) with
    [:3, :4] = K @ E[:3, :4] and the extrinsic's last row preserved, matching
    the reference composition (mvs4net_utils.py:1032-1035).
    """
    extr = proj_pair[..., 0, :, :]
    intr = proj_pair[..., 1, :3, :3]
    top = jnp.matmul(intr, extr[..., :3, :4], precision=_HI)  # (..., 3, 4)
    return jnp.concatenate([top, extr[..., 3:4, :]], axis=-2)


def plane_sweep_rt(
    src_proj: jnp.ndarray, ref_proj: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Relative projection of the plane sweep: rot (B, 3, 3), trans (B, 3).

    The source-view coordinate of reference pixel (px, py) at depth d is
    ((rot @ (px, py, 1)) * d + trans) projected by its z — the shared core
    of plane_sweep_coords and the kernel-layout coordinate emission
    (kernels/pallas_warp._packed_plane_sweep)."""
    proj = jnp.matmul(src_proj, inverse_affine_4x4(ref_proj), precision=_HI)
    return proj[:, :3, :3], proj[:, :3, 3]


def plane_sweep_coords(
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Source-view pixel coordinates for each reference pixel x depth hypothesis.

    Args:
      src_proj: (B, 4, 4) composed source projection (see compose_projection).
      ref_proj: (B, 4, 4) composed reference projection.
      depth_values: (B, D, H, W) per-pixel depth hypotheses in the ref view.

    Returns:
      (x, y): each (B, D, H, W), un-normalized source pixel coordinates (the
      reference normalizes to [-1,1] for `F.grid_sample(align_corners=True)`;
      that normalization cancels exactly against grid_sample's un-normalization,
      so we keep raw pixel units).  Matches the z==0 -> 1e-9 guard of the
      reference (mvs4net_utils.py:38-40).
    """
    b, d, h, w = depth_values.shape
    rot, trans = plane_sweep_rt(src_proj, ref_proj)

    ys = jnp.arange(h, dtype=depth_values.dtype)
    xs = jnp.arange(w, dtype=depth_values.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    ones = jnp.ones_like(grid_x)
    xyz = jnp.stack([grid_x, grid_y, ones], axis=0).reshape(3, h * w)  # (3, HW)

    rot_xyz = jnp.matmul(rot, xyz, precision=_HI)  # (B, 3, HW)
    # (B, 3, D, HW): ray direction scaled by each depth hypothesis, + translation
    proj_xyz = (
        rot_xyz[:, :, None, :] * depth_values.reshape(b, 1, d, h * w)
        + trans[:, :, None, None]
    )
    z = proj_xyz[:, 2]
    z = jnp.where(z == 0.0, jnp.asarray(1e-9, z.dtype), z)
    x = (proj_xyz[:, 0] / z).reshape(b, d, h, w)
    y = (proj_xyz[:, 1] / z).reshape(b, d, h, w)
    return x, y
