"""Entropy-regularized optimal-transport (Sinkhorn) depth supervision.

Log-domain Sinkhorn between the predicted attention distribution over D depth
bins and the ground-truth bin distribution, with an optional continuous-bin
variant that appends a dustbin column holding the fractional GT bin distance.
Behavioral contract mirrors the reference `sinkhorn`
(/root/reference/models/mvs4net_utils.py:1096-1141), re-expressed with a
`lax.fori_loop` (fixed iteration count -> single compiled loop body) and
masked-mean reductions instead of boolean indexing (XLA needs static shapes).

Kept in float32 regardless of model compute dtype: logsumexp over |i-j|/eps
cost maps is the numerically delicate part of the loss.

NOTE on the cost-map sign: the reference computes couplings with
exp(+D_map/eps + u + v), i.e. the *negative* cost convention folded into u, v.
We reproduce that exactly — parity beats aesthetics here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bin_distance_matrix(d: int, dtype) -> jnp.ndarray:
    """(D, D) matrix of |i - j| bin distances."""
    idx = jnp.arange(d, dtype=dtype)
    return jnp.abs(idx[:, None] - idx[None, :])


def sinkhorn(
    gt_depth: jnp.ndarray,
    hypo_depth: jnp.ndarray,
    attn_weight: jnp.ndarray,
    mask: jnp.ndarray,
    iters: int,
    eps: float = 1.0,
    continuous: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """OT loss between predicted depth-bin distribution and GT bin.

    Args:
      gt_depth: (B, H, W) ground-truth depth.
      hypo_depth: (B, D, H, W) depth hypotheses per pixel.
      attn_weight: (B, D, H, W) predicted distribution over hypotheses.
      mask: (B, H, W) boolean validity mask.
      iters: number of Sinkhorn iterations (static).
      eps: entropy regularization strength.
      continuous: use the continuous-bin + dustbin formulation.

    Returns:
      (t_map, loss): transport plan (B, HW, D, Dcols) and scalar masked-mean
      loss <T, C> where Dcols = D (+1 with dustbin).
    """
    compute_dtype = jnp.float32
    gt_depth = gt_depth.astype(compute_dtype)
    hypo_depth = hypo_depth.astype(compute_dtype)
    attn_weight = attn_weight.astype(compute_dtype)

    b, d, h, w = attn_weight.shape
    hw = h * w
    base_cost = _bin_distance_matrix(d, compute_dtype)  # (D, D)

    if not continuous:
        # GT distribution: one-hot at the hypothesis nearest to gt depth.
        diff = jnp.abs(hypo_depth - gt_depth[:, None, :, :])  # (B, D, H, W)
        gt_idx = jnp.argmin(diff, axis=1).reshape(b, hw)  # (B, HW)
        gt_dist = jax.nn.one_hot(gt_idx, d, dtype=compute_dtype)  # (B, HW, D)
        cost = jnp.broadcast_to(base_cost[None, None], (b, hw, d, d))
    else:
        # GT mass sits entirely in the dustbin column; the dustbin's cost row
        # is the continuous distance from each bin to the (fractional) GT bin.
        gt_dist = jnp.zeros((b, hw, d + 1), compute_dtype).at[:, :, -1].set(1.0)
        itv = 1.0 / hypo_depth[:, 2, :, :] - 1.0 / hypo_depth[:, 1, :, :]  # (B,H,W)
        gt_bin = (1.0 / gt_depth - 1.0 / hypo_depth[:, 0, :, :]) / itv  # (B,H,W)
        gt_bin = jnp.where(mask, gt_bin, jnp.asarray(10.0, compute_dtype))
        bins = jnp.arange(d, dtype=compute_dtype)
        gt_bin_dist = jnp.abs(gt_bin[:, :, :, None] - bins)  # (B, H, W, D)
        cost = jnp.broadcast_to(
            jnp.pad(base_cost, ((0, 0), (0, 1)))[None, None], (b, hw, d, d + 1)
        )
        cost = cost.at[:, :, :, -1].set(gt_bin_dist.reshape(b, hw, d))

    pred_dist = attn_weight.transpose(0, 2, 3, 1).reshape(b, hw, d)  # (B, HW, D)

    log_mu = jnp.log(gt_dist + 1e-12)  # (B, HW, Dcols)
    log_nu = jnp.log(pred_dist + 1e-12)  # (B, HW, D)

    scaled = cost / eps  # (B, HW, D, Dcols)

    def body(_, uv):
        u, v = uv
        v = log_mu - jax.nn.logsumexp(scaled + u[..., None], axis=2)
        u = log_nu - jax.nn.logsumexp(scaled + v[..., None, :], axis=3)
        return u, v

    u0 = jnp.zeros_like(log_nu)
    v0 = jnp.zeros_like(log_mu)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))

    t_map = jnp.exp(scaled + u[..., None] + v[..., None, :])  # (B, HW, D, Dcols)
    per_pixel = jnp.sum(t_map * cost, axis=(2, 3)).reshape(-1)  # (B*HW,)
    mask_flat = mask.reshape(-1).astype(compute_dtype)
    loss = jnp.sum(per_pixel * mask_flat) / jnp.maximum(jnp.sum(mask_flat), 1.0)
    return t_map, loss
