"""Pallas TPU kernel: fused Sinkhorn OT depth loss (discrete mode).

The Sinkhorn supervision iterates 10x over (B, HW, D, D) tensors
(core/sinkhorn.py; reference mvs4net_utils.py:1096-1141).  Under autodiff
that costs 10 iterations of softmax residuals in HBM; with jax.checkpoint it
costs a full recompute through XLA.  This kernel keeps the entire iteration
in VMEM per pixel tile and implements the backward pass by replaying the
forward in-register and hand-deriving the reverse sweep — zero intermediate
HBM traffic in either direction.

Layout: pixels ride the LANE axis — all arrays are (D, TILE_N) with
TILE_N = 512 (f32 tiles want a 128-multiple lane dim), the (D, D) bin-cost
matrix is a compile-time constant folded into the kernel, and the GT
distribution is materialized in-kernel from the bin index via iota compare
(log(1e-12) cold / log(1+1e-12) hot, matching the reference's +1e-12 log
guard exactly).

Public entry: `sinkhorn_loss_pallas(gt_depth, hypo_depth, attn_weight, mask,
iters, eps)` — same contract as core.sinkhorn but returns only the scalar
masked-mean loss; differentiable wrt attn_weight (the only input the
reference's discrete path differentiates: gt bins come from an argmin).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512
_LOG_EPS = math.log(1e-12)
_LOG_ONE = math.log(1.0 + 1e-12)


def _scaled_cost(d: int, eps: float) -> jnp.ndarray:
    # integer iota then cast: Mosaic rejects float iota
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    return jnp.abs(rows - cols).astype(jnp.float32) / eps


def _log_mu(gt_idx_tile, d):
    """(D, N) log of the one-hot GT distribution (+1e-12 guard semantics)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, gt_idx_tile.shape[-1]), 0)
    return jnp.where(rows == gt_idx_tile[None, :], _LOG_ONE, _LOG_EPS)


def _forward_iterations(scaled, log_mu, log_nu, iters):
    """Run the u/v updates; returns (u, v) each (D, N)."""

    def body(_, uv):
        u, v = uv
        # v_j = log_mu_j - LSE_i(S_ij + u_i)
        e = scaled[:, :, None] + u[:, None, :]  # (D, D, N)
        m = jnp.max(e, axis=0)
        v = log_mu - (jnp.log(jnp.sum(jnp.exp(e - m[None]), axis=0)) + m)
        # u_i = log_nu_i - LSE_j(S_ij + v_j)
        e = scaled[:, :, None] + v[None, :, :]
        m = jnp.max(e, axis=1)
        u = log_nu - (jnp.log(jnp.sum(jnp.exp(e - m[:, None, :]), axis=1)) + m)
        return u, v

    zeros = jnp.zeros_like(log_nu)
    return jax.lax.fori_loop(0, iters, body, (zeros, zeros))


def _fwd_kernel(pred_ref, gt_idx_ref, loss_ref, *, d, iters, eps):
    scaled = _scaled_cost(d, eps)
    cost = scaled * eps
    pred = pred_ref[:, :]  # (D, N)
    log_nu = jnp.log(pred + 1e-12)
    log_mu = _log_mu(gt_idx_ref[0, :], d)
    u, v = _forward_iterations(scaled, log_mu, log_nu, iters)
    t_map = jnp.exp(scaled[:, :, None] + u[:, None, :] + v[None, :, :])
    loss_ref[0, :] = jnp.sum(t_map * cost[:, :, None], axis=(0, 1))


def _bwd_kernel(pred_ref, gt_idx_ref, g_ref, dpred_ref, us_ref, vs_ref,
                *, d, iters, eps):
    """Replay the forward storing per-iteration (u, v); reverse-sweep to dpred.

    The (iters, D, TILE_N) u/v histories live in VMEM scratch (~160 KB each
    at D=8) — the whole reverse-mode sweep never touches HBM.
    """
    scaled = _scaled_cost(d, eps)
    cost = scaled * eps
    pred = pred_ref[:, :]
    n = pred.shape[-1]
    log_nu = jnp.log(pred + 1e-12)
    log_mu = _log_mu(gt_idx_ref[0, :], d)

    # ---- forward replay, recording the history into scratch refs ----
    def fwd_body(t, carry):
        u, v = carry
        e = scaled[:, :, None] + u[:, None, :]
        m = jnp.max(e, axis=0)
        v = log_mu - (jnp.log(jnp.sum(jnp.exp(e - m[None]), axis=0)) + m)
        e = scaled[:, :, None] + v[None, :, :]
        m = jnp.max(e, axis=1)
        u = log_nu - (jnp.log(jnp.sum(jnp.exp(e - m[:, None, :]), axis=1)) + m)
        us_ref[pl.ds(t, 1)] = u[None]
        vs_ref[pl.ds(t, 1)] = v[None]
        return u, v

    zeros = jnp.zeros((d, n), jnp.float32)
    u_fin, v_fin = jax.lax.fori_loop(0, iters, fwd_body, (zeros, zeros))

    g = g_ref[0, :]  # (N,) cotangent of the per-pixel loss
    t_map = jnp.exp(scaled[:, :, None] + u_fin[:, None, :] + v_fin[None, :, :])
    tc = t_map * cost[:, :, None]  # (D, D, N)
    du = jnp.sum(tc, axis=1) * g[None, :]  # (D, N)
    dv = jnp.sum(tc, axis=0) * g[None, :]

    # ---- reverse sweep ----
    def bwd_body(step, carry):
        du, dv, dlog_nu = carry
        t = iters - 1 - step
        v_t = vs_ref[pl.ds(t, 1)][0]
        u_prev = jnp.where(
            t > 0,
            us_ref[pl.ds(jnp.maximum(t - 1, 0), 1)][0],
            jnp.zeros((d, n), jnp.float32),
        )
        # u_t = log_nu - LSE_j(S_ij + v_t_j):
        #   dlog_nu += du ; dv_t -= sum_i du_i * P_ij,  P = softmax_j(S + v_t)
        e = scaled[:, :, None] + v_t[None, :, :]
        m = jnp.max(e, axis=1)
        p = jnp.exp(e - m[:, None, :])
        p = p / jnp.sum(p, axis=1)[:, None, :]
        dlog_nu = dlog_nu + du
        dv_t = dv - jnp.sum(du[:, None, :] * p, axis=0)
        # v_t = log_mu - LSE_i(S_ij + u_{t-1}_i):
        #   du_{t-1} -= sum_j dv_t_j * Q_ij,  Q = softmax_i(S + u_{t-1})
        e = scaled[:, :, None] + u_prev[:, None, :]
        m = jnp.max(e, axis=0)
        q = jnp.exp(e - m[None])
        q = q / jnp.sum(q, axis=0)[None]
        du_prev = -jnp.sum(dv_t[None, :, :] * q, axis=1)
        return du_prev, jnp.zeros_like(dv), dlog_nu

    _, _, dlog_nu = jax.lax.fori_loop(
        0, iters, bwd_body, (du, dv, jnp.zeros((d, n), jnp.float32))
    )
    dpred_ref[:, :] = dlog_nu / (pred + 1e-12)


def _pad_to_tiles(x, axis):
    n = x.shape[axis]
    padded = pl.cdiv(n, TILE_N) * TILE_N
    if padded == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, padded - n)
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sinkhorn_pixels(pred, gt_idx, iters, eps):
    """pred (D, N) f32, gt_idx (1, N) i32 -> per-pixel loss (1, N)."""
    return _sinkhorn_pixels_fwd(pred, gt_idx, iters, eps)[0]


def _call_fwd(pred, gt_idx, iters, eps):
    d, n = pred.shape
    grid = (n // TILE_N,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, iters=iters, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    )(pred, gt_idx)


def _sinkhorn_pixels_fwd(pred, gt_idx, iters, eps):
    loss = _call_fwd(pred, gt_idx, iters, eps)
    return loss, (pred, gt_idx)


def _sinkhorn_pixels_bwd(iters, eps, residuals, g):
    pred, gt_idx = residuals
    d, n = pred.shape
    grid = (n // TILE_N,)
    dpred = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d, iters=iters, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (d, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((iters, d, TILE_N), jnp.float32),
            pltpu.VMEM((iters, d, TILE_N), jnp.float32),
        ],
    )(pred, gt_idx, g)
    return (dpred, None)


_sinkhorn_pixels.defvjp(_sinkhorn_pixels_fwd, _sinkhorn_pixels_bwd)


def sinkhorn_loss_pallas(
    gt_depth: jnp.ndarray,
    hypo_depth: jnp.ndarray,
    attn_weight: jnp.ndarray,
    mask: jnp.ndarray,
    iters: int = 10,
    eps: float = 1.0,
) -> jnp.ndarray:
    """Scalar masked-mean Sinkhorn OT loss, fused on TPU (discrete bins).

    Same contract as core.sinkhorn(..., continuous=False)[1].
    """
    b, d, h, w = attn_weight.shape
    n = b * h * w
    pred = (
        attn_weight.astype(jnp.float32)
        .transpose(0, 2, 3, 1)
        .reshape(n, d)
        .T
    )  # (D, N): pixels on lanes
    diff = jnp.abs(
        hypo_depth.astype(jnp.float32) - gt_depth.astype(jnp.float32)[:, None]
    )
    gt_idx = jnp.argmin(diff, axis=1).reshape(1, n).astype(jnp.int32)

    pred = _pad_to_tiles(pred, 1)
    gt_idx = _pad_to_tiles(gt_idx, 1)
    per_pixel = _sinkhorn_pixels(pred, gt_idx, iters, eps)[0, :n]

    m = mask.reshape(-1).astype(jnp.float32)
    return jnp.sum(per_pixel * m) / jnp.maximum(jnp.sum(m), 1.0)
