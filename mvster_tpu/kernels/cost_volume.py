"""Epipolar-transformer cost-volume builder: warp + correlate + view fusion.

This is THE hot op of the pipeline (reference call stack: stagenet's per-view
loop at /root/reference/models/mvs4net_utils.py:1025-1060 — homography warp,
group-wise correlation, cross-view attention accumulation).  Two
implementations share one signature:

  * `build_cost_volume` — pure-XLA formulation.  The per-view loop runs as an
    unrolled Python loop (Nv is small and static); views are *accumulated
    online* (running weighted sum + running weight normalizer), so peak memory
    is one warped volume, not Nv of them — the same online-softmax trick the
    reference uses, which is also exactly what a sequence-parallel/ring
    formulation would need.
  * a Pallas VMEM-tiled kernel (mvster_tpu.kernels.pallas_warp) that fuses the
    projective transform + bilinear gather + group-dot so the (B, D, H, W, C)
    warped tensor never hits HBM; `build_cost_volume(impl="pallas")` selects
    it on TPU.

Layout: features are channels-last (B, H, W, C); the returned volume is
(B, D, H, W, G) [group correlation] or (B, D, H, W, C) [squared difference].
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from mvster_tpu.core.geometry import plane_sweep_coords
from mvster_tpu.core.sampling import grid_sample_zeros


def warp_src_feature(
    src_feat: jnp.ndarray,
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_hypo: jnp.ndarray,
) -> jnp.ndarray:
    """Plane-sweep warp one source view into the reference frustum.

    src_feat: (B, H, W, C); projections (B, 4, 4); depth_hypo (B, D, Hr, Wr).
    Returns (B, D, Hr, Wr, C).  Equivalent to the reference homo_warping
    (mvs4net_utils.py:13-59) with grid_sample(align_corners=True, zeros).

    Differentiation note: the source-feature gradient routes through the
    Pallas scatter kernel (kernels/pallas_scatter.py) — XLA's scatter is
    ~8x the forward gather on TPU and dominated the train step.
    grid_sample_zeros_vjp returns ZERO cotangents for the coordinates, so
    they are stop_gradient'ed here explicitly: the zero-coord-grad
    contract is enforced structurally rather than assumed from callers
    (MVSTER detaches hypotheses between stages, MVS4Net.py:95, and the
    projections are batch constants — but a future caller passing live
    hypotheses must not silently get wrong gradients).
    """
    from mvster_tpu.kernels.pallas_scatter import grid_sample_zeros_vjp

    x, y = plane_sweep_coords(src_proj, ref_proj, depth_hypo)
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    return grid_sample_zeros_vjp(src_feat, x, y)


def correlate(
    warped: jnp.ndarray,
    ref_feat: jnp.ndarray,
    group_cor: bool,
    group_dim: int,
) -> jnp.ndarray:
    """Per-hypothesis similarity between warped source and reference features.

    warped: (B, D, H, W, C); ref_feat: (B, H, W, C).
    group_cor: mean-of-products over C/G sub-channels -> (B, D, H, W, G)
    else: squared difference -> (B, D, H, W, C).
    """
    if group_cor:
        b, d, h, w, c = warped.shape
        sub = c // group_dim
        wg = warped.reshape(b, d, h, w, group_dim, sub)
        rg = ref_feat.reshape(b, 1, h, w, group_dim, sub)
        return jnp.mean(wg * rg, axis=-1)
    diff = ref_feat[:, None] - warped
    return diff * diff


def view_weight(
    cor_feat: jnp.ndarray,
    feat_channels: int,
    attn_temp: float,
    attn_fuse_d: bool,
) -> jnp.ndarray:
    """Cross-view attention weight for one source view's correlation volume.

    attn_fuse_d=True (default): softmax over the depth axis of the
    channel-summed correlation, scaled 1/sqrt(C) -> (B, D, H, W).
    attn_fuse_d=False: per-pixel max of that softmax -> (B, H, W).
    """
    score = jnp.sum(cor_feat, axis=-1).astype(jnp.float32)  # (B, D, H, W)
    if attn_fuse_d:
        w = jax.nn.softmax(score / attn_temp, axis=1)
        return w / math.sqrt(feat_channels)
    return jnp.max(jax.nn.softmax(score, axis=1), axis=1)


def build_cost_volume(
    ref_feat: jnp.ndarray,
    src_feats: Sequence[jnp.ndarray],
    ref_proj: jnp.ndarray,
    src_projs: jnp.ndarray,
    depth_hypo: jnp.ndarray,
    *,
    group_cor: bool = True,
    group_dim: int = 8,
    attn_temp: float = 2.0,
    attn_fuse_d: bool = True,
    impl: str = "xla",
    with_fallbacks: bool = False,
    force_rp: int | None = None,
    pallas_coords: str = "packed",
    out_layout: str = "bdhwc",
    sg_warp: bool = False,
):
    """Fused multi-view cost volume with online cross-view normalization.

    Args:
      ref_feat: (B, H, W, C) reference feature.
      src_feats: (V, B, H, W, C) stacked source features (V = Nv - 1).
      ref_proj: (B, 4, 4) composed reference projection.
      src_projs: (V, B, 4, 4) composed source projections.
      depth_hypo: (B, D, H, W).
      impl: "xla" (differentiable — its warp gather/scatter run on the
        Pallas warp-only/scatter kernels via grid_sample_zeros_vjp) or
        "pallas" (inference: VMEM-fused warp+correlate kernel, 3-12x the
        XLA gather per stage; see kernels/pallas_warp.py).
      with_fallbacks: also return an int32 scalar counting source views
        that did NOT run on the requested Pallas kernel (runtime geometry
        predicate failed, or the static VMEM guard rejected the stage).
        Always 0 for impl="xla".  The cond predicate is computed anyway,
        so this costs nothing — it makes silent degradation observable
        (surfaced as the "warp_fallbacks" model output).
      force_rp: pin the Pallas kernel's row-pack layout to one variant —
        measurement-only knob for the rp sweeps that place _row_pack's
        thresholds (scripts/bench_components.py --rp-sweep); production
        callers leave it None.
      pallas_coords: "packed" (default) emits plane-sweep coords directly
        in the kernel lane layout from the stage geometry
        (warp_correlate_pallas_geom — drops the per-view coordinate build,
        both lane-packing transposes, and the unconditional second layout
        variant's metadata pass); "unpacked" is the legacy x/y entry.
        On-chip A/B (scripts/probe_cv_glue.py, TPU v5e f32, 2026-08-19):
        packed wins at every measured stage — raw stage4 198.7 -> 163.8 ms,
        raw stage3 42.4 -> 39.5, mid stage4 16.9 -> 14.7.

      out_layout: "bdhwc" (default) or "folded" — the depth-folded lane
        layout (B, 1, H, W, D*G) consumed by the folded reg2d
        (nn/reg.py).  On the fused Pallas path the folded emission is one
        transpose from packed space (replacing unpack + re-fold); other
        paths fold explicitly, so numerics are layout-invariant.

    Returns:
      (B, D, H, W, G or C) attention-fused correlation volume — or
      (B, 1, H, W, D*(G or C)) when out_layout="folded"
      [, fallback count if with_fallbacks].
    """
    folded = out_layout == "folded"
    c = ref_feat.shape[-1]
    num_views = len(src_feats)
    want_pallas = impl == "pallas" and group_cor
    use_pallas = want_pallas
    if use_pallas:
        from mvster_tpu.kernels.pallas_warp import pallas_warp_supported

        # VMEM guard: the kernel keeps whole per-view feature maps resident;
        # oversized stages fall back to the XLA formulation (same numerics)
        use_pallas = pallas_warp_supported(src_feats[0])

    fallbacks = jnp.asarray(
        0 if use_pallas or not want_pallas else num_views, jnp.int32
    )
    if use_pallas and pallas_coords == "packed":
        from mvster_tpu.kernels.pallas_warp import (
            _layout,
            fused_cost_volume_geom,
        )

        d = depth_hypo.shape[1]
        if _layout(c, d, ref_feat.shape[1], ref_feat.shape[2],
                   force_rp)["pack"]:
            # whole-stage fused path: hypotheses/reference packed once,
            # per-view attention fusion in packed lane space, one unpack
            out, fallbacks = fused_cost_volume_geom(
                ref_feat, src_feats, ref_proj, src_projs, depth_hypo,
                group_dim, attn_temp, attn_fuse_d, force_rp=force_rp,
                folded=folded,
            )
            return (out, fallbacks) if with_fallbacks else out
        # unpacked lane layout (d == 1): per-view legacy loop below
    weight_sum = jnp.asarray(1e-8, jnp.float32)
    feats_sum = jnp.asarray(0.0, jnp.float32)
    for v in range(num_views):
        if use_pallas:
            if pallas_coords == "packed":
                from mvster_tpu.kernels.pallas_warp import (
                    warp_correlate_pallas_geom,
                )

                cor, pred = warp_correlate_pallas_geom(
                    src_feats[v], ref_feat, src_projs[v], ref_proj,
                    depth_hypo, group_dim, return_pred=True,
                    force_rp=force_rp,
                )
            else:
                from mvster_tpu.core.geometry import plane_sweep_coords
                from mvster_tpu.kernels.pallas_warp import (
                    warp_correlate_pallas,
                )

                x, y = plane_sweep_coords(
                    src_projs[v], ref_proj, depth_hypo
                )
                cor, pred = warp_correlate_pallas(
                    src_feats[v], ref_feat, x, y, group_dim,
                    return_pred=True, force_rp=force_rp,
                )
            fallbacks = fallbacks + (1 - pred.astype(jnp.int32))
        else:
            warped = warp_src_feature(
                src_feats[v], src_projs[v], ref_proj, depth_hypo
            )
            if sg_warp:
                # measurement-only cut (MVS4NetConfig.sg_cuts "warp"): the
                # scatter backward and the FPN-via-cv cotangents are DCE'd
                # while the correlation/attention backward still runs —
                # separating scatter-bwd from cor-bwd in the train map
                warped = jax.lax.stop_gradient(warped)
            cor = correlate(warped, ref_feat, group_cor, group_dim)
        w = view_weight(cor, c, attn_temp, attn_fuse_d)
        cor = cor.astype(jnp.float32)
        if attn_fuse_d:
            weight_sum = weight_sum + w  # (B, D, H, W)
            feats_sum = feats_sum + w[..., None] * cor
        else:
            weight_sum = weight_sum + w  # (B, H, W)
            feats_sum = feats_sum + w[:, None, :, :, None] * cor

    if attn_fuse_d:
        out = feats_sum / weight_sum[..., None]
    else:
        out = feats_sum / weight_sum[:, None, :, :, None]
    if folded:
        b, d, h, w, g = out.shape
        out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, 1, h, w, d * g)
    return (out, fallbacks) if with_fallbacks else out
