"""MVS4Net: the 4-stage coarse-to-fine cascade, assembled TPU-first.

Differences from the reference assembly (/root/reference/models/MVS4Net.py:9-111)
that matter on TPU:

  * Views are folded into the batch axis for feature extraction (one big conv
    batch for the MXU instead of an Nv-long Python loop of small convs).
  * The depth range scalars stay on device (the reference round-trips
    depth_values to the CPU at MVS4Net.py:61-63 — a sync point per step).
  * Stages are unrolled Python (their shapes differ, so lax.scan can't fuse
    them; XLA still pipelines across the unrolled stages).
  * Everything is channels-last and jit-compatible: no data-dependent shapes,
    confidence is computed unconditionally (cheap) instead of branching on
    `self.training`.

The config dataclass mirrors the reference CLI surface
(train_mvs4.py:46-77): stage_splits, depth_interals_ratio, group correlation,
inverse depth, agg_type, dcn / pos_enc / mono / ASFF / attn_temp and the
reg2d/reg3d switch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvster_tpu.core.geometry import compose_projection
from mvster_tpu.core.hypothesis import (
    init_inverse_range,
    init_range,
    schedule_inverse_range,
    schedule_range,
)
from mvster_tpu.core.sampling import resize_bilinear_align_corners
from mvster_tpu.kernels.cost_volume import build_cost_volume
from mvster_tpu.nn.fpn import ASFF, FPN4, FPN4ConvNeXt, FPN4ConvNeXt4
from mvster_tpu.nn.mono import MonoDepthDecoder
from mvster_tpu.nn.posenc import PosEncLearned, PosEncSine
from mvster_tpu.nn.reg import Reg2d, Reg3d


@dataclasses.dataclass(frozen=True)
class MVS4NetConfig:
    arch_mode: str = "fpn"  # fpn | convnext | convnext4
    reg_net: str = "reg2d"  # reg2d | reg3d
    num_stage: int = 4
    fpn_base_channel: int = 8
    reg_channel: int = 8
    stage_splits: Sequence[int] = (8, 8, 4, 4)
    depth_interals_ratio: Sequence[float] = (0.5, 0.5, 0.5, 1.0)
    group_cor: bool = False
    group_cor_dim: Sequence[int] = (8, 8, 8, 8)
    inverse_depth: bool = False
    agg_type: str = "ConvBnReLU3D"
    dcn: bool = False
    pos_enc: int = 0  # 0 none | 1 sine | 2 learned
    mono: bool = False
    asff: bool = False
    attn_temp: float = 2.0
    attn_fuse_d: bool = True
    # reg3d down levels per stage (MVS4Net.py:47-48)
    reg3d_down_size: Sequence[int] = (3, 3, 2, 2)
    # "float32" (default, bitwise parity) or "bfloat16" (MXU-native convs;
    # norms, geometry, softmax/argmax and losses stay f32)
    compute_dtype: str = "float32"
    # plane-sweep warp implementation for inference forwards: "pallas"
    # (fused VMEM kernel, ~7x the XLA gather at stage 4 — kernels/
    # pallas_warp.py) or "xla".  Training uses the differentiable
    # formulation (Pallas warp-only forward + Pallas scatter backward via
    # grid_sample_zeros_vjp; pure XLA only in the geometry-fallback
    # branch).  All kernels fall back to XLA at runtime when the geometry
    # exceeds their static windows, so numerics are unchanged.
    warp_impl: str = "pallas"
    # Folded-depth reg2d eval formulation (nn/reg.py): D folded into the
    # conv lane dimension for the whole U-Net — 4x MXU lane utilization at
    # the late stages.  Checkpoint-compatible by construction; eval-only
    # (training always runs the standard branch).  Default ON: the r4f
    # on-chip A/B (bench_logs/r4f_measure.log, BENCHNOTES.md) measured
    # mid full-forward 61.9->46.1 ms and raw 534.1->447.5 ms (raw reg2d
    # 96.7->30.7), with checkpoint-identical trees and numerics asserted
    # by tests/test_reg_folded.py.
    reg2d_fold: bool = True
    # Eval-only algebraic composition of the FPN's last-level tail
    # (out4 distributed over up + inner3, nn/fpn.py:_composed_tail):
    # checkpoint-identical params, training keeps the standard branch.
    # Default ON: the r5a on-chip A/B (BENCHNOTES.md) measured raw FPN
    # 144.0 -> 91.9 ms (full forward 315.1 -> 257.8) and mid FPN
    # 18.9 -> 11.7 (full 39.1 -> 31.8) with the "hconv" formulation.
    fpn_compose: bool = True
    fpn_compose_mode: str = "hconv"  # "hconv" | "up", nn/fpn._composed_tail
    # Measurement-only hook (scripts/probe_train_bwd.py): stop_gradient
    # cuts at named subsystem boundaries so the backward pass can be
    # decomposed by ablation (cotangents past a cut are DCE'd by XLA, so
    # the latency delta vs no-cuts IS that subsystem's backward cost).
    # Values: "fpn" | "cost_volume" | "logits" | "mono".  Forward numerics
    # are unchanged; never set in production (same spirit as the
    # warp_fallbacks observability output above).  "warp" cuts at the
    # warped source features INSIDE the per-view loop: scatter bwd +
    # FPN-via-cv are DCE'd while the correlation/attention bwd still runs.
    sg_cuts: Sequence[str] = ()

    @classmethod
    def dtu_default(cls, **overrides) -> "MVS4NetConfig":
        """The published DTU training config (scripts/train_dtu.sh:20-24)."""
        base = dict(
            group_cor=True,
            group_cor_dim=(8, 8, 4, 4),
            inverse_depth=True,
            mono=True,
            attn_temp=2.0,
        )
        base.update(overrides)
        return cls(**base)


class MVS4Net(nn.Module):
    """4-stage cascaded MVS depth network.

    __call__ args:
      imgs: (B, V, H, W, 3) float images in [0, 1]; view 0 is the reference.
      proj_matrices: dict "stage1".."stage4" -> (B, V, 2, 4, 4).
      depth_values: (B, K) with [:,0]=dmin, [:,-1]=dmax (K=2 in training,
        K=192 in DTU eval).
      train: static bool (batch-norm mode + mono decoder).

    Returns a dict: "stage{i}" sub-dicts with depth / photometric_confidence /
    hypo_depth / attn_weight (+ inverse range bounds, mono depth), plus the
    final stage's fields at the top level.
    """

    config: MVS4NetConfig

    @nn.compact
    def __call__(self, imgs, proj_matrices, depth_values, train: bool = False,
                 return_debug: bool = False):
        cfg = self.config
        b, v, h, w, _ = imgs.shape
        k = depth_values.shape[1]
        depth_min = depth_values[:, 0]
        depth_max = depth_values[:, -1]
        depth_interval = (depth_max - depth_min) / k

        compute_dtype = {"bfloat16": jnp.bfloat16, "float64": jnp.float64}.get(
            cfg.compute_dtype, jnp.float32
        )  # float64: numerics-debugging mode (needs jax_enable_x64)

        # --- feature extraction: fold views into batch for one big conv batch
        if cfg.arch_mode == "fpn":
            backbone = FPN4(cfg.fpn_base_channel, dcn=cfg.dcn,
                            dtype=compute_dtype,
                            compose_tail=cfg.fpn_compose,
                            compose_mode=cfg.fpn_compose_mode,
                            name="feature")
        elif cfg.arch_mode == "convnext":
            backbone = FPN4ConvNeXt(cfg.fpn_base_channel, dcn=cfg.dcn,
                                    compose_tail=cfg.fpn_compose,
                                    compose_mode=cfg.fpn_compose_mode,
                                    name="feature")
        elif cfg.arch_mode == "convnext4":
            backbone = FPN4ConvNeXt4(cfg.fpn_base_channel, dcn=cfg.dcn,
                                     compose_tail=cfg.fpn_compose,
                                     compose_mode=cfg.fpn_compose_mode,
                                     name="feature")
        else:
            raise ValueError(f"unknown arch_mode {cfg.arch_mode}")
        flat = imgs.reshape(b * v, h, w, imgs.shape[-1])
        feats_flat = backbone(flat, train)
        # dict stage -> (B, V, Hs, Ws, C)
        features = {
            key: val.reshape(b, v, *val.shape[1:]) for key, val in feats_flat.items()
        }
        if "fpn" in cfg.sg_cuts:
            features = jax.tree_util.tree_map(jax.lax.stop_gradient, features)

        if cfg.asff:
            asff_mods = [ASFF(i, name=f"asff_{i}") for i in range(cfg.num_stage)]

        outputs: dict[str, Any] = {}
        prev: dict[str, Any] = {}
        for stage_idx in range(cfg.num_stage):
            stage_key = f"stage{stage_idx + 1}"
            if not cfg.asff:
                feat_stage = features[stage_key]  # (B, V, Hs, Ws, C)
            else:
                per_view = []
                for view in range(v):
                    per_view.append(
                        asff_mods[stage_idx](
                            features["stage1"][:, view],
                            features["stage2"][:, view],
                            features["stage3"][:, view],
                            features["stage4"][:, view],
                            train,
                        )
                    )
                feat_stage = jnp.stack(per_view, axis=1)

            hs, ws = feat_stage.shape[2], feat_stage.shape[3]
            ndepth = cfg.stage_splits[stage_idx]

            if stage_idx == 0:
                if cfg.inverse_depth:
                    depth_hypo = init_inverse_range(depth_values, ndepth, hs, ws)
                else:
                    depth_hypo = init_range(depth_values, ndepth, hs, ws)
            else:
                if cfg.inverse_depth:
                    depth_hypo = schedule_inverse_range(
                        jax.lax.stop_gradient(prev["inverse_min_depth"]),
                        jax.lax.stop_gradient(prev["inverse_max_depth"]),
                        ndepth, hs, ws,
                    )
                else:
                    depth_hypo = schedule_range(
                        jax.lax.stop_gradient(prev["depth"]),
                        ndepth,
                        cfg.depth_interals_ratio[stage_idx] * depth_interval,
                        hs, ws,
                    )

            prev = self._stage(
                feat_stage, proj_matrices[stage_key], depth_hypo, stage_idx, train
            )
            if return_debug:
                # intermediates for the vis_ETA-style attention dumps
                # (utils/debug.py attention_maps); additive and jit-safe
                prev["debug_features"] = feat_stage
                prev["debug_proj"] = compose_projection(proj_matrices[stage_key])
            outputs[stage_key] = prev

        outputs.update(prev)  # final-stage fields at top level

        if cfg.mono and train:
            mono_feats = {
                key: outputs[key]["mono_feat"] for key in outputs if key.startswith("stage")
            }
            mono_depths = MonoDepthDecoder(name="mono_depth_decoder")(
                mono_feats, depth_values[:, 0], depth_values[:, 1], train
            )
            if "mono" in cfg.sg_cuts:
                mono_depths = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, mono_depths
                )
            for key, depth in mono_depths.items():
                outputs[key]["mono_depth"] = depth

        return outputs

    def _stage(self, feat_stage, projs, depth_hypo, stage_idx, train):
        """One cascade stage: cost volume -> regularize -> softmax-argmax depth.

        Mirrors stagenet.forward (mvs4net_utils.py:1012-1094).
        """
        cfg = self.config
        warp_impl = "xla" if train else cfg.warp_impl
        if feat_stage.dtype != jnp.float32:
            # the Pallas warp/scatter kernels are f32-only; upcasting bf16
            # features is exact, so bf16 compute mode keeps the fast paths
            # on BOTH the fused inference kernel and the training
            # warp-fwd/scatter-bwd pair (bf16 features would otherwise
            # silently route the train step to XLA's ~8x-slower scatter)
            feat_stage = feat_stage.astype(jnp.float32)
        ref_feat = feat_stage[:, 0]
        src_feats = [feat_stage[:, i] for i in range(1, feat_stage.shape[1])]
        composed = compose_projection(projs)  # (B, V, 4, 4)
        ref_proj = composed[:, 0]
        src_projs = [composed[:, i] for i in range(1, composed.shape[1])]

        # folded-lane emission: when the folded reg2d will consume the
        # volume (same predicate as Reg2d's routing), ask the cost volume
        # for (B, 1, H, W, D*G) directly — on the fused Pallas path that's
        # one transpose from packed space instead of unpack + re-fold.
        fold_cv = (cfg.reg2d_fold and cfg.reg_net == "reg2d" and not train
                   and cfg.agg_type == "ConvBnReLU3D" and cfg.pos_enc == 0)
        cor_feats, warp_fallbacks = build_cost_volume(
            ref_feat,
            src_feats,
            ref_proj,
            src_projs,
            depth_hypo,
            group_cor=cfg.group_cor,
            group_dim=cfg.group_cor_dim[stage_idx],
            attn_temp=cfg.attn_temp,
            attn_fuse_d=cfg.attn_fuse_d,
            impl=warp_impl,
            with_fallbacks=True,
            out_layout="folded" if fold_cv else "bdhwc",
            sg_warp="warp" in cfg.sg_cuts,
        )  # (B, D, H, W, G|C) [folded: (B, 1, H, W, D*G)], int32 scalar
        if "cost_volume" in cfg.sg_cuts:
            cor_feats = jax.lax.stop_gradient(cor_feats)

        if cfg.pos_enc == 1:
            cor_feats = PosEncSine(name=f"pos_enc_{stage_idx}")(cor_feats, depth_hypo)
        elif cfg.pos_enc == 2:
            cor_feats = PosEncLearned(
                cfg.stage_splits[stage_idx], name=f"pos_enc_{stage_idx}"
            )(cor_feats)

        compute_dtype = {"bfloat16": jnp.bfloat16, "float64": jnp.float64}.get(
            cfg.compute_dtype, jnp.float32
        )  # float64: numerics-debugging mode (needs jax_enable_x64)
        if cfg.reg_net == "reg2d":
            regnet = Reg2d(cfg.reg_channel, cfg.agg_type, dtype=compute_dtype,
                           fold=cfg.reg2d_fold, name=f"reg_{stage_idx}")
        else:
            regnet = Reg3d(
                cfg.reg_channel, cfg.reg3d_down_size[stage_idx],
                name=f"reg_{stage_idx}",
            )
        if fold_cv:
            logits = regnet(cor_feats, train, input_folded=True,
                            depth=depth_hypo.shape[1])  # (B, D, H, W)
        else:
            logits = regnet(cor_feats, train)  # (B, D, H, W)
        if "logits" in cfg.sg_cuts:
            logits = jax.lax.stop_gradient(logits)
        attn_weight = jax.nn.softmax(logits.astype(jnp.float32), axis=1)

        # winner-take-all depth (reference: gather of argmax,
        # mvs4net_utils.py:1071-1072).  Formulated as one-hot x sum instead of
        # take_along_axis: argmax keeps the exact first-max tie semantics, and
        # the one-hot select is pure elementwise work — take_along_axis lowers
        # to an XLA gather that costs ~4 ms/stage at 512x640 on TPU (~40x this
        # formulation; BENCHNOTES.md).
        idx = jnp.argmax(attn_weight, axis=1)  # (B, H, W)
        d_iota = jnp.arange(attn_weight.shape[1], dtype=idx.dtype)
        onehot = idx[:, None] == d_iota[None, :, None, None]  # (B, D, H, W)
        depth = jnp.sum(depth_hypo * onehot, axis=1)  # (B, H, W)

        conf = jnp.max(attn_weight, axis=1)  # (B, H, W)
        up = 2 ** (3 - stage_idx)
        if up > 1:
            conf = resize_bilinear_align_corners(
                conf[..., None], conf.shape[1] * up, conf.shape[2] * up
            )[..., 0]

        ret = {
            "depth": depth,
            "photometric_confidence": conf,
            "hypo_depth": depth_hypo,
            "attn_weight": attn_weight,
            # source views that did NOT run on the requested Pallas warp
            # kernel this stage (0 = all on-kernel; the axon runtime has no
            # host callbacks, so observability is an output, not a hook)
            "warp_fallbacks": warp_fallbacks,
        }
        if cfg.inverse_depth:
            itv = 1.0 / depth_hypo[:, 2] - 1.0 / depth_hypo[:, 1]  # (B, H, W)
            split = cfg.depth_interals_ratio[stage_idx]
            ret["inverse_min_depth"] = 1.0 / depth + split * itv
            ret["inverse_max_depth"] = 1.0 / depth - split * itv
        if cfg.mono:
            ret["mono_feat"] = feat_stage[:, 0]
        return ret
