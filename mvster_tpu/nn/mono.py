"""Detachable monocular-depth auxiliary decoder (monodepth2-style).

For each consecutive stage pair (i, i+1), upsamples the coarse reference
feature, concatenates with the finer one, predicts a sigmoid disparity and
maps it into [dmin, dmax].  Training-only auxiliary supervision; mirrors
mono_depth_decoder (/root/reference/models/mvs4net_utils.py:833-868).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvster_tpu.core.sampling import upsample_nearest_2x
from mvster_tpu.nn.blocks import ConvBlock2d


class MonoDepthDecoder(nn.Module):
    """Takes per-stage reference features; emits mono depth for stages 2..4.

    mono_feats: dict stage name -> (B, H, W, C) reference-view FPN feature,
    with channels (64, 32, 16, 8) for stage1..4.
    d_min, d_max: (B,) scene depth range.
    Returns {"stage2": (B,H,W), "stage3": ..., "stage4": ...}.
    """

    @nn.compact
    def __call__(self, mono_feats, d_min, d_max, train: bool = False):
        channels = [32, 16, 8]
        out = {}
        for i in range(1, 4):
            small = mono_feats[f"stage{i}"]
            large = mono_feats[f"stage{i + 1}"]
            small = ConvBlock2d(
                channels[i - 1], 3, 1, 1, name=f"convblock{i - 1}"
            )(small, train)
            small = upsample_nearest_2x(small)
            feat = jnp.concatenate([small, large], axis=-1)
            disp_logit = nn.Conv(1, (3, 3), padding=1, name=f"conv3x3_{i - 1}")(feat)
            disp = jax.nn.sigmoid(disp_logit)[..., 0]  # (B, H, W)
            min_disp = (1.0 / d_max)[:, None, None]
            max_disp = (1.0 / d_min)[:, None, None]
            scaled = min_disp + (max_disp - min_disp) * disp
            out[f"stage{i + 1}"] = 1.0 / scaled
        return out
