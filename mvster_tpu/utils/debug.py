"""Debug dump utilities: the vis_ETA / vis_mono / save_jpg equivalents.

The reference scatters .npy/.jpg dumps through the model forward
(mvs4net_utils.py:46-48, 1044-1046; MVS4Net.py:70-75; test_mvs4.py:232-251).
Side effects inside a jitted forward are a non-starter on TPU, so the
equivalent here is a post-hoc dumper: the model returns its intermediates in
the output dict and DebugDumper writes the requested subset after the step.
`attention_maps` reproduces the vis_ETA per-view epipolar attention volumes
from the cost-volume builder outside jit.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


class DebugDumper:
    def __init__(self, outdir: str, enabled: bool = True):
        self.outdir = outdir
        self.enabled = enabled
        if enabled:
            os.makedirs(outdir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.outdir, name)

    def save_npy(self, name: str, array) -> None:
        if self.enabled:
            np.save(self._path(name), np.asarray(array))

    def save_depth_jpg(self, name: str, depth) -> None:
        """Jet-colormapped depth visualization (the --save_jpg path)."""
        if not self.enabled:
            return
        import cv2

        depth = np.asarray(depth)
        valid = depth > 0
        mi = depth[valid].min() if valid.any() else 0.0
        ma = depth.max()
        norm = np.clip((depth - mi) / (ma - mi + 1e-8), 0, 1)
        cv2.imwrite(
            self._path(name), cv2.applyColorMap((255 * norm).astype(np.uint8),
                                                cv2.COLORMAP_JET)
        )

    def dump_stage_outputs(self, outputs: dict, prefix: str = "") -> None:
        """Write per-stage attention volumes + depths (vis_ETA equivalent)."""
        if not self.enabled:
            return
        for key, stage in outputs.items():
            if not key.startswith("stage") or not isinstance(stage, dict):
                continue
            self.save_npy(f"{prefix}{key}_attn_weight.npy", stage["attn_weight"])
            self.save_npy(f"{prefix}{key}_hypo_depth.npy", stage["hypo_depth"])
            self.save_depth_jpg(
                f"{prefix}{key}_depth.jpg", np.asarray(stage["depth"])[0]
            )
            if "mono_depth" in stage:
                self.save_depth_jpg(
                    f"{prefix}{key}_mono.jpg", np.asarray(stage["mono_depth"])[0]
                )


def attention_maps(ref_feat, src_feats, ref_proj, src_projs, depth_hypo,
                   group_cor=True, group_dim=8, attn_temp=2.0):
    """Per-source-view epipolar attention volumes (vis_ETA dumps).

    Returns (V, B, D, H, W) softmax-over-depth attention per view, computed
    the same way stagenet weighs views (mvs4net_utils.py:1044-1046).
    """
    from mvster_tpu.kernels.cost_volume import correlate, warp_src_feature

    import jax

    maps = []
    for feat, proj in zip(src_feats, src_projs):
        warped = warp_src_feature(feat, proj, ref_proj, depth_hypo)
        cor = correlate(warped, ref_feat, group_cor, group_dim)
        maps.append(jax.nn.softmax(jnp.sum(cor, axis=-1), axis=1))
    return jnp.stack(maps)
