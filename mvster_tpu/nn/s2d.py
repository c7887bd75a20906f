"""Weight-equivalent space-to-depth (s2d) convolutions for low-channel convs.

TPU MXU rationale: a 3x3 conv with <=16 output channels at megapixel
resolution uses ~C/128 of the MXU lanes — measured 1-3 TF/s at raw DTU
shapes (scripts/probe_conv_eff.py), which is why FPN4 + reg2d cost
242 ms of the 608 ms raw forward (BENCHNOTES.md component map).  Rewriting
the conv to operate on f=2 space-to-depth blocks multiplies both channel
axes by 4 at 1/4 the spatial positions: same math (exact weight transform
below, tests/test_s2d.py), ~4x the lane utilization.  Measured on the
ISOLATED-conv probe: 1.9x (f32) to 4x (bf16) on FPN's out4
(64->8 @ 1152x1600) — but the win does NOT survive inside the compiled
model (round-3 on-chip maps: FPN/reg2d all regress), so routing is OFF
by default (S2D_ENABLED below).

The transforms are weight-EQUIVALENT, not approximations — parameter
trees, checkpoint conversion and training gradients are unchanged; only
the XLA program differs (f32 sums reassociate, so outputs match the
direct conv to ~1e-5 relative, not bitwise).

Reference equivalents: the torch convs inside FPN4 / reg2d
(/root/reference/models/mvs4net_utils.py:419-502, 870-923) — the
reference runs them directly; cuDNN has no lane cliff at C=8 the way the
128-wide MXU does, so this rewrite has no reference counterpart.

Derivations (f=2, one axis; the 2D case is the outer product):

* 3x3 stride-1 SAME conv.  Pad the input by 1 (top/left AND bottom/right),
  s2d the padded image with block alignment such that block t holds
  original rows {2t-1, 2t}.  Then output rows {2i, 2i+1} need exactly
  input blocks {i, i+1}: y[2i+oi] = sum_k w[k] x[2i+oi+k-1] and the input
  row 2(i+si)-1+di carries tap k = 2*si + di - oi, valid iff 0<=k<=2.
  The big kernel is (2,2,4cin,4cout) with 9/16 nonzero entries — pays
  16/9 the FLOPs for >4x the lanes.

* k=3 stride-2 transpose conv (torch ConvTranspose, padding=1,
  output_padding=1; stored here as the FLIPPED kernel driving an
  input-dilated conv with padding (1,2) — see ConvTransposeBnReLU3d).
  out[2i]   = w[1] x[i]
  out[2i+1] = w[0] x[i] + w[2] x[i+1]
  i.e. a size-2 VALID conv (x padded by one row at the end) producing
  4*cout channels, then depth-to-space.  Compute stays at the LOW
  resolution with 4x the output lanes, instead of XLA's input-dilated
  conv at the high resolution with the raw lane count.
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Static routing heuristic: s2d pays 16/9 the FLOPs, so it only wins where
# the lane cliff dominates — low channel counts at large spatial sizes.
# Thresholds from scripts/probe_conv_eff.py / probe_s2d_model.py on v5e.
S2D_MAX_COUT = 16
S2D_MIN_PIXELS = 256 * 320

# (si, di, oi) -> tap index into the (k+1)-padded kernel; 3 is the zero
# slot (tap 2*si + di - oi falls outside the 3-tap kernel).
_FWD_TAP = np.full((2, 2, 2), 3, np.int32)
for _si in range(2):
    for _di in range(2):
        for _oi in range(2):
            _k = 2 * _si + _di - _oi
            if 0 <= _k <= 2:
                _FWD_TAP[_si, _di, _oi] = _k

# (si, oi) -> tap index for the transpose-conv rewrite (flipped kernel,
# input-dilated formulation: k = 1 + 2*si - oi).
_TR_TAP = np.full((2, 2), 3, np.int32)
for _si in range(2):
    for _oi in range(2):
        _k = 1 + 2 * _si - _oi
        if 0 <= _k <= 2:
            _TR_TAP[_si, _oi] = _k


# ROUTING IS OFF BY DEFAULT (round 4).  The isolated-conv probe predicted a
# 1.9x f32 win on FPN's out4 at raw sizes, but judge-measured on-chip
# component maps (VERDICT.md round 3, BENCHNOTES.md) show the routed model
# LOSES everywhere once the pad/space_to_depth/depth_to_space transposes sit
# in the compiled graph: mid FPN 18.5 -> 39.1 ms, raw FPN 144.3 -> 269.1 ms,
# raw reg2d 97.7 -> 130.9 ms.  The transforms stay (weight-equivalent,
# tested in tests/test_s2d.py) but routing must be re-enabled explicitly —
# set MVSTER_S2D=1 only with an on-chip in-model A/B blessing the routed
# shapes (scripts/probe_conv_eff.py bench_s2d_real / probe_s2d_model.py).
S2D_ENABLED = os.environ.get("MVSTER_S2D", "0") == "1"


def use_s2d(h: int, w: int, cout: int) -> bool:
    """Static shape heuristic: route a 3x3/transpose conv through s2d?

    Gated on S2D_ENABLED (default False): the rewrite is measured to lose
    in-model on v5e despite winning in isolation (see note above).
    """
    return (
        S2D_ENABLED
        and cout <= S2D_MAX_COUT
        and h % 2 == 0
        and w % 2 == 0
        and h * w >= S2D_MIN_PIXELS
    )


def space_to_depth(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // f, w // f, f * f * c
    )


def depth_to_space(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    c0 = c // (f * f)
    x = x.reshape(b, h, w, f, f, c0)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h * f, w * f, c0
    )


def _big_kernel_fwd(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,cout) -> (2,2,4cin,4cout) s2d-equivalent kernel.

    Input channel order (di, dj, ci), output (oi, oj, co) — matching
    space_to_depth / depth_to_space reshape conventions.
    """
    _, _, cin, cout = w.shape
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # index 3 = zeros
    ki = _FWD_TAP[:, None, :, None, :, None]  # (si,1,di,1,oi,1)
    kj = _FWD_TAP[None, :, None, :, None, :]  # (1,sj,1,dj,1,oj)
    big = wp[ki, kj]  # (si,sj,di,dj,oi,oj,cin,cout)
    big = jnp.transpose(big, (0, 1, 2, 3, 6, 4, 5, 7))
    return big.reshape(2, 2, 4 * cin, 4 * cout)


def _big_kernel_tr(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,cout) FLIPPED transpose kernel -> (2,2,cin,4cout)."""
    _, _, cin, cout = w.shape
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    ki = _TR_TAP[:, None, :, None]  # (si,1,oi,1)
    kj = _TR_TAP[None, :, None, :]  # (1,sj,1,oj)
    big = wp[ki, kj]  # (si,sj,oi,oj,cin,cout)
    big = jnp.transpose(big, (0, 1, 4, 2, 3, 5))
    return big.reshape(2, 2, cin, 4 * cout)


def conv3x3_s2d(x, kernel, bias=None):
    """3x3 stride-1 SAME conv on NHWC via f=2 space-to-depth.

    Exact (up to f32 reassociation) rewrite of
    lax.conv(x, kernel, (1,1), padding=1).  Requires even H, W.
    """
    b, h, w, cin = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = space_to_depth(xp, 2)  # (b, h/2+1, w/2+1, 4cin)
    big = _big_kernel_fwd(kernel).astype(x.dtype)
    ys = jax.lax.conv_general_dilated(
        xs, big, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (b, h/2, w/2, 4cout)
    y = depth_to_space(ys, 2)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def convT3x3s2_s2d(x, kernel):
    """k=3 stride-2 transpose conv (flipped-kernel input-dilated form,
    padding (1,2)) on NHWC via depth-to-space: compute at input resolution
    with 4x output channels.  Exact rewrite of ConvTransposeBnReLU3d's
    H/W axes."""
    b, h, w, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # tap s=i+1 edge
    big = _big_kernel_tr(kernel).astype(x.dtype)
    ys = jax.lax.conv_general_dilated(
        xp, big, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (b, h, w, 4cout)
    return depth_to_space(ys, 2)


def conv333_s2d(x, kernel):
    """3x3x3 stride-1 SAME conv on (B, D, H, W, C) via f=2 space-to-depth.

    Depth-tap decomposition: concatenate the D-axis neighbors channel-wise
    (zero-padded), fold the (dd, ci) pair into one 3*cin input-channel
    axis, and run the H/W part through conv3x3_s2d — one dense 2D s2d
    conv instead of a 3D conv whose <=16 output channels waste the MXU
    lanes.  Exact (up to f32 reassociation) rewrite of the (3,3,3) SAME
    conv used by reg2d's aggregation blocks (nn/reg.py; reference
    mvs4net_utils.py:870-923)."""
    b, dd, h, w, c = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    x3 = jnp.concatenate(
        [xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=-1
    )  # (B, D, H, W, 3C); channel index = dtap*c + ci
    k2 = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * c, cout)
    y = conv3x3_s2d(x3.reshape(b * dd, h, w, 3 * c), k2)
    return y.reshape(b, dd, h, w, cout)


class S2DConv333(nn.Module):
    """Drop-in for nn.Conv(features, (3,3,3), SAME, no bias) on
    (B, D, H, W, C): identical param tree ('kernel' (3,3,3,cin,cout)
    DHWIO); routes through conv333_s2d when the static shape qualifies."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, cin, self.features),
        )
        dtype = self.dtype or jnp.float32
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        h, w = x.shape[-3], x.shape[-2]
        if use_s2d(h, w, self.features):
            return conv333_s2d(x, kernel)
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )


class S2DConv133(nn.Module):
    """Drop-in for nn.Conv(features, (1,3,3), stride 1) on (B,D,H,W,C):
    identical param tree ('kernel' (1,3,3,cin,cout) DHWIO), depth folded
    into batch so the H/W conv routes through s2d."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 3, 3, cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias else None
        )
        dtype = self.dtype or jnp.float32
        x = x.astype(dtype)
        b, dd, h, w, _ = x.shape
        if use_s2d(h, w, self.features):
            y = conv3x3_s2d(
                x.reshape(b * dd, h, w, cin), kernel[0].astype(dtype), bias
            )
            return y.reshape(b, dd, h, w, self.features)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), (1, 1, 1),
            ((0, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y if bias is None else y + bias.astype(y.dtype)


class S2DConv(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), padding=1): identical param
    tree ('kernel' (3,3,cin,cout) HWIO + optional 'bias'), computes via
    s2d when the static shape qualifies, else the direct conv."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias else None
        )
        dtype = self.dtype or jnp.float32
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        h, w = x.shape[-3], x.shape[-2]
        if use_s2d(h, w, self.features):
            return conv3x3_s2d(x, kernel, bias)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if bias is None else y + bias.astype(y.dtype)
