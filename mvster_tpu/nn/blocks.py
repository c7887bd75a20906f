"""Flax building blocks: conv+norm+activation units and 3D aggregation variants.

Layout is channels-last throughout: 2D features are (B, H, W, C), cost volumes
are (B, D, H, W, C) — the native layout for XLA convolutions on TPU.

Behavioral contracts mirror the reference blocks (Conv2d wrapper at
/root/reference/models/mvs4net_utils.py:224-251, ConvBnReLU3D family at
:116-195): conv bias only when the norm is GroupNorm, BatchNorm with torch
eps/momentum, and the channel/depth/pixel attention residual variants.
Transposed 3D convs are expressed as input-dilated regular convolutions
(kernel pre-flipped at conversion time), which XLA lowers to the same MXU
program as a backward conv — no separate deconv kernel needed.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# Norms always compute in f32 (bf16 running statistics drift); convs take the
# configured compute dtype so the MXU runs bf16 when asked.


class ConvBlock2d(nn.Module):
    """Conv2d -> BatchNorm/GroupNorm -> optional ReLU (channels-last)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    relu: bool = True
    gn: bool = False
    group_channel: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.gn,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.gn:
            groups = int(max(1, self.out_channels / self.group_channel))
            x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="gn")(x)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


def _bn3d(train: bool, name: str = "bn"):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=jnp.float32, name=name,
    )


def _to_tuple3(k) -> tuple[int, int, int]:
    if isinstance(k, int):
        return (k, k, k)
    return tuple(k)


class ConvBnReLU3D(nn.Module):
    """3D conv (no bias) -> BN -> ReLU on (B, D, H, W, C) volumes."""

    out_channels: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    pad: Sequence[int] | int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _to_tuple3(self.kernel_size)
        s = _to_tuple3(self.stride)
        p = _to_tuple3(self.pad)
        x = nn.Conv(
            self.out_channels,
            k,
            strides=s,
            padding=tuple((pi, pi) for pi in p),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.relu(_bn3d(train)(x))


class _MLPAgg(nn.Module):
    """Shared two-layer MLP used by the channel-attention variants."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.channels // 2, name="fc0")(x)
        x = nn.relu(x)
        return nn.Dense(self.channels, name="fc1")(x)


class ConvBnReLU3D_CAM(nn.Module):
    """Conv3D + channel attention (squeeze over D*H*W) + residual BN-ReLU.

    Mirrors ConvBnReLU3D_CAM (mvs4net_utils.py:125-143): sigmoid(MLP(avg) +
    MLP(max)) channel gates, applied to the conv output, residual-added to the
    block input before BN+ReLU.
    """

    out_channels: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    pad: Sequence[int] | int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        k = _to_tuple3(self.kernel_size)
        x = nn.Conv(
            self.out_channels, k, strides=_to_tuple3(self.stride),
            padding=tuple((p, p) for p in _to_tuple3(self.pad)),
            use_bias=False, name="conv",
        )(x)
        mlp = _MLPAgg(self.out_channels, name="linear_agg")
        avg_attn = mlp(jnp.mean(x, axis=(1, 2, 3)))  # (B, C)
        max_attn = mlp(jnp.max(x, axis=(1, 2, 3)))
        attn = jax.nn.sigmoid(avg_attn + max_attn)[:, None, None, None, :]
        x = x * attn
        return nn.relu(_bn3d(train)(x + inp))


class ConvBnReLU3D_DCAM(nn.Module):
    """Conv3D + depth-wise channel attention (squeeze over H*W only)."""

    out_channels: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    pad: Sequence[int] | int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        x = nn.Conv(
            self.out_channels, _to_tuple3(self.kernel_size),
            strides=_to_tuple3(self.stride),
            padding=tuple((p, p) for p in _to_tuple3(self.pad)),
            use_bias=False, name="conv",
        )(x)
        mlp = _MLPAgg(self.out_channels, name="linear_agg")
        avg_attn = mlp(jnp.mean(x, axis=(2, 3)))  # (B, D, C)
        max_attn = mlp(jnp.max(x, axis=(2, 3)))
        attn = jax.nn.sigmoid(avg_attn + max_attn)[:, :, None, None, :]
        x = x * attn
        return nn.relu(_bn3d(train)(x + inp))


class ConvBnReLU3D_PAM(nn.Module):
    """Conv3D + pixel attention: 7x7 conv over (max, avg) of flattened C*D."""

    out_channels: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    pad: Sequence[int] | int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        x = nn.Conv(
            self.out_channels, _to_tuple3(self.kernel_size),
            strides=_to_tuple3(self.stride),
            padding=tuple((p, p) for p in _to_tuple3(self.pad)),
            use_bias=False, name="conv",
        )(x)
        # (B, D, H, W, C) -> stats over the combined (D, C) axes per pixel
        max_attn = jnp.max(x, axis=(1, 4))  # (B, H, W)
        avg_attn = jnp.mean(x, axis=(1, 4))
        stats = jnp.stack([max_attn, avg_attn], axis=-1)  # (B, H, W, 2)
        gate = nn.Conv(1, (7, 7), padding="SAME", name="pixel_conv")(stats)
        gate = jax.nn.sigmoid(gate)[:, None, :, :, :]  # (B, 1, H, W, 1)
        x = x * gate
        return nn.relu(_bn3d(train)(x + inp))


class ConvBnReLU3D_PDAM(nn.Module):
    """Conv3D + pixel-depth attention: 7^3 conv over (max, avg) channel stats."""

    out_channels: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    pad: Sequence[int] | int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        x = nn.Conv(
            self.out_channels, _to_tuple3(self.kernel_size),
            strides=_to_tuple3(self.stride),
            padding=tuple((p, p) for p in _to_tuple3(self.pad)),
            use_bias=False, name="conv",
        )(x)
        max_attn = jnp.max(x, axis=-1, keepdims=True)  # (B, D, H, W, 1)
        avg_attn = jnp.mean(x, axis=-1, keepdims=True)
        stats = jnp.concatenate([max_attn, avg_attn], axis=-1)
        gate = nn.Conv(1, (7, 7, 7), padding="SAME", name="spatial_conv")(stats)
        gate = jax.nn.sigmoid(gate)
        x = x * gate
        return nn.relu(_bn3d(train)(x + inp))


AGG_BLOCKS = {
    "ConvBnReLU3D": ConvBnReLU3D,
    "ConvBnReLU3D_CAM": ConvBnReLU3D_CAM,
    "ConvBnReLU3D_DCAM": ConvBnReLU3D_DCAM,
    "ConvBnReLU3D_PAM": ConvBnReLU3D_PAM,
    "ConvBnReLU3D_PDAM": ConvBnReLU3D_PDAM,
}


# Measured crossover for routing the (1,3,3)/(1,2,2) transpose conv onto
# its polyphase decomposition (scripts/probe_reg_layers.py, TPU v5e f32):
# polyphase wins at 288x400 inputs (1.19 -> 0.14 ms) and 576x800
# (4.90 -> 1.34 ms); the input-dilated form wins at 144x200 (0.08 vs
# 0.37 ms).  Route polyphase only at and above the smallest measured win.
_POLYPHASE_MIN_PIXELS = 288 * 400


def deconv_dilated(x, kernel, k, s):
    """Transposed conv as an input-dilated regular convolution.

    For torch's ConvTranspose3d(k=3, stride=s, padding=1, output_padding=1)
    the equivalent is lhs_dilation=s with per-axis padding (1, 2) on
    upsampled axes and (k-1, k-1) on unit-stride axes.  `kernel` is the
    *flipped* torch kernel in DHWIO layout (the checkpoint converter
    performs the flip).
    """
    pad = []
    for ki, si in zip(k, s):
        if si == 1:
            # k=1 axis of reg2d deconvs: torch pad 0 -> lo = hi = k-1 = 0
            pad.append((ki - 1 if ki == 1 else ki - 2,) * 2)
        else:
            # torch pad=1, output_padding=1: lo = k-1-pad, hi = k-1-pad+opad
            pad.append((ki - 2, ki - 1))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1, 1),
        padding=pad,
        lhs_dilation=s,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def deconv_polyphase_2x2(x, kernel):
    """(1,3,3)/(1,2,2) transposed conv as a polyphase decomposition.

    The input-dilated form pays 9 taps per output pixel of which 5-8 hit
    interleaved zeros — at reg2d's tiny channel counts the conv is tap-
    bound, so the zeros are pure waste.  Polyphase instead convolves the
    UNDILATED input with a dense 2x2 kernel emitting 4*cout channels (one
    per output parity phase) and interleaves with a depth_to_space
    reshape: out[2i+oi, 2j+oj] sums input taps (i+si, j+sj) whose flipped-
    kernel index (1+2si-oi, 1+2sj-oj) is in range.  Same arithmetic, 4x
    the lanes, no zero taps; parity vs deconv_dilated ~1e-6 (probe +
    tests/test_blocks_polyphase.py).
    """
    co = kernel.shape[4]
    zeros = jnp.zeros_like(kernel[0, 0, 0])  # (ci, co)
    rows = []
    for si in range(2):
        cols = []
        for sj in range(2):
            phases = []
            for oi in range(2):
                for oj in range(2):
                    ki, kj = 1 + 2 * si - oi, 1 + 2 * sj - oj
                    tap = kernel[0, ki, kj] if 0 <= ki <= 2 and 0 <= kj <= 2 else zeros
                    phases.append(tap)
            cols.append(jnp.concatenate(phases, axis=-1))  # (ci, 4co)
        rows.append(jnp.stack(cols, axis=0))
    kb = jnp.stack(rows, axis=0)[None]  # (1, 2, 2, ci, 4co)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kb, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # (B, D, H, W, 4co)
    b, d, hh, ww, _ = y.shape
    y = y.reshape(b, d, hh, ww, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 2, 4, 3, 5, 6))
    return y.reshape(b, d, 2 * hh, 2 * ww, co)


class ConvTransposeBnReLU3d(nn.Module):
    """Transposed 3D conv (stride (1,2,2) or (2,2,2)) -> BN -> ReLU.

    Routes between two same-numerics formulations of the transposed conv:
    the input-dilated regular convolution (general; see deconv_dilated)
    and, for the reg2d (1,3,3)/(1,2,2) case at large spatial sizes, the
    polyphase decomposition (deconv_polyphase_2x2) — routing threshold is
    the measured table at _POLYPHASE_MIN_PIXELS.
    """

    out_channels: int
    stride: Sequence[int]  # e.g. (1, 2, 2) or (2, 2, 2)
    kernel_size: Sequence[int] = (3, 3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        k = tuple(self.kernel_size)
        s = tuple(self.stride)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            k + (in_ch, self.out_channels),
        )
        h, w = x.shape[-3], x.shape[-2]
        if k == (1, 3, 3) and s == (1, 2, 2) and h * w >= _POLYPHASE_MIN_PIXELS:
            x = deconv_polyphase_2x2(x, kernel.astype(x.dtype))
        else:
            x = deconv_dilated(x, kernel.astype(x.dtype), k, s)
        return nn.relu(_bn3d(train)(x))
