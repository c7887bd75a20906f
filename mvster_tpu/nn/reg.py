"""Cost-volume regularization U-Nets over (B, D, H, W, C) volumes.

Reg2d is the default MVSTER regularizer: a U-Net whose strided convolutions
only touch H/W (kernel (1,3,3), stride (1,2,2)) while the configurable
aggregation blocks at each scale (default full 3x3x3 ConvBnReLU3D) mix the
depth-hypothesis axis.  Reg3d is the true-3D alternative with stride 2 on all
of (D, H, W) and a configurable number of down levels.  Behavioral contracts
mirror reg2d / reg3d (/root/reference/models/mvs4net_utils.py:870-965).

Channels-last NDHWC layout: XLA on TPU maps these directly onto the MXU with
the depth axis folded into the batch for the (1,3,3) convs.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvster_tpu.nn.blocks import (
    AGG_BLOCKS,
    _POLYPHASE_MIN_PIXELS,
    ConvBnReLU3D,
    ConvTransposeBnReLU3d,
    deconv_dilated,
    deconv_polyphase_2x2,
)

# ---------------------------------------------------------------------------
# Folded-depth reg2d formulation.
#
# The U-Net's channel counts are tiny (8..64 at the late stages) while the
# MXU contracts 128 lanes per pass: a (1,3,3) conv at C=8 wastes 15/16 of
# every systolic pass (measured 0.02-0.7 TF/s on the stage-4 layers —
# BENCHNOTES.md FPN/reg layer maps).  Since the (1,3,3) convs don't mix the
# depth-hypothesis axis at all, fold D into the lane dimension ONCE at
# entry — (B, D, H, W, C) -> (B, 1, H, W, D*C) — and run the whole U-Net in
# that layout:
#   * (1,3,3) convs keep identical arithmetic with a block-diagonal
#     kron(I_D, K) kernel (D x the lanes, 1/D the rows, same bytes);
#   * the 3x3x3 aggregation convs become block-BANDED (1,3,3) kernels —
#     output depth-block d reads input blocks d-1, d, d+1, exactly the
#     zero-padded depth conv;
#   * BatchNorm in eval mode is a per-channel affine — tile scale/bias D x;
#   * the 1x1x1 prob conv becomes a (D*Cin -> D) block-diagonal matmul.
# One transpose in, one transpose out, zero per-op layout churn — the
# whole-subgraph structure whose absence killed the s2d conv rewrite
# (BENCHNOTES.md "s2d: measured in-model verdict").
#
# The folded branch declares param-mirror modules with IDENTICAL variable
# paths/shapes/initializers to the standard branch, so checkpoints and init
# RNG streams are interchangeable (tests/test_reg_folded.py asserts trees
# and numerics).  Eval-only: training routes to the standard branch (BN
# batch statistics).  Reference semantics: reg2d at
# /root/reference/models/mvs4net_utils.py:870-907.
# ---------------------------------------------------------------------------


def fold_volume(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, 1, H, W, D*C), depth-major lane order."""
    b, d, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, 1, h, w, d * c)


def fold_kernel_diag(kernel: jnp.ndarray, d: int) -> jnp.ndarray:
    """kron(I_D, K) over channels: (kd,kh,kw,ci,co) -> (kd,kh,kw,d*ci,d*co)."""
    kd, kh, kw, ci, co = kernel.shape
    eye = jnp.eye(d, dtype=kernel.dtype)
    out = jnp.einsum("ab,dyxio->dyxaibo", eye, kernel)
    return out.reshape(kd, kh, kw, d * ci, d * co)


def fold_kernel_band(kernel: jnp.ndarray, d: int) -> jnp.ndarray:
    """Depth-conv kernel -> block-banded folded kernel.

    (3,kh,kw,ci,co) with depth pad 1 -> (1,kh,kw,d*ci,d*co) where input
    block a feeds output block b iff a == b + kd - 1 for tap kd.
    """
    _, kh, kw, ci, co = kernel.shape
    a = jnp.arange(d)
    sel = (a[None, :, None] == a[None, None, :]
           + jnp.arange(3)[:, None, None] - 1)
    out = jnp.einsum("kab,kyxio->yxaibo", sel.astype(kernel.dtype), kernel)
    return out.reshape(1, kh, kw, d * ci, d * co)


class _FConv(nn.Module):
    """Param-mirror of ConvBnReLU3D's nn.Conv, applied in folded lane space."""

    features: int
    kernel_size: Sequence[int]  # UNFOLDED (1,3,3) or (3,3,3)
    stride: Sequence[int]
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.depth
        ci = x.shape[-1] // d
        k = tuple(self.kernel_size)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), k + (ci, self.features)
        ).astype(self.dtype)
        kf = fold_kernel_diag(kernel, d) if k[0] == 1 else fold_kernel_band(kernel, d)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kf,
            (1,) + tuple(self.stride)[1:],
            [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )


class _FBNRelu(nn.Module):
    """Param-mirror of eval-mode BatchNorm+ReLU: a D-tiled f32 affine."""

    features: int
    depth: int

    @nn.compact
    def __call__(self, x):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        a = scale.astype(jnp.float32) * jax.lax.rsqrt(var.value + 1e-5)
        b = bias.astype(jnp.float32) - mean.value * a
        y = x.astype(jnp.float32) * jnp.tile(a, self.depth) + jnp.tile(b, self.depth)
        return nn.relu(y)


class _FoldedConvBnReLU3D(nn.Module):
    """Folded-space mirror of ConvBnReLU3D (conv/bn child names match)."""

    out_channels: int
    depth: int
    kernel_size: Sequence[int] = (3, 3, 3)
    stride: Sequence[int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _FConv(self.out_channels, self.kernel_size, self.stride,
                   self.depth, self.dtype, name="conv")(x)
        return _FBNRelu(self.out_channels, self.depth, name="bn")(x)


class _FoldedConvTranspose(nn.Module):
    """Folded-space mirror of ConvTransposeBnReLU3d ((1,3,3)/(1,2,2) case)."""

    out_channels: int
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        d = self.depth
        ci = x.shape[-1] // d
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (1, 3, 3, ci, self.out_channels),
        )
        kf = fold_kernel_diag(kernel.astype(x.dtype), d)
        h, w = x.shape[-3], x.shape[-2]
        if h * w >= _POLYPHASE_MIN_PIXELS:
            x = deconv_polyphase_2x2(x, kf)
        else:
            x = deconv_dilated(x, kf, (1, 3, 3), (1, 2, 2))
        return _FBNRelu(self.out_channels, self.depth, name="bn")(x)


class _FoldedProb(nn.Module):
    """Folded-space mirror of the 1x1x1 prob conv: (.., D*Cin) -> (.., D)."""

    depth: int

    @nn.compact
    def __call__(self, x):
        d = self.depth
        ci = x.shape[-1] // d
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, 1, ci, 1)
        )
        bias = self.param("bias", nn.initializers.zeros, (1,))
        kf = fold_kernel_diag(kernel.astype(x.dtype), d)
        y = jax.lax.conv_general_dilated(
            x, kf, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + bias[0].astype(y.dtype)


class Reg2d(nn.Module):
    """(B, D, H, W, Cin) -> (B, D, H, W) regularized logits.

    `fold=True` routes eval forwards (train=False, default agg block) onto
    the folded-depth formulation above; training and attention-agg variants
    always use the standard per-module path.  Both branches declare the
    same variable tree, so the flag can differ between init and apply.
    """

    base_channels: int = 8
    agg_type: str = "ConvBnReLU3D"
    dtype: Any = None
    fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, *,
                 input_folded: bool = False, depth: int | None = None):
        b = self.base_channels
        agg = AGG_BLOCKS[self.agg_type]
        dtype = self.dtype or jnp.float32

        if input_folded:
            # already (B, 1, H, W, depth*C) — only the folded branch can
            # consume this layout (the producer gates on the same predicate)
            assert (self.fold and not train
                    and self.agg_type == "ConvBnReLU3D" and depth is not None)

        if self.fold and not train and self.agg_type == "ConvBnReLU3D":
            if input_folded:
                d = depth
                x = x.astype(dtype)
            else:
                d = x.shape[1]
                x = fold_volume(x.astype(dtype))
            k133 = dict(kernel_size=(1, 3, 3), depth=d, dtype=dtype)
            conv0 = _FoldedConvBnReLU3D(b, **k133, name="conv0")(x)
            c = _FoldedConvBnReLU3D(2 * b, **k133, stride=(1, 2, 2),
                                    name="conv1")(conv0)
            conv2 = _FoldedConvBnReLU3D(2 * b, depth=d, dtype=dtype,
                                        name="conv2")(c)
            c = _FoldedConvBnReLU3D(4 * b, **k133, stride=(1, 2, 2),
                                    name="conv3")(conv2)
            conv4 = _FoldedConvBnReLU3D(4 * b, depth=d, dtype=dtype,
                                        name="conv4")(c)
            c = _FoldedConvBnReLU3D(8 * b, **k133, stride=(1, 2, 2),
                                    name="conv5")(conv4)
            x = _FoldedConvBnReLU3D(8 * b, depth=d, dtype=dtype,
                                    name="conv6")(c)
            x = conv4 + _FoldedConvTranspose(4 * b, d, dtype, name="conv7")(x)
            x = conv2 + _FoldedConvTranspose(2 * b, d, dtype, name="conv9")(x)
            x = conv0 + _FoldedConvTranspose(b, d, dtype, name="conv11")(x)
            x = _FoldedProb(d, name="prob")(x)  # (B, 1, H, W, D)
            return jnp.transpose(x[:, 0], (0, 3, 1, 2)).astype(jnp.float32)

        k133 = dict(kernel_size=(1, 3, 3), pad=(0, 1, 1))
        dkw = dict(dtype=dtype) if self.agg_type == "ConvBnReLU3D" else {}
        x = x.astype(dtype)

        conv0 = ConvBnReLU3D(b, **k133, dtype=dtype, name="conv0")(x, train)
        c = ConvBnReLU3D(2 * b, **k133, stride=(1, 2, 2), dtype=dtype,
                         name="conv1")(conv0, train)
        conv2 = agg(2 * b, name="conv2", **dkw)(c, train)
        c = ConvBnReLU3D(4 * b, **k133, stride=(1, 2, 2), dtype=dtype,
                         name="conv3")(conv2, train)
        conv4 = agg(4 * b, name="conv4", **dkw)(c, train)
        c = ConvBnReLU3D(8 * b, **k133, stride=(1, 2, 2), dtype=dtype,
                         name="conv5")(conv4, train)
        x = agg(8 * b, name="conv6", **dkw)(c, train)

        x = conv4 + ConvTransposeBnReLU3d(
            4 * b, stride=(1, 2, 2), kernel_size=(1, 3, 3), dtype=dtype,
            name="conv7"
        )(x, train)
        x = conv2 + ConvTransposeBnReLU3d(
            2 * b, stride=(1, 2, 2), kernel_size=(1, 3, 3), dtype=dtype,
            name="conv9"
        )(x, train)
        x = conv0 + ConvTransposeBnReLU3d(
            b, stride=(1, 2, 2), kernel_size=(1, 3, 3), dtype=dtype,
            name="conv11"
        )(x, train)
        x = nn.Conv(1, (1, 1, 1), use_bias=True, name="prob")(x)
        return x[..., 0].astype(jnp.float32)  # (B, D, H, W) logits in f32


class Reg3d(nn.Module):
    """True-3D U-Net regularizer; down_size selects 1..3 downsampling levels."""

    base_channels: int = 8
    down_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        conv0 = ConvBnReLU3D(b, name="conv0")(x, train)
        c = ConvBnReLU3D(2 * b, stride=2, name="conv1")(conv0, train)
        conv2 = ConvBnReLU3D(2 * b, name="conv2")(c, train)

        if self.down_size == 3:
            c = ConvBnReLU3D(4 * b, stride=2, name="conv3")(conv2, train)
            conv4 = ConvBnReLU3D(4 * b, name="conv4")(c, train)
            c = ConvBnReLU3D(8 * b, stride=2, name="conv5")(conv4, train)
            x = ConvBnReLU3D(8 * b, name="conv6")(c, train)
            x = conv4 + ConvTransposeBnReLU3d(4 * b, stride=(2, 2, 2), name="conv7")(x, train)
            x = conv2 + ConvTransposeBnReLU3d(2 * b, stride=(2, 2, 2), name="conv9")(x, train)
            x = conv0 + ConvTransposeBnReLU3d(b, stride=(2, 2, 2), name="conv11")(x, train)
        elif self.down_size == 2:
            c = ConvBnReLU3D(4 * b, stride=2, name="conv3")(conv2, train)
            x = ConvBnReLU3D(4 * b, name="conv4")(c, train)
            x = conv2 + ConvTransposeBnReLU3d(2 * b, stride=(2, 2, 2), name="conv9")(x, train)
            x = conv0 + ConvTransposeBnReLU3d(b, stride=(2, 2, 2), name="conv11")(x, train)
        else:
            x = conv2
            x = conv0 + ConvTransposeBnReLU3d(b, stride=(2, 2, 2), name="conv11")(x, train)

        x = nn.Conv(1, (3, 3, 3), padding=1, use_bias=False, name="prob")(x)
        return x[..., 0]
