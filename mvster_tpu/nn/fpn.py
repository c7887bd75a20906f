"""Feature pyramid networks (4-level) + adaptive spatial feature fusion.

TPU-first notes: all convs are channels-last NHWC; the top-down pathway
upsamples with the align-corners bilinear matmul resize from core.sampling
(exact parity with `F.interpolate(align_corners=True)` in the reference FPN4,
/root/reference/models/mvs4net_utils.py:419-502).  View batching is the
caller's job — the cascade folds the view axis into batch so the MXU sees one
large conv instead of Nv small ones.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvster_tpu.core.sampling import (
    max_pool2d,
    resize_bilinear_align_corners,
    upsample_nearest,
)
from mvster_tpu.nn.blocks import ConvBlock2d
from mvster_tpu.nn.dcn import DeformConvBlock


class _ConvParams(nn.Module):
    """Declare params identical to an nn.Conv's (same names, shapes,
    initializers, RNG fold) WITHOUT applying the convolution — the
    composed-tail eval branch below consumes the raw kernels.  Same
    param-mirror pattern as nn/reg.py's folded branch: route by flag with
    a checkpoint-identical tree (tests/test_fpn_compose.py)."""

    features: int
    kernel_size: tuple
    use_bias: bool = False

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (in_features, self.features),
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _conv_up_hconv(intra, k4, dtype):
    """conv3x3(up2x_align_corners(intra); k4) WITHOUT materializing the
    full-resolution 64-channel upsampled tensor.

    upW commutes with convH (different axes), so with up = upH ∘ upW and
    conv3x3 = sum_kx shiftW_kx ∘ convH(k4[:, kx]):

        conv3x3(up(x)) = sum_kx shiftW_kx( upW( convH_3x1(upH(x); k4[:,kx]) ) )

    which is computed as: (1) H-only einsum upsample (a matmul on the
    MAJOR axis — cheap, unlike the W interleave), (2) ONE 3x1 conv at
    half width with the kx taps stacked into 3*b output channels (3x the
    MXU lane utilization of the b-channel full-res conv), (3) a W-axis
    interp gather + shift + border mask per kx on the b-channel output.
    Exact up to f32 reassociation.
    """
    from mvster_tpu.core.sampling import _interp_matrix

    # the /2 intra is f32 (the bilinear-up + lateral-conv sum promotes);
    # raw lax.conv has no nn.Conv-style auto-cast, so match the kernels'
    # compute dtype here (same cast nn.Conv applies in the standard branch)
    intra = intra.astype(dtype)
    b_, h2, w2, ci = intra.shape
    hh, ww = 2 * h2, 2 * w2
    co = k4.shape[-1]
    # 1. H-only align-corners upsample via the interp matrix (the matmul
    # form — materialized once, never fused into the conv input; the
    # stencil form rematerializes inside consumer convs, BENCHNOTES r4e)
    mat = _interp_matrix(intra.dtype, h2, hh)  # (hh, h2)
    xh = jnp.einsum("yh,bhwc->bywc", mat, intra,
                    precision=jax.lax.Precision.HIGHEST)
    # 2. H-conv 3x1, ci -> 3*co (kx taps stacked along output channels)
    kz = jnp.transpose(k4, (0, 2, 1, 3)).reshape(3, 1, ci, 3 * co)
    z = jax.lax.conv_general_dilated(
        xh, kz, (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, hh, w2, 3*co)
    # 3. W interp + kx shift + zero-pad border mask on the co-channel
    # output.  align-corners: src = i * (w2-1) / (ww-1).
    pos = jnp.arange(ww, dtype=jnp.float32) * ((w2 - 1.0) / (ww - 1.0))
    fi = jnp.floor(pos).astype(jnp.int32)
    alpha = pos - jnp.floor(pos)
    out = None
    for kx in range(3):
        j = jnp.arange(ww) + (kx - 1)          # full-res source column
        valid = ((j >= 0) & (j < ww)).astype(dtype)
        jc = jnp.clip(j, 0, ww - 1)
        f_k = fi[jc]
        a_k = alpha[jc].astype(dtype)
        w1 = a_k * valid
        w0 = (1.0 - a_k) * valid
        zk = jax.lax.dynamic_slice_in_dim(z, kx * co, co, axis=3)
        g0 = jnp.take(zk, f_k, axis=2)
        g1 = jnp.take(zk, jnp.minimum(f_k + 1, w2 - 1), axis=2)
        t = g0 * w0[:, None] + g1 * w1[:, None]
        out = t if out is None else out + t
    return out


def _composed_tail(intra, e, w3, b3, k4, dtype, up, mode="hconv"):
    """out4(up(intra) + inner3(e)) with the full-resolution 64-channel
    intermediate algebraically folded away.

    The reference tail (mvs4net_utils.py:488-489) adds a 1x1-conv lateral
    (inner3) to the upsampled top-down feature and applies a 3x3 no-bias
    conv (out4).  Both are linear and SAME zero padding commutes with +,
    so out4 distributes over the sum:

        out4(up + inner3(e)) = conv3x3(up(x); k4)        (see _conv_up_hconv)
                             + conv3x3(e; w3 @ k4)       (composed weights)
                             + border_bias               (inner3's bias)

    The composed conv is ci->b directly (8->8 at full res) instead of the
    full-res 1x1 ci->64 + 64-channel add + 64->b conv — the 64-channel
    (H, W) intermediate never exists.  inner3's bias passes through out4
    as a constant EXCEPT where out4's zero padding clips it, which is the
    separable border map computed from the two 0/1 tap-validity vectors.
    Exact up to f32 reassociation.

    mode: "hconv" computes the conv-of-upsample term via _conv_up_hconv
    (no full-res 64-channel tensor at all); "up" materializes up(intra)
    and convolves it (the v1 formulation, kept for the measured A/B).
    """
    if mode == "hconv":
        t1 = _conv_up_hconv(intra, k4, dtype)
        hh, ww = 2 * intra.shape[1], 2 * intra.shape[2]
    else:
        intra_up = up(intra).astype(dtype)
        t1 = jax.lax.conv_general_dilated(
            intra_up, k4, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        hh, ww = intra_up.shape[1], intra_up.shape[2]
    k_eff = jnp.einsum("im,yxmo->yxio", w3[0, 0], k4)
    t2 = jax.lax.conv_general_dilated(
        e.astype(dtype), k_eff, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    p = jnp.einsum("m,yxmo->yxo", b3.astype(dtype), k4)  # (3, 3, b)
    ar_y = jnp.arange(hh)
    ar_x = jnp.arange(ww)
    iy = jnp.stack(
        [ar_y >= 1, jnp.full((hh,), True), ar_y <= hh - 2], 1
    ).astype(dtype)
    ix = jnp.stack(
        [ar_x >= 1, jnp.full((ww,), True), ar_x <= ww - 2], 1
    ).astype(dtype)
    bias_map = jnp.einsum("yk,xl,klo->yxo", iy, ix, p)
    return t1 + t2 + bias_map[None]


class FPN4(nn.Module):
    """4-level FPN: strided encoder + lateral 1x1 + align-corners top-down.

    Output channels [8b, 4b, 2b, b] at strides [8, 4, 2, 1] as stage1..4.
    Mirrors FPN4 (mvs4net_utils.py:419-502).
    """

    base_channels: int = 8
    gn: bool = False
    dcn: bool = False
    dtype: Any = None  # compute dtype for convs (None = float32)
    # eval-only routing of the LAST pyramid level through _composed_tail
    # (checkpoint-identical params; training keeps the standard branch)
    compose_tail: bool = False
    compose_mode: str = "hconv"  # "hconv" | "up" — see _composed_tail

    @property
    def out_channels(self):
        b = self.base_channels
        return [8 * b, 4 * b, 2 * b, b]

    @nn.compact
    def __call__(self, x, train: bool = False) -> dict[str, Any]:
        b = self.base_channels
        gn = self.gn
        dtype = self.dtype or jnp.float32
        x = x.astype(dtype)

        def enc_block(channels, specs, name):
            def apply(h):
                for i, (k, s, p) in enumerate(specs):
                    h = ConvBlock2d(
                        channels, k, s, p, gn=gn, dtype=dtype, name=f"{name}_{i}"
                    )(h, train)
                return h
            return apply

        conv0 = enc_block(b, [(3, 1, 1), (3, 1, 1)], "conv0")(x)
        conv1 = enc_block(2 * b, [(5, 2, 2), (3, 1, 1), (3, 1, 1)], "conv1")(conv0)
        conv2 = enc_block(4 * b, [(5, 2, 2), (3, 1, 1), (3, 1, 1)], "conv2")(conv1)
        conv3 = enc_block(8 * b, [(5, 2, 2), (3, 1, 1), (3, 1, 1)], "conv3")(conv2)

        final = 8 * b
        intra = conv3
        out1 = nn.Conv(8 * b, (1, 1), use_bias=False, dtype=dtype, name="out1")(intra)

        def up(feat):
            h, w = feat.shape[-3] * 2, feat.shape[-2] * 2
            return resize_bilinear_align_corners(feat, h, w)

        intra = up(intra) + nn.Conv(final, (1, 1), use_bias=True, dtype=dtype,
                                    name="inner1")(conv2)
        out2 = nn.Conv(4 * b, (3, 3), padding=1, use_bias=False, dtype=dtype,
                       name="out2")(intra)

        intra = up(intra) + nn.Conv(final, (1, 1), use_bias=True, dtype=dtype,
                                    name="inner2")(conv1)
        out3 = nn.Conv(2 * b, (3, 3), padding=1, use_bias=False, dtype=dtype,
                       name="out3")(intra)

        if self.compose_tail and not train:
            # the /1-resolution intra feeds ONLY out4 (unlike the other
            # levels, whose intra is the next level's upsample input), so
            # it can be folded away entirely — see _composed_tail
            w3, b3 = _ConvParams(final, (1, 1), use_bias=True,
                                 name="inner3")(conv0.shape[-1])
            k4, _ = _ConvParams(b, (3, 3), name="out4")(final)
            out4 = _composed_tail(
                intra, conv0, w3.astype(dtype), b3, k4.astype(dtype),
                dtype, up, mode=self.compose_mode,
            )
        else:
            intra = up(intra) + nn.Conv(final, (1, 1), use_bias=True,
                                        dtype=dtype, name="inner3")(conv0)
            out4 = nn.Conv(b, (3, 3), padding=1, use_bias=False, dtype=dtype,
                           name="out4")(intra)

        if self.dcn:
            out1 = DeformConvBlock(8 * b, gn=gn, name="dcn1")(out1, train)
            out2 = DeformConvBlock(4 * b, gn=gn, name="dcn2")(out2, train)
            out3 = DeformConvBlock(2 * b, gn=gn, name="dcn3")(out3, train)
            out4 = DeformConvBlock(b, gn=gn, name="dcn4")(out4, train)

        return {"stage1": out1, "stage2": out2, "stage3": out3, "stage4": out4}


class ConvNeXtBlock(nn.Module):
    """Strided depthwise-7x7 ConvNeXt downsampling block (2x channels).

    Mirrors convnext_block (mvs4net_utils.py:526-551): dw-conv stride 2 with
    feature_group_count=dim, LN, 1x1 MLP (4x expand) with GELU, layer scale.
    No residual (the stride-2 output has no skip).
    """

    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        out_ch = 2 * self.dim
        x = nn.Conv(
            out_ch, (7, 7), strides=(2, 2), padding=3,
            feature_group_count=self.dim, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(out_ch, name="pwconv2")(x)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init), (out_ch,)
            )
            x = gamma * x
        return x


class ConvNeXt4Block(nn.Module):
    """Patchify-style ConvNeXt block: stride-2 2x2 conv + residual dw block.

    Mirrors convnext4_block (mvs4net_utils.py:553-579).
    """

    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        out_ch = 2 * self.dim
        inp = nn.Conv(out_ch, (2, 2), strides=(2, 2), padding=0, name="sconv")(x)
        x = nn.Conv(
            out_ch, (7, 7), padding=3, feature_group_count=self.dim, name="dwconv"
        )(inp)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(out_ch, name="pwconv2")(x)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init), (out_ch,)
            )
            x = gamma * x
        return inp + x


class _FPNConvNeXtBase(nn.Module):
    """Shared FPN assembly for the ConvNeXt encoder variants."""

    base_channels: int = 8
    gn: bool = False
    dcn: bool = False
    block_cls: type = ConvNeXtBlock
    # same eval-only composed last-level tail as FPN4 (measured win there;
    # identical tail structure here)
    compose_tail: bool = False
    compose_mode: str = "hconv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        conv0 = ConvBlock2d(b, 3, 1, 1, gn=self.gn, name="conv0_0")(x, train)
        conv0 = ConvBlock2d(b, 3, 1, 1, gn=self.gn, name="conv0_1")(conv0, train)
        conv1 = self.block_cls(b, name="conv1")(conv0)
        conv2 = self.block_cls(2 * b, name="conv2")(conv1)
        conv3 = self.block_cls(4 * b, name="conv3")(conv2)

        final = 8 * b
        intra = conv3
        out1 = nn.Conv(8 * b, (1, 1), use_bias=False, name="out1")(intra)

        def up(feat):
            h, w = feat.shape[-3] * 2, feat.shape[-2] * 2
            return resize_bilinear_align_corners(feat, h, w)

        intra = up(intra) + nn.Conv(final, (1, 1), use_bias=True, name="inner1")(conv2)
        out2 = nn.Conv(4 * b, (3, 3), padding=1, use_bias=False, name="out2")(intra)
        intra = up(intra) + nn.Conv(final, (1, 1), use_bias=True, name="inner2")(conv1)
        out3 = nn.Conv(2 * b, (3, 3), padding=1, use_bias=False, name="out3")(intra)
        if self.compose_tail and not train:
            w3, b3 = _ConvParams(final, (1, 1), use_bias=True,
                                 name="inner3")(conv0.shape[-1])
            k4, _ = _ConvParams(b, (3, 3), name="out4")(final)
            out4 = _composed_tail(
                intra, conv0, w3, b3, k4, jnp.float32, up,
                mode=self.compose_mode,
            )
        else:
            intra = up(intra) + nn.Conv(final, (1, 1), use_bias=True,
                                        name="inner3")(conv0)
            out4 = nn.Conv(b, (3, 3), padding=1, use_bias=False,
                           name="out4")(intra)

        if self.dcn:
            out1 = DeformConvBlock(8 * b, gn=self.gn, name="dcn1")(out1, train)
            out2 = DeformConvBlock(4 * b, gn=self.gn, name="dcn2")(out2, train)
            out3 = DeformConvBlock(2 * b, gn=self.gn, name="dcn3")(out3, train)
            out4 = DeformConvBlock(b, gn=self.gn, name="dcn4")(out4, train)

        return {"stage1": out1, "stage2": out2, "stage3": out3, "stage4": out4}


class FPN4ConvNeXt(_FPNConvNeXtBase):
    block_cls: type = ConvNeXtBlock


class FPN4ConvNeXt4(_FPNConvNeXtBase):
    block_cls: type = ConvNeXt4Block


class ASFF(nn.Module):
    """Adaptive spatial feature fusion across the 4 FPN levels.

    `level` selects the output resolution (0 = coarsest / stage1).  All other
    levels are resampled to it (strided convs or maxpool down; nearest up +
    1x1 compress), then blended with softmax pixel weights.  Mirrors ASFF
    (mvs4net_utils.py:723-805) with dims [64, 32, 16, 8].
    """

    level: int
    dims: tuple = (64, 32, 16, 8)

    @nn.compact
    def __call__(self, x0, x1, x2, x3, train: bool = False):
        lvl = self.level
        inter = self.dims[lvl]
        feats = [x0, x1, x2, x3]

        def compress(x, name):
            return ConvBlock2d(inter, 1, 1, 0, name=name)(x, train)

        def stride_down(x, name):
            return ConvBlock2d(inter, 3, 2, 1, name=name)(x, train)

        if lvl == 0:
            r0 = x0
            r1 = stride_down(x1, "stride_level_1")
            r2 = stride_down(max_pool2d(x2, 2, 2), "stride_level_2")
            r3 = stride_down(max_pool2d(x3, 4, 4), "stride_level_3")
        elif lvl == 1:
            r0 = upsample_nearest(compress(x0, "compress_level_0"), 2)
            r1 = x1
            r2 = stride_down(x2, "stride_level_2")
            r3 = stride_down(max_pool2d(x3, 2, 2), "stride_level_3")
        elif lvl == 2:
            r0 = upsample_nearest(compress(x0, "compress_level_0"), 4)
            r1 = upsample_nearest(compress(x1, "compress_level_1"), 2)
            r2 = x2
            r3 = stride_down(x3, "stride_level_3")
        else:
            r0 = upsample_nearest(compress(x0, "compress_level_0"), 8)
            r1 = upsample_nearest(compress(x1, "compress_level_1"), 4)
            r2 = upsample_nearest(compress(x2, "compress_level_2"), 2)
            r3 = x3

        weights = [
            ConvBlock2d(8, 1, 1, 0, name=f"weight_level_{i}")(r, train)
            for i, r in enumerate([r0, r1, r2, r3])
        ]
        w = nn.Conv(4, (1, 1), name="weight_levels")(
            jnp.concatenate(weights, axis=-1)
        )
        w = jax.nn.softmax(w, axis=-1)
        fused = (
            r0 * w[..., 0:1] + r1 * w[..., 1:2] + r2 * w[..., 2:3] + r3 * w[..., 3:4]
        )
        return ConvBlock2d(inter, 3, 1, 1, name="expand")(fused, train)
