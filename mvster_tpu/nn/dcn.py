"""Pure-JAX modulated deformable convolution (DCNv2-style).

The reference ships two deformable paths: an external CUDA `DeformConvPack`
(mvs4net_utils.py:403-417, used by `--dcn`) and a pure-PyTorch gather-based
`DeformConv2d` (mvs4net_utils.py:267-401) proving the op is expressible with
gathers.  On TPU there is no custom-CUDA escape hatch, and none is needed: the
op is offsets (a small conv) + bilinear gathers (vectorized, same machinery as
the plane-sweep warp) + one dense conv over the gathered taps (MXU).

Semantics: offsets and modulation masks are predicted by zero-initialized 3x3
convs (so the op starts as a plain conv); sampling uses border-clamped bilinear
interpolation on a zero-padded input, mirroring the reference's clamped
sampling of its padded input.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _clamped_bilinear(img, x, y):
    """img (H, W, C); x, y (...,) pixel coords, border-clamped bilinear."""
    h, w, c = img.shape
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = img.reshape(h * w, c)

    def tap(yi, xi, weight):
        return flat[(yi * w + xi).reshape(-1)].reshape(*x.shape, c) * weight[..., None]

    return (
        tap(y0i, x0i, (1 - wy) * (1 - wx))
        + tap(y0i, x1i, (1 - wy) * wx)
        + tap(y1i, x0i, wy * (1 - wx))
        + tap(y1i, x1i, wy * wx)
    )


class DeformConv2d(nn.Module):
    """Modulated deformable 3x3 conv, channels-last (B, H, W, C)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    modulation: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        n = k * k
        b, h, w, c = x.shape
        oh = (h + 2 * self.padding - k) // self.stride + 1
        ow = (w + 2 * self.padding - k) // self.stride + 1

        # Offset / modulation branches start at zero => identity-deformation.
        offsets = nn.Conv(
            2 * n, (3, 3), strides=(self.stride, self.stride), padding=1,
            kernel_init=nn.initializers.zeros, name="p_conv",
        )(x)  # (B, oh, ow, 2n): [dy x n, dx x n]
        if self.modulation:
            mod = jax.nn.sigmoid(
                nn.Conv(
                    n, (3, 3), strides=(self.stride, self.stride), padding=1,
                    kernel_init=nn.initializers.zeros, name="m_conv",
                )(x)
            )  # (B, oh, ow, n)

        pad = self.padding
        x_pad = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

        # Base sampling locations in the padded image: output pixel centers
        # plus the kernel-tap offsets.
        ys = jnp.arange(oh, dtype=x.dtype) * self.stride + pad
        xs = jnp.arange(ow, dtype=x.dtype) * self.stride + pad
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (oh, ow)
        half = (k - 1) // 2
        tap_off = jnp.arange(-half, half + 1, dtype=x.dtype)
        ty, tx = jnp.meshgrid(tap_off, tap_off, indexing="ij")  # (k, k)
        ty = ty.reshape(n)
        tx = tx.reshape(n)

        py = gy[None, :, :, None] + ty + offsets[..., :n]  # (B, oh, ow, n)
        px = gx[None, :, :, None] + tx + offsets[..., n:]

        samples = jax.vmap(_clamped_bilinear)(x_pad, px, py)  # (B, oh, ow, n, C)
        if self.modulation:
            samples = samples * mod[..., None]

        # Dense conv over the gathered taps == einsum with a (n, C, out) kernel.
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (n, c, self.out_channels),
        )
        out = jnp.einsum(
            "bhwnc,nco->bhwo", samples, kernel.astype(x.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + bias
        return out


class DeformConvBlock(nn.Module):
    """Norm -> ReLU -> modulated deformable conv (the reference's NA_DCN)."""

    channels: int
    gn: bool = False
    group_channel: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.gn:
            groups = int(max(1, self.channels / self.group_channel))
            x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="norm")(x)
        else:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="norm",
            )(x)
        x = nn.relu(x)
        return DeformConv2d(self.channels, name="dcn")(x)
