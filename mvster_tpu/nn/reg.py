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

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mvster_tpu.nn.blocks import AGG_BLOCKS, ConvBnReLU3D, ConvTransposeBnReLU3d


class Reg2d(nn.Module):
    """(B, D, H, W, Cin) -> (B, D, H, W) regularized logits."""

    base_channels: int = 8
    agg_type: str = "ConvBnReLU3D"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        agg = AGG_BLOCKS[self.agg_type]
        dtype = self.dtype or jnp.float32
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
