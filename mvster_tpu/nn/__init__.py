from mvster_tpu.nn.blocks import (
    ConvBlock2d,
    ConvBnReLU3D,
    ConvBnReLU3D_CAM,
    ConvBnReLU3D_DCAM,
    ConvBnReLU3D_PAM,
    ConvBnReLU3D_PDAM,
)
from mvster_tpu.nn.fpn import FPN4, FPN4ConvNeXt, FPN4ConvNeXt4, ASFF
from mvster_tpu.nn.reg import Reg2d, Reg3d
from mvster_tpu.nn.mono import MonoDepthDecoder
from mvster_tpu.nn.posenc import PosEncSine, PosEncLearned
