from mvster_tpu.core.geometry import (
    inverse_3x3,
    inverse_affine_4x4,
    compose_projection,
    plane_sweep_coords,
)
from mvster_tpu.core.sampling import (
    bilinear_sample,
    grid_sample_zeros,
    resize_linear_1d,
    resize_bilinear_align_corners,
    resize_trilinear_align_corners,
    upsample_nearest_2x,
    max_pool2d,
)
from mvster_tpu.core.hypothesis import (
    init_range,
    init_inverse_range,
    schedule_range,
    schedule_inverse_range,
)
from mvster_tpu.core.sinkhorn import sinkhorn
