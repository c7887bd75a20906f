"""On-chip A/B of the 2x align-corners upsample formulations.

Rows: the three FPN top-down upsamples at DTU mid and raw sizes (input
shapes, 5 views folded into batch, 64 channels).  Columns:

  einsum   - dense interpolation-matrix einsum (round-3 default)
  st_hw    - 3-tap stencil, H pass then W pass (round-4 v2 default)
  st_wh    - stencil, W pass first (the W interleave runs at h, not 2h)

A fourth column (Pallas lane kernel for the W interleave) measured SLOWER
than every alternative at every shape (raw /2->/1: 76.66 ms vs st_wh
30.26) and was deleted with that verdict; the 2026-08-19 run of this
probe in BENCHNOTES.md records its numbers.

The winner (per size class) becomes resize_bilinear_align_corners' routed
path; this table is the measured justification.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mvster_tpu.core.sampling import (
    _interp_matrix,
    _upsample2x_align_corners_axis,
)
from mvster_tpu.utils.profiling import chain_latency


def main():
    shapes = [
        ("mid /8->/4", (5, 64, 80, 64)),
        ("mid /4->/2", (5, 128, 160, 64)),
        ("mid /2->/1", (5, 256, 320, 64)),
        ("raw /8->/4", (5, 144, 200, 64)),
        ("raw /4->/2", (5, 288, 400, 64)),
        ("raw /2->/1", (5, 576, 800, 64)),
    ]
    print("2x upsample A/B (ms, chained, f32)")
    print(f"{'shape':<12} {'einsum':>8} {'st_hw':>8} {'st_wh':>8}")
    for name, shp in shapes:
        b, h, w, c = shp
        x = jax.random.normal(jax.random.PRNGKey(0), shp, jnp.float32)
        mh = _interp_matrix(jnp.float32, h, 2 * h)
        mw = _interp_matrix(jnp.float32, w, 2 * w)

        def f_einsum(carry, x_):
            out = jnp.einsum("bhwc,Hh,Ww->bHWc", x_ + 1e-12 * carry, mh, mw,
                             precision=jax.lax.Precision.HIGHEST)
            return jnp.mean(out)

        def f_st_hw(carry, x_):
            out = _upsample2x_align_corners_axis(x_ + 1e-12 * carry, -3)
            out = _upsample2x_align_corners_axis(out, -2)
            return jnp.mean(out)

        def f_st_wh(carry, x_):
            out = _upsample2x_align_corners_axis(x_ + 1e-12 * carry, -2)
            out = _upsample2x_align_corners_axis(out, -3)
            return jnp.mean(out)

        cols = [chain_latency(f, x, iters=8) * 1e3
                for f in (f_einsum, f_st_hw, f_st_wh)]
        print(f"{name:<12} {cols[0]:>8.2f} {cols[1]:>8.2f} {cols[2]:>8.2f}")


if __name__ == "__main__":
    main()
