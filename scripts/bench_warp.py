"""Benchmark: Pallas fused warp+group-correlation vs the XLA path on TPU.

Per-stage shapes of DTU-mid inference (batch 1), one source view.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mvster_tpu.core.geometry import plane_sweep_coords
from mvster_tpu.kernels.cost_volume import correlate, warp_src_feature
from mvster_tpu.kernels.pallas_warp import warp_correlate_pallas

STAGES = {
    "stage1": (64, 80, 64, 8, 8),    # H, W, C, D, G
    "stage2": (128, 160, 32, 8, 8),
    "stage3": (256, 320, 16, 4, 4),
    "stage4": (512, 640, 8, 4, 4),
}


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    for name, (h, w, c, d, g) in STAGES.items():
        src = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
        ref = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
        # plausible coords: identity plus small per-depth shift
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        x = np.stack([gx + 3.0 * k for k in range(d)])[None].astype(np.float32)
        y = np.stack([gy + 0.5 * k for k in range(d)])[None].astype(np.float32)
        x, y = jnp.asarray(x), jnp.asarray(y)

        xla_fn = jax.jit(
            lambda s, r, xx, yy: correlate(
                _warp(s, xx, yy), r, True, g
            )
        )

        def _warp(s, xx, yy):
            from mvster_tpu.core.sampling import grid_sample_zeros

            return grid_sample_zeros(s, xx, yy)

        pls_fn = jax.jit(
            lambda s, r, xx, yy: warp_correlate_pallas(s, r, xx, yy, g)
        )
        a = xla_fn(src, ref, x, y)
        t_x = timeit(xla_fn, src, ref, x, y)
        try:
            b = np.asarray(pls_fn(src, ref, x, y))
            err = np.abs(np.asarray(a) - b).max()
            t_p = timeit(pls_fn, src, ref, x, y)
            print(
                f"{name} ({h}x{w} C{c} D{d}): xla {t_x * 1e3:7.3f} ms | "
                f"pallas {t_p * 1e3:7.3f} ms ({t_x / t_p:4.2f}x) | max-err {err:.2e}"
            )
        except Exception as e:
            print(
                f"{name} ({h}x{w} C{c} D{d}): xla {t_x * 1e3:7.3f} ms | "
                f"pallas unavailable ({type(e).__name__}: {str(e)[:90]})"
            )


if __name__ == "__main__":
    main()
