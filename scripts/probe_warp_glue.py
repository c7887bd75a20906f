"""Split warp_correlate_pallas cost into kernel vs XLA-side glue at raw.

bench_warp.py's table keeps the plane-sweep coordinates loop-invariant in
the chain, so XLA hoists the window-meta computation, coordinate packing
and ref broadcast out of the measured loop — that is how its raw-stage4
"16.9 ms" coexists with the component map's 246 ms cost volume
(BENCHNOTES.md).  In production the coordinates change every call (they
depend on the previous stage's depth), so the glue is paid per view.

This probe chains through DEPTH (coords recomputed each iteration, like
production) and times nested prefixes, so differences isolate each piece:

  A  plane_sweep_coords only
  B  A + _coord_windows (window meta + lane packing)
  C  A + full warp_correlate_pallas        (production per-view cost)
  D  C with loop-invariant coords          (bench_warp's hoisted number)

Usage: python scripts/probe_warp_glue.py [H W]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np


def main(h=1152, w=1600):
    from helpers import synthetic_sample

    from mvster_tpu.core.geometry import (
        compose_projection,
        plane_sweep_coords,
    )
    from mvster_tpu.core.hypothesis import init_inverse_range
    from mvster_tpu.kernels.pallas_warp import (
        _coord_windows,
        warp_correlate_pallas,
    )
    from mvster_tpu.utils.profiling import chain_latency

    c, d, g = 8, 4, 4
    s = synthetic_sample(0, batch=1, nviews=2, h=h, w=w)
    projs = compose_projection(jnp.asarray(s["proj_matrices"]["stage4"]))
    ref_proj = projs[:, 0]
    src_proj = projs[:, 1]
    dvals = jnp.asarray(s["depth_values"])
    hypo = init_inverse_range(dvals, d, h, w)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.float32)
    ref = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.float32)

    def coords_of(carry):
        hy = hypo * (1.0 + 1e-9 * carry)
        return plane_sweep_coords(src_proj, ref_proj, hy)

    def a_fn(carry, _):
        x, y = coords_of(carry)
        return jnp.mean(x) + jnp.mean(y)

    def b_fn(carry, _):
        x, y = coords_of(carry)
        meta_row, shift, pred, L = _coord_windows(c, x, y)
        return (
            jnp.sum(meta_row).astype(jnp.float32) * 1e-9
            + jnp.sum(shift).astype(jnp.float32)
            + jnp.mean(L["pack_lanes"](L["x"]))
            + jnp.mean(L["pack_lanes"](L["y"]))
            + pred.astype(jnp.float32)
        )

    def c_fn(carry, s_):
        x, y = coords_of(carry)
        cor = warp_correlate_pallas(s_, ref, x, y, g)
        return jnp.mean(cor)

    x0, y0 = jax.jit(coords_of)(jnp.float32(0.0))

    def d_fn(carry, s_):
        cor = warp_correlate_pallas(s_ + 1e-12 * carry, ref, x0, y0, g)
        return jnp.mean(cor)

    t_a = chain_latency(a_fn, src, iters=8)
    t_b = chain_latency(b_fn, src, iters=8)
    t_c = chain_latency(c_fn, src, iters=6)
    t_d = chain_latency(d_fn, src, iters=6)
    print(f"raw stage4 {h}x{w} C{c} D{d}, one source view:")
    print(f"  A coords only                 {t_a * 1e3:7.2f} ms")
    print(f"  B coords + window meta/pack   {t_b * 1e3:7.2f} ms")
    print(f"  C full production view        {t_c * 1e3:7.2f} ms")
    print(f"  D full, coords hoisted        {t_d * 1e3:7.2f} ms")
    print(f"  => meta/pack glue {t_b - t_a:.4f} s, kernel+feat-pack "
          f"{t_d:.4f} s, unexplained C-(B+D-A) "
          f"{(t_c - t_b - t_d + t_a) * 1e3:.1f} ms")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
