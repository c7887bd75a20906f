"""Isolate the Pallas scatter backward (kernels/pallas_scatter.py) at the
real train geometry — the per-stage cost the sg-cut rows of
probe_train_bwd can only bound (R0-R7 conflates scatter bwd with the
FPN-via-cv conv dgrads underneath it).

Per cascade stage (DTU-mid, batch 2 by default — the published train
shape), all chained protocol:

  S  scatter_grad_pallas summed over the V-1 source views  (the train
     step's actual backward work for this stage)
  M  scatter_meta alone x (V-1)                            (XLA-side
     metadata share of S)
  [--xla]  the XLA scatter vjp x (V-1)                     (what S
     replaced; slow — off by default)

Coordinates come from the SAME debug-forward harness as bench_components
(real plane-sweep geometry incl. epipolar tilt and the scheduled
hypothesis windows), so scnt/ocnt distributions match production.

Usage: python scripts/probe_scatter.py [H W V] [--batch N] [--xla]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dims", nargs="*", type=int, metavar="H W [V]")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--xla", action="store_true",
                    help="also time the XLA scatter vjp (slow)")
    ap.add_argument("--band-rows", type=int, default=None,
                    help="override pallas_scatter._BAND_MM_ROWS (0 "
                    "disables the band-matmul branch everywhere — the "
                    "A/B knob for its routing threshold)")
    ns = ap.parse_args()
    h, w = (ns.dims[0], ns.dims[1]) if len(ns.dims) >= 2 else (512, 640)
    v = ns.dims[2] if len(ns.dims) >= 3 else 5

    from bench_components import stage_inputs
    from helpers import synthetic_sample

    from mvster_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # the debug forward alone is ~20 min cold

    from mvster_tpu.core.geometry import plane_sweep_coords
    from mvster_tpu.kernels import pallas_scatter as ps
    from mvster_tpu.kernels.pallas_scatter import (
        scatter_grad_pallas,
        scatter_meta,
    )

    if ns.band_rows is not None:
        ps._BAND_MM_ROWS = ns.band_rows
    from mvster_tpu.kernels.pallas_warp import LANE, PADX, _band_rows, _nk
    from mvster_tpu.models import MVS4Net, MVS4NetConfig
    from mvster_tpu.utils.profiling import chain_latency

    cfg = MVS4NetConfig.dtu_default(mono=False)
    model = MVS4Net(cfg)
    sample = synthetic_sample(0, batch=ns.batch, nviews=v, h=h, w=w)
    imgs = jnp.asarray(sample["imgs"])
    projs = {k: jnp.asarray(p) for k, p in sample["proj_matrices"].items()}
    dvals = jnp.asarray(sample["depth_values"])
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), imgs, projs, dvals,
                           train=False)
    )()
    out = jax.jit(
        lambda vs, im: model.apply(vs, im, projs, dvals, train=False,
                                   return_debug=True)
    )(variables, imgs)
    jax.block_until_ready(out["depth"])
    stages = stage_inputs(cfg, out, dvals)
    del out, variables

    total_s = 0.0
    for si, (feat, proj, hypo, _) in enumerate(stages):
        b, nv, hs, ws, c = feat.shape
        d = hypo.shape[1]
        composed = proj  # debug_proj is ALREADY composed (mvs4net.py:232)
        ref_proj = composed[:, 0]
        coords = [
            plane_sweep_coords(composed[:, i], ref_proj, hypo)
            for i in range(1, nv)
        ]
        key = jax.random.PRNGKey(si)
        cot = jax.random.normal(key, (b, d, hs, ws, c), jnp.float32)
        src = [feat[:, i] for i in range(1, nv)]
        src_shape = src[0].shape

        def scatter_all(carry, cot, coords):
            acc = jnp.float32(0.0)
            c2 = cot + 1e-12 * carry
            for (x, y) in coords:
                g = scatter_grad_pallas(c2, x, y, src_shape)
                acc = acc + jnp.sum(g)
            return acc

        t_s = chain_latency(scatter_all, cot, coords, iters=ns.iters)
        total_s += t_s

        b2 = _band_rows(hs)
        nxb = -(-ws // LANE)
        wc = nxb * LANE
        wp = wc + 2 * PADX
        cp = -(-c // 8) * 8
        nk = min(_nk(cp), wp // LANE)
        ocnt_max = min(hs, 128)

        def meta_all(carry, coords):
            acc = jnp.float32(0.0)
            for (x, y) in coords:
                xc = jnp.pad(x + 1e-12 * carry,
                             ((0, 0),) * 3 + ((0, wc - ws),), mode="edge")
                yc = jnp.pad(y, ((0, 0),) * 3 + ((0, wc - ws),), mode="edge")
                rowm, blkm, pred = scatter_meta(
                    xc, yc, hs, ws, b2, nk, wp, ocnt_max)
                acc = acc + jnp.sum(rowm) + jnp.sum(blkm) \
                    + pred.astype(jnp.float32)
            return acc

        t_m = chain_latency(meta_all, coords, iters=ns.iters)

        line = (f"stage{si + 1} ({hs:4d}x{ws:4d} C{c:<2d} D{d}) "
                f"S scatter x{nv - 1}: {t_s * 1e3:7.2f} ms | "
                f"M meta x{nv - 1}: {t_m * 1e3:6.2f} ms")

        if ns.xla:
            from mvster_tpu.core.sampling import grid_sample_zeros

            def xla_all(carry, cot, coords, s0):
                acc = jnp.float32(0.0)
                c2 = cot + 1e-12 * carry
                for (x, y) in coords:
                    _, vjp = jax.vjp(
                        lambda s: grid_sample_zeros(s, x, y), s0)
                    acc = acc + jnp.sum(vjp(c2)[0])
                return acc

            t_x = chain_latency(
                xla_all, cot, coords, jnp.zeros(src_shape, jnp.float32),
                iters=max(2, ns.iters // 2))
            line += f" | X xla x{nv - 1}: {t_x * 1e3:8.2f} ms"
        print(line, flush=True)

    print(f"\ntotal S (all stages, {v - 1} views): {total_s * 1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
