"""Decompose the Pallas cost-volume stage latency into kernel vs XLA glue.

Round-4 finding to attribute: at raw stage4 (1152x1600, D=4, C=8, 4 src
views) the FULL build_cost_volume(impl="pallas") measures ~199 ms while
4x the kernel-only bench is ~68 ms (kernels/pallas_warp.py measured
table) — ~130 ms of glue: plane-sweep coords, per-variant window
metadata, lane packing transposes, per-view softmax attention and the
online accumulation.  This probe times each piece with the REAL cascade
geometry (same debug-forward inputs as bench_components) so the round-4
optimization lands where the milliseconds are.

Usage: python scripts/probe_cv_glue.py [H W V] [--stage N]
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
    ap.add_argument("--stage", type=int, default=4, help="1-based stage")
    ns = ap.parse_args()
    h, w = (ns.dims[0], ns.dims[1]) if len(ns.dims) >= 2 else (1152, 1600)
    v = ns.dims[2] if len(ns.dims) >= 3 else 5
    si = ns.stage - 1

    from bench_components import stage_inputs
    from helpers import synthetic_sample

    from mvster_tpu.core.geometry import plane_sweep_coords
    from mvster_tpu.kernels.cost_volume import build_cost_volume, view_weight
    from mvster_tpu.kernels import pallas_warp as pw
    from mvster_tpu.models import MVS4Net, MVS4NetConfig
    from mvster_tpu.utils.profiling import chain_latency

    cfg = MVS4NetConfig.dtu_default(mono=False)
    model = MVS4Net(cfg)
    sample = synthetic_sample(0, nviews=v, h=h, w=w)
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
    feat, proj, hypo = stage_inputs(cfg, out, dvals)[si]
    del out, variables
    g = cfg.group_cor_dim[si]
    hs, ws = feat.shape[2], feat.shape[3]
    d = hypo.shape[1]
    print(f"stage{si + 1} geometry: {hs}x{ws} C{feat.shape[-1]} D{d} "
          f"G{g} {v - 1} src views")

    ref_proj = proj[:, 0]
    src_projs = [proj[:, i] for i in range(1, v)]

    # --- A. full production cost volume (reference number)
    def cv_full(carry, f, hy):
        ref = f[:, 0] + 1e-12 * carry
        srcs = [f[:, i] for i in range(1, f.shape[1])]
        cor = build_cost_volume(
            ref, srcs, ref_proj, src_projs, hy, group_cor=cfg.group_cor,
            group_dim=g, attn_temp=cfg.attn_temp,
            attn_fuse_d=cfg.attn_fuse_d, impl="pallas",
        )
        return jnp.mean(cor)

    t = chain_latency(cv_full, feat, hypo, iters=4)
    print(f"A  full pallas cost volume:        {t * 1e3:8.2f} ms")

    # --- B. plane-sweep coords only, all views
    def coords_only(carry, f, hy):
        acc = 0.0
        for sp in src_projs:
            x, y = plane_sweep_coords(sp, ref_proj, hy + 1e-12 * carry)
            acc = acc + jnp.mean(x) + jnp.mean(y)
        return acc

    t_b = chain_latency(coords_only, feat, hypo, iters=4)
    print(f"B  plane_sweep_coords x{v - 1}:        {t_b * 1e3:8.2f} ms")

    # precompute coords for the downstream pieces
    xys = jax.jit(
        lambda hy: [plane_sweep_coords(sp, ref_proj, hy) for sp in src_projs]
    )(hypo)
    jax.block_until_ready(xys)

    # --- C. window metadata only (production variant chain), all views
    def meta_only(carry, xys_):
        acc = 0.0
        for x, y in xys_:
            x = x + 1e-12 * carry
            for rp in pw._variant_rps(d, hs):
                meta_row, shift, pred, _ = pw._coord_windows(
                    feat.shape[-1], x, y, rp=rp
                )
                acc = (acc + jnp.sum(meta_row.astype(jnp.float32))
                       + jnp.sum(shift.astype(jnp.float32))
                       + pred.astype(jnp.float32))
        return acc

    t_c = chain_latency(meta_only, xys, iters=4)
    nvar = len(pw._variant_rps(d, hs))
    print(f"C  window_meta x{v - 1} x{nvar} variants:   {t_c * 1e3:8.2f} ms")

    # --- D. kernel calls with precomputed coords (meta + pack + kernel)
    def kern_only(carry, f, xys_):
        ref = f[:, 0]
        acc = 0.0
        for i, (x, y) in enumerate(xys_):
            cor = pw.warp_correlate_pallas(
                f[:, i + 1], ref, x + 1e-12 * carry, y, g
            )
            acc = acc + jnp.mean(cor)
        return acc

    t_d = chain_latency(kern_only, feat, xys, iters=4)
    print(f"D  meta+pack+kernel x{v - 1}:          {t_d * 1e3:8.2f} ms")

    # --- E. same but force_rp pinned (single variant, no rp/2 chain)
    rp0 = pw._row_pack(d, hs)

    def kern_pinned(carry, f, xys_):
        ref = f[:, 0]
        acc = 0.0
        for i, (x, y) in enumerate(xys_):
            cor = pw.warp_correlate_pallas(
                f[:, i + 1], ref, x + 1e-12 * carry, y, g, force_rp=rp0
            )
            acc = acc + jnp.mean(cor)
        return acc

    t_e = chain_latency(kern_pinned, feat, xys, iters=4)
    print(f"E  ... pinned rp={rp0} (no chain):    {t_e * 1e3:8.2f} ms")

    # --- F. attention fusion only: view_weight + online accumulation
    cors = jax.jit(
        lambda f, xys_: [
            pw.warp_correlate_pallas(f[:, i + 1], f[:, 0], x, y, g)
            for i, (x, y) in enumerate(xys_)
        ]
    )(feat, xys)
    jax.block_until_ready(cors)

    def fuse_only(carry, cors_):
        wsum = jnp.asarray(1e-8, jnp.float32)
        fsum = jnp.asarray(0.0, jnp.float32)
        for cor in cors_:
            cor = cor + 1e-12 * carry
            wt = view_weight(cor, feat.shape[-1], cfg.attn_temp,
                             cfg.attn_fuse_d)
            wsum = wsum + wt
            fsum = fsum + wt[..., None] * cor
        return jnp.mean(fsum / wsum[..., None])

    t_f = chain_latency(fuse_only, cors, iters=4)
    print(f"F  view_weight + accumulation:     {t_f * 1e3:8.2f} ms")

    # --- G. geometry-direct packed-coords entry (round-4 rewrite)
    def cv_packed(carry, f, hy):
        ref = f[:, 0] + 1e-12 * carry
        srcs = [f[:, i] for i in range(1, f.shape[1])]
        cor = build_cost_volume(
            ref, srcs, ref_proj, src_projs, hy, group_cor=cfg.group_cor,
            group_dim=g, attn_temp=cfg.attn_temp,
            attn_fuse_d=cfg.attn_fuse_d, impl="pallas",
            pallas_coords="packed",
        )
        return jnp.mean(cor)

    t_g = chain_latency(cv_packed, feat, hypo, iters=4)
    print(f"G  full cost volume, packed coords: {t_g * 1e3:7.2f} ms")

    print(f"\nreconcile: B + D + F = {(t_b + t_d + t_f) * 1e3:.2f} ms "
          f"vs A {t * 1e3:.2f} ms")
    print(f"kernel-only estimate: D - C = {(t_d - t_c) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
