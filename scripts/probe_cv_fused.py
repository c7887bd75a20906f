"""Decompose the PACKED fused cost-volume path (the round-4 default) at
real cascade geometry — the round-5 follow-up to probe_cv_glue, which
decomposed the legacy unpacked entry.

The open question (VERDICT r4, weak #5): raw stage4 production measures
~163 ms for 4 source views while the single-view kernel bench table
(kernels/pallas_warp.py docstring) says 16.9 ms — a ~2.4x per-view gap.
Two known differences between that bench and production:

  * the bench used SYNTHETIC near-translational coords (x = gx + 3 + 0.1k)
    with tiny row spans / single lane windows, AND kept them loop-invariant
    in the chain so coordinate packing + window metadata were hoisted out
    of the measured loop;
  * production coords come from real plane-sweep geometry (epipolar tilt,
    depth spread) and depend on the previous stage's depth, so nothing
    hoists.

This probe times each piece of fused_cost_volume_geom with the REAL
cascade inputs (same debug-forward harness as bench_components), all
carry-chained so nothing is hoisted:

  A  full fused_cost_volume_geom          (the production number)
  B  _pack_depth + _pack_ref              (once per stage)
  C  plane_sweep_rt + _packed_plane_sweep (per view)
  D  window_meta_packed                   (per view)
  E  _pad_feature(src)                    (per view)
  F  _run_kernel_raw incl. pad            (per view; F - E = kernel proper)
  G  packed attention fusion              (softmax + online accumulation)
  H  _unpack_cor                          (once)

Usage: python scripts/probe_cv_fused.py [H W V] [--stage N] [--iters K]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dims", nargs="*", type=int, metavar="H W [V]")
    ap.add_argument("--stage", type=int, default=4, help="1-based stage")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--stats", action="store_true",
                    help="print per-vreg rcnt (scan-row count) and nkr "
                    "(lane-window count) histograms from the real window "
                    "metadata instead of timing — sizes the in-kernel "
                    "scan work the timing rows attribute")
    ap.add_argument("--layouts", action="store_true",
                    help="predict the in-kernel scan work (sum of rcnt "
                    "over vregs) for CANDIDATE lane layouts on the same "
                    "real geometry: the shipped d-in-lanes packing vs "
                    "per-depth vregs (d out of lanes) at rp=1/2/4/8 — "
                    "the --stats histograms showed wide-baseline views' "
                    "rcnt is dominated by the depth spread across the 4 "
                    "packed depth lanes, which per-depth vregs avoid")
    ap.add_argument("--scan-r", type=int, default=None,
                    help="pin the kernel scan width (pallas_warp."
                    "FORCE_SCAN_R) — the A/B knob behind _scan_r's "
                    "shape gate")
    ns = ap.parse_args()
    h, w = (ns.dims[0], ns.dims[1]) if len(ns.dims) >= 2 else (1152, 1600)
    v = ns.dims[2] if len(ns.dims) >= 3 else 5
    si = ns.stage - 1
    it = ns.iters

    from bench_components import stage_inputs
    from helpers import synthetic_sample

    from mvster_tpu.core.geometry import plane_sweep_rt
    from mvster_tpu.kernels import pallas_warp as pw
    from mvster_tpu.kernels.pallas_warp import fused_cost_volume_geom
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
    feat, proj, hypo, _ = stage_inputs(cfg, out, dvals)[si]
    del out, variables
    if ns.scan_r is not None:
        # pinned AFTER the setup forward: a global pin would force the
        # width onto every stage of the cascade above, and 16 is
        # VMEM-infeasible at C=64 (raw stage1) — only the probed stage's
        # isolated timing below should see the override
        pw.FORCE_SCAN_R = ns.scan_r
    g = cfg.group_cor_dim[si]
    hs, ws = feat.shape[2], feat.shape[3]
    d = hypo.shape[1]
    c = feat.shape[-1]
    sub = c // g
    nv = v - 1

    ref_proj = proj[:, 0]
    src_projs = [proj[:, i] for i in range(1, v)]
    L = pw._layout(c, d, hs, ws)
    print(f"stage{si + 1} geometry: {hs}x{ws} C{c} D{d} G{g} {nv} src views"
          f" | layout rp={L['rp']} pc={L['pc']} b2={L['b2']} nb={L['nb']}"
          f" knxb={L['knxb']} winb={L['winb']} nvr={L['nvr']}")
    if not L["pack"]:
        print("layout is UNPACKED at this stage; this probe targets the "
              "packed fused path — nothing to measure")
        return

    if ns.layouts:
        from mvster_tpu.core.geometry import plane_sweep_coords

        cands = [
            ("d-in-lanes (shipped)", L["rp"], L["pc"], True),
            ("d-out rp1 pc128", 1, 128, False),
            ("d-out rp2 pc64", 2, 64, False),
            ("d-out rp4 pc32", 4, 32, False),
            ("d-out rp8 pc16", 8, 16, False),
        ]
        cp, wp = L["cp"], L["wp"]
        tot = {name: 0.0 for name, *_ in cands}
        for vi, sp in enumerate(src_projs):
            x, y = jax.jit(plane_sweep_coords)(sp, ref_proj, hypo)
            print(f"view {vi}:")
            for name, rp, pc, share in cands:
                b2 = (8 * rp if rp > 1 else pw._band_rows(hs)) if not share \
                    else L["b2"]
                if b2 == 0 or hs % b2 or (share and pc * rp * d != 128) or \
                        (not share and pc * rp != 128):
                    print(f"  {name:24s} layout infeasible (b2={b2})")
                    continue
                winb = pw._window_bands(cp, wp, b2, hs // b2, ws)
                nk = min(pw._nk(cp), wp // 128)
                wo = -(-ws // pc) * pc
                xq, yq = x, y
                if wo != ws:
                    padw = ((0, 0),) * 3 + ((0, wo - ws),)
                    xq = jnp.pad(x, padw, mode="edge")
                    yq = jnp.pad(y, padw, mode="edge")
                meta, _, pred = pw.window_meta(
                    xq, yq, hs, ws, b2, winb, nk, wp, rp=rp, pc=pc,
                    share_d=share,
                )
                m = np.asarray(meta).reshape(-1)
                rcnt = (m & 0xFF).astype(np.int64)
                nkr = ((m >> 27) & 0x7).astype(np.int64)
                tot[name] += rcnt.sum()
                print(f"  {name:24s} pred={str(bool(pred)):5s} "
                      f"vregs={m.size} winb={winb:2d} "
                      f"sum(rcnt)={rcnt.sum():8d} mean {rcnt.mean():6.2f} "
                      f"p95 {int(np.percentile(rcnt, 95)):3d} "
                      f"max {rcnt.max():3d} | sum(trips)="
                      f"{((rcnt + 1) // 2).sum():8d} "
                      f"sum(rcnt*nkr)={(rcnt * nkr).sum():8d}")
        print("total scan rows across views:")
        for name, t in tot.items():
            print(f"  {name:24s} {int(t):9d}")
        return

    if ns.stats:
        dpk_s = jax.jit(lambda hy: pw._pack_depth(hy, L))(hypo)
        from mvster_tpu.core.geometry import plane_sweep_rt as _psrt

        for vi, sp in enumerate(src_projs):
            rot, trans = _psrt(sp, ref_proj)
            xk, yk = jax.jit(
                lambda d_: pw._packed_plane_sweep(rot, trans, d_, L, ws)
            )(dpk_s)
            meta_row, shift, pred = jax.jit(
                lambda a, b_: pw.window_meta_packed(a, b_, L, hs, ws)
            )(xk, yk)
            m = np.asarray(meta_row).reshape(-1)
            rcnt = m & 0xFF
            nkr = (m >> 27) & 0x7
            print(f"view {vi}: pred={bool(pred)} vregs={m.size}  "
                  f"rcnt mean {rcnt.mean():.2f} p50 "
                  f"{int(np.percentile(rcnt, 50))} p95 "
                  f"{int(np.percentile(rcnt, 95))} max {rcnt.max()}  |  "
                  f"nkr mean {nkr.mean():.2f} "
                  f"frac>1 {(nkr > 1).mean():.2%} max {nkr.max()}")
            hist = np.bincount(rcnt, minlength=1)
            top = ", ".join(f"{i}:{c}" for i, c in enumerate(hist) if c)
            print(f"        rcnt histogram {{{top}}}")
        return

    # --- A. full production fused path
    def cv_full(carry, f, hy):
        ref = f[:, 0] + 1e-12 * carry
        srcs = [f[:, i] for i in range(1, f.shape[1])]
        outv, _ = fused_cost_volume_geom(
            ref, srcs, ref_proj, src_projs, hy, g, cfg.attn_temp,
            cfg.attn_fuse_d,
        )
        return jnp.mean(outv)

    t_a = chain_latency(cv_full, feat, hypo, iters=it)
    print(f"A  full fused_cost_volume_geom:      {t_a * 1e3:8.2f} ms")

    # --- B. stage-invariant setup: pack hypotheses + reference
    def setup_only(carry, f, hy):
        dpk = pw._pack_depth(hy + 1e-12 * carry, L)
        ref_p = pw._pack_ref(f[:, 0] + 1e-12 * carry, L, ws)
        return jnp.mean(dpk) + jnp.mean(ref_p)

    t_b = chain_latency(setup_only, feat, hypo, iters=it)
    print(f"B  _pack_depth + _pack_ref (once):   {t_b * 1e3:8.2f} ms")

    # precompute the packed pieces for the downstream rows
    dpk = jax.jit(lambda hy: pw._pack_depth(hy, L))(hypo)
    ref_p = jax.jit(lambda f: pw._pack_ref(f[:, 0], L, ws))(feat)
    rts = [plane_sweep_rt(sp, ref_proj) for sp in src_projs]

    # --- C. packed plane-sweep coord emission, all views
    def coords_only(carry, dpk_):
        acc = 0.0
        for rot, trans in rts:
            xk, yk = pw._packed_plane_sweep(
                rot, trans, dpk_ + 1e-12 * carry, L, ws
            )
            acc = acc + jnp.mean(xk) + jnp.mean(yk)
        return acc

    t_c = chain_latency(coords_only, dpk, iters=it)
    print(f"C  _packed_plane_sweep x{nv}:          {t_c * 1e3:8.2f} ms")

    xys = jax.jit(
        lambda dpk_: [
            pw._packed_plane_sweep(rot, trans, dpk_, L, ws)
            for rot, trans in rts
        ]
    )(dpk)
    jax.block_until_ready(xys)

    # --- D. window metadata, all views
    def meta_only(carry, xys_):
        acc = 0.0
        for xk, yk in xys_:
            meta_row, shift, pred = pw.window_meta_packed(
                xk + 1e-12 * carry, yk, L, hs, ws
            )
            acc = (acc + jnp.sum(meta_row.astype(jnp.float32))
                   + jnp.sum(shift.astype(jnp.float32))
                   + pred.astype(jnp.float32))
        return acc

    t_d = chain_latency(meta_only, xys, iters=it)
    print(f"D  window_meta_packed x{nv}:           {t_d * 1e3:8.2f} ms")

    metas = jax.jit(
        lambda xys_: [
            pw.window_meta_packed(xk, yk, L, hs, ws)[:2] for xk, yk in xys_
        ]
    )(xys)
    jax.block_until_ready(metas)

    # --- E. source feature pad/transpose, all views
    def pad_only(carry, f):
        acc = 0.0
        for i in range(nv):
            sp = pw._pad_feature(f[:, i + 1] + 1e-12 * carry, L["b2"],
                                 L["wp"])
            acc = acc + jnp.mean(sp)
        return acc

    t_e = chain_latency(pad_only, feat, iters=it)
    print(f"E  _pad_feature(src) x{nv}:            {t_e * 1e3:8.2f} ms")

    # --- F. raw kernel call (incl. pad), all views, precomputed meta/coords
    def kern_only(carry, f, xys_, metas_):
        acc = 0.0
        for i in range(nv):
            xk, yk = xys_[i]
            meta_row, shift = metas_[i]
            outv = pw._run_kernel_raw(
                f[:, i + 1] + 1e-12 * carry, ref_p, xk, yk, meta_row,
                shift, L, g, sub, True, False, hs, ws,
            )
            acc = acc + jnp.mean(outv)
        return acc

    t_f = chain_latency(kern_only, feat, xys, metas, iters=it)
    print(f"F  pad + kernel x{nv}:                 {t_f * 1e3:8.2f} ms"
          f"   (kernel proper = F - E = {(t_f - t_e) * 1e3:.2f} ms,"
          f" {(t_f - t_e) / nv * 1e3:.2f} ms/view)")

    # --- G. packed attention fusion over precomputed cors
    cors = jax.jit(
        lambda f, xys_, metas_: [
            pw._run_kernel_raw(
                f[:, i + 1], ref_p, xys_[i][0], xys_[i][1], metas_[i][0],
                metas_[i][1], L, g, sub, True, False, hs, ws,
            )
            for i in range(nv)
        ]
    )(feat, xys, metas)
    jax.block_until_ready(cors)

    b = feat.shape[0]
    rp, pc, hp, nwj = L["rp"], L["pc"], L["hp"], L["knxb"]
    import math

    inv_sqrt_c = jnp.float32(1.0 / math.sqrt(c))

    def fuse_only(carry, cors_):
        wsum = jnp.asarray(1e-8, jnp.float32)
        fsum = jnp.asarray(0.0, jnp.float32)
        for cor in cors_:
            cor = cor + 1e-12 * carry
            score = jnp.sum(cor, axis=2)
            s = score.reshape(b, 1, hp, nwj, rp, d, pc)
            s = jax.nn.softmax(s / cfg.attn_temp, axis=-2)
            wt = s.reshape(b, 1, hp, nwj * 128) * inv_sqrt_c
            wsum = wsum + wt
            fsum = fsum + wt[:, :, None] * cor
        return jnp.mean(fsum / wsum[:, :, None])

    t_g = chain_latency(fuse_only, cors, iters=it)
    print(f"G  packed fusion x{nv}:                {t_g * 1e3:8.2f} ms")

    # --- H. final unpack
    def unpack_only(carry, cor):
        outv = pw._unpack_cor(cor + 1e-12 * carry, L, g, hs, ws)
        return jnp.mean(outv)

    t_h = chain_latency(unpack_only, cors[0], iters=it)
    print(f"H  _unpack_cor (once):               {t_h * 1e3:8.2f} ms")

    total = t_b + t_c + t_d + t_e + (t_f - t_e) + t_g + t_h
    print(f"\nreconcile: B+C+D+E+(F-E)+G+H = {total * 1e3:.2f} ms "
          f"vs A {t_a * 1e3:.2f} ms (residual {(t_a - total) * 1e3:+.2f})")
    print(f"per-view kernel proper: {(t_f - t_e) / nv * 1e3:.2f} ms "
          f"(docstring synthetic bench: mid-s4 2.7 / raw-s4 16.9)")


if __name__ == "__main__":
    main()
