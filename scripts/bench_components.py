"""Component map of the MVS4Net forward, measured with chain_latency.

Produces the per-component latency decomposition (FPN, per-stage cost
volume / regularizer / winner-take-all post) that must sum to the full
forward within noise — the reconciliation the round-2 verdict demanded
(three mutually inconsistent mid decompositions) and the raw-size
diagnosis it found missing.  All timings use the chained protocol
(utils/profiling.chain_latency); wall-clock + block_until_ready is invalid
through the hosted axon runtime (BENCHNOTES.md).

Component inputs are PRODUCTION shapes: a debug forward on the bench
geometry (tests/helpers.synthetic_sample) supplies each stage's features
and projections, and the hypothesis schedule is recomputed exactly as
MVS4Net._stage does.  The committed results table lives in BENCHNOTES.md.

Usage: python scripts/bench_components.py [H W [V]] [--dtype bfloat16]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np


def stage_inputs(cfg, out, dvals):
    """Per-stage (features, projections, hypothesis) exactly as the
    production cascade computed them (debug forward + recomputed schedule)."""
    from mvster_tpu.core.hypothesis import (
        init_inverse_range,
        schedule_inverse_range,
    )

    stages = []
    prev = None
    for si in range(cfg.num_stage):
        st = out[f"stage{si + 1}"]
        feat = st["debug_features"]
        proj = st["debug_proj"]
        hs, ws = feat.shape[2], feat.shape[3]
        nd = cfg.stage_splits[si]
        if si == 0:
            hypo = init_inverse_range(dvals, nd, hs, ws)
            bounds = None
        else:
            bounds = (prev["inverse_min_depth"], prev["inverse_max_depth"])
            hypo = schedule_inverse_range(bounds[0], bounds[1], nd, hs, ws)
        prev = st
        stages.append((feat, proj, hypo, bounds))
    return stages


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dims", nargs="*", type=int, metavar="H W [V]")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--fold", action="store_true",
                    help="route reg2d through the folded-depth eval "
                    "formulation (nn/reg.py) — the A/B for its routing "
                    "default; affects the full forward AND the reg2d rows")
    ap.add_argument("--fpn-compose", action="store_true",
                    help="route the FPN last-level tail through the "
                    "composed formulation (nn/fpn.py:_composed_tail) — "
                    "the A/B for its routing default; affects the full "
                    "forward AND the fpn row")
    ap.add_argument("--fpn-compose-mode", default="hconv",
                    choices=["hconv", "up"],
                    help="composed-tail variant: 'hconv' avoids the "
                    "full-res 64ch tensor entirely (H-up + 3x1 conv + "
                    "W-gather); 'up' materializes up(x) and convolves it")
    ap.add_argument("--rp-sweep", action="store_true",
                    help="per stage, also time the Pallas cost volume with "
                    "the row-pack layout pinned to rp=1/2/4 on the REAL "
                    "production geometry — the measured table that places "
                    "kernels/pallas_warp._row_pack's thresholds")
    ns = ap.parse_args()
    dtype = ns.dtype
    h, w = (ns.dims[0], ns.dims[1]) if len(ns.dims) >= 2 else (512, 640)
    v = ns.dims[2] if len(ns.dims) >= 3 else 5

    from helpers import synthetic_sample

    from mvster_tpu.core.hypothesis import (
        init_inverse_range,
        schedule_inverse_range,
    )
    from mvster_tpu.core.sampling import resize_bilinear_align_corners
    from mvster_tpu.kernels.cost_volume import build_cost_volume
    from mvster_tpu.models import MVS4Net, MVS4NetConfig
    from mvster_tpu.nn.fpn import FPN4
    from mvster_tpu.nn.reg import Reg2d
    from mvster_tpu.utils.cache import enable_compilation_cache
    from mvster_tpu.utils.profiling import chain_latency

    enable_compilation_cache()  # the debug forward alone is ~20 min cold
    cfg = MVS4NetConfig.dtu_default(mono=False, compute_dtype=dtype,
                                    reg2d_fold=ns.fold,
                                    fpn_compose=ns.fpn_compose,
                                    fpn_compose_mode=ns.fpn_compose_mode)
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = MVS4Net(cfg)
    s = synthetic_sample(0, batch=1, nviews=v, h=h, w=w)
    imgs = jnp.asarray(s["imgs"])
    projs = {k: jnp.asarray(p) for k, p in s["proj_matrices"].items()}
    dvals = jnp.asarray(s["depth_values"])

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), imgs, projs, dvals,
                           train=False)
    )()

    # --- full forward (the headline this table must sum to).  Timed BEFORE
    # the debug forward: the debug outputs (all-stage features + volumes,
    # GBs at raw size) would otherwise sit in HBM during the chained run
    # and OOM the 16 GB chip.
    def full(carry, vs, im):
        o = model.apply(vs, im + 1e-12 * carry, projs, dvals, train=False)
        return jnp.mean(o["depth"]) + jnp.mean(o["photometric_confidence"])

    t_full = chain_latency(full, variables, imgs, iters=4)
    print(f"full forward: {t_full * 1e3:8.1f} ms   ({h}x{w}, {v} views, "
          f"{dtype})")

    # --- FPN over all V views (one folded conv batch, as production runs it)
    fpn = FPN4(cfg.fpn_base_channel, dcn=cfg.dcn, dtype=cdt,
               compose_tail=cfg.fpn_compose,
               compose_mode=cfg.fpn_compose_mode)
    flat = imgs.reshape(v, h, w, 3)
    fvars = jax.jit(lambda: fpn.init(jax.random.PRNGKey(0), flat, False))()

    def fpn_fn(carry, fv, x):
        o = fpn.apply(fv, x + 1e-12 * carry, False)
        return sum(jnp.mean(o[k].astype(jnp.float32)) for k in o)

    t_fpn = chain_latency(fpn_fn, fvars, flat, iters=4)
    print(f"fpn ({v} views): {t_fpn * 1e3:8.1f} ms")

    out = jax.jit(
        lambda vs, im: model.apply(vs, im, projs, dvals, train=False,
                                   return_debug=True)
    )(variables, imgs)
    jax.block_until_ready(out["depth"])
    stages = stage_inputs(cfg, out, dvals)
    del out  # free the debug volumes; stages holds only feat/proj/hypo
    t_cv_all = t_reg_all = t_post_all = t_hypo_all = 0.0
    for si, (feat, proj, hypo, bounds) in enumerate(stages):
        g = cfg.group_cor_dim[si]
        nd = cfg.stage_splits[si]
        hs, ws = feat.shape[2], feat.shape[3]
        if cdt != jnp.float32:
            feat = feat.astype(jnp.float32)  # production upcasts for pallas

        # under --fold, measure the PRODUCTION composition: the cost volume
        # emits the folded (B, 1, H, W, D*G) layout directly (one transpose
        # from packed space) and the regularizer consumes it input_folded —
        # timing bdhwc emission + an explicit refold here would charge the
        # rows for layout glue production never executes (the r4f raw
        # residual came partly from exactly that mismatch)
        fold_cv = cfg.reg2d_fold and cfg.agg_type == "ConvBnReLU3D"

        def cv_fn(carry, f, hy):
            ref = f[:, 0] + 1e-12 * carry
            srcs = [f[:, i] for i in range(1, f.shape[1])]
            cor = build_cost_volume(
                ref, srcs, proj[:, 0], [proj[:, i] for i in range(1, v)],
                hy, group_cor=cfg.group_cor, group_dim=g,
                attn_temp=cfg.attn_temp, attn_fuse_d=cfg.attn_fuse_d,
                impl="pallas",
                out_layout="folded" if fold_cv else "bdhwc",
            )
            return jnp.mean(cor)

        t_cv = chain_latency(cv_fn, feat, hypo, iters=4)

        if ns.rp_sweep:
            cells = []
            for rp in (1, 2, 4):
                nd_ = hypo.shape[1]
                if 128 % (rp * nd_) or hs % (8 * rp):
                    continue

                def cv_rp(carry, f, hy, rp=rp):
                    ref = f[:, 0] + 1e-12 * carry
                    srcs = [f[:, i] for i in range(1, f.shape[1])]
                    cor, fb = build_cost_volume(
                        ref, srcs, proj[:, 0],
                        [proj[:, i] for i in range(1, v)],
                        hy, group_cor=cfg.group_cor, group_dim=g,
                        attn_temp=cfg.attn_temp, attn_fuse_d=cfg.attn_fuse_d,
                        impl="pallas", force_rp=rp, with_fallbacks=True,
                    )
                    return jnp.mean(cor) + 0.0 * fb.astype(jnp.float32)

                # feasibility first: a pinned layout that falls back to XLA
                # would time the wrong thing
                _, fb = jax.jit(
                    lambda f, hy, rp=rp: build_cost_volume(
                        f[:, 0], [f[:, i] for i in range(1, f.shape[1])],
                        proj[:, 0], [proj[:, i] for i in range(1, v)], hy,
                        group_cor=cfg.group_cor, group_dim=g,
                        attn_temp=cfg.attn_temp, attn_fuse_d=cfg.attn_fuse_d,
                        impl="pallas", force_rp=rp, with_fallbacks=True,
                    )
                )(feat, hypo)
                if int(fb) > 0:
                    cells.append(f"rp{rp} fallback")
                    continue
                t_rp = chain_latency(cv_rp, feat, hypo, iters=4)
                cells.append(f"rp{rp} {t_rp * 1e3:7.2f} ms")
            print(f"    stage{si + 1} rp sweep: " + " | ".join(cells))

        cor = jax.jit(
            lambda f, hy: build_cost_volume(
                f[:, 0], [f[:, i] for i in range(1, v)], proj[:, 0],
                [proj[:, i] for i in range(1, v)], hy,
                group_cor=cfg.group_cor, group_dim=g,
                attn_temp=cfg.attn_temp, attn_fuse_d=cfg.attn_fuse_d,
                impl="xla",
                out_layout="folded" if fold_cv else "bdhwc",
            )
        )(feat, hypo)
        reg_kw = dict(input_folded=True, depth=nd) if fold_cv else {}
        reg = Reg2d(cfg.reg_channel, cfg.agg_type, dtype=cdt,
                    fold=cfg.reg2d_fold)
        rvars = jax.jit(
            lambda: reg.init(jax.random.PRNGKey(0), cor, False, **reg_kw)
        )()

        def reg_fn(carry, rv, x):
            return jnp.mean(
                reg.apply(rv, x + 1e-12 * carry, False,
                          **reg_kw).astype(jnp.float32)
            )

        t_reg = chain_latency(reg_fn, rvars, cor, iters=4)

        logits = jax.jit(
            lambda rv, x: reg.apply(rv, x, False, **reg_kw)
        )(rvars, cor)
        up = 2 ** (3 - si)

        def post_fn(carry, lg, hy):
            attn = jax.nn.softmax(
                (lg + 1e-12 * carry).astype(jnp.float32), axis=1
            )
            idx = jnp.argmax(attn, axis=1)
            d_iota = jnp.arange(attn.shape[1], dtype=idx.dtype)
            onehot = idx[:, None] == d_iota[None, :, None, None]
            depth = jnp.sum(hy * onehot, axis=1)
            conf = jnp.max(attn, axis=1)
            if up > 1:
                conf = resize_bilinear_align_corners(
                    conf[..., None], conf.shape[1] * up, conf.shape[2] * up
                )[..., 0]
            itv = 1.0 / hy[:, 2] - 1.0 / hy[:, 1]
            return (jnp.mean(depth) + jnp.mean(conf) + jnp.mean(itv))

        t_post = chain_latency(post_fn, logits, hypo, iters=4)

        # hypothesis scheduling (init at stage1, trilinear-resize window
        # schedule after) — the inter-stage glue the sums previously
        # attributed to "residual"
        if bounds is None:
            def hypo_fn(carry, dv, _):
                return jnp.mean(
                    init_inverse_range(dv + 1e-12 * carry, nd, hs, ws)
                )

            t_hypo = chain_latency(hypo_fn, dvals, dvals, iters=4)
        else:
            def hypo_fn(carry, lo, hi):
                return jnp.mean(
                    schedule_inverse_range(lo + 1e-12 * carry, hi, nd, hs, ws)
                )

            t_hypo = chain_latency(hypo_fn, bounds[0], bounds[1], iters=4)

        print(
            f"stage{si + 1} ({hs:4d}x{ws:4d} C{feat.shape[-1]:2d} D{nd}): "
            f"cost-volume {t_cv * 1e3:7.2f} ms | reg2d {t_reg * 1e3:7.2f} ms"
            f" | post {t_post * 1e3:6.2f} ms | hypo {t_hypo * 1e3:6.2f} ms"
        )
        t_cv_all += t_cv
        t_reg_all += t_reg
        t_post_all += t_post
        t_hypo_all += t_hypo
        cor = logits = None  # free the stage volume before the next stage

    t_sum = t_fpn + t_cv_all + t_reg_all + t_post_all + t_hypo_all
    print(
        f"\ncomponent sums: fpn {t_fpn * 1e3:.1f} + cost-volume "
        f"{t_cv_all * 1e3:.1f} + reg2d {t_reg_all * 1e3:.1f} + post "
        f"{t_post_all * 1e3:.1f} + hypo {t_hypo_all * 1e3:.1f} "
        f"= {t_sum * 1e3:.1f} ms "
        f"vs full {t_full * 1e3:.1f} ms "
        f"(residual {(t_full - t_sum) * 1e3:+.1f} ms)"
    )


if __name__ == "__main__":
    main()
