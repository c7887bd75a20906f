"""Speed-of-light (roofline) analysis of the MVS4Net forward.

Per component (FPN, per-stage cost volume / reg2d), computes:

  * algebraic FLOPs — from XLA's own cost model (`compiled.cost_analysis()`
    on the CPU backend; FLOP counts are backend-independent algebra),
  * irreducible HBM traffic — analytic input+output bytes (the floor a
    perfectly-fused kernel could reach), plus a realistic per-layer
    activation floor for conv stacks (a 3x3 conv chain cannot fuse across
    layers: each layer's activations must round-trip HBM once),
  * gather taps for the plane-sweep warp — H*W*D*(V-1) bilinear taps of C
    channels each; these do NOT map to the MXU, so their floor is set by
    VPU gather/FMA throughput, not FLOP/s,

then divides by the chip's PAPER peaks to get a speed-of-light time per
component and for the whole forward.  Read it as a HEADROOM map, not an
achievable floor: batch-1 MVS inference is nowhere near peak on either
chip (the 3090 baseline itself runs ~100x above its own paper SoL), and
the achievable floor is set by primitive throughputs — VPU dynamic_gather
rate for the warp scan (scripts/probe_row_pack.py predicts the kernel's
actual per-vreg scan work) and the low-channel conv MXU cliff
(scripts/probe_conv_eff.py) — not by FLOP/byte peaks.  Compare against the
measured chain_latency component map (scripts/bench_components.py,
BENCHNOTES.md) to get achieved efficiency per component, and against the
same paper floors for the reference's RTX 3090 to see that its 0.17
s/view raw baseline (/root/reference/README.md:81) carries the same
inefficiency — i.e. there is no physics argument that the baseline is
unbeatable, only primitive-level engineering.

Peaks used (stated so the arithmetic is checkable):

  TPU v5e (1 chip):  197 TFLOP/s MXU (bf16 multiply, f32 accumulate — the
      default precision for f32 convs too, which decompose to bf16 passes),
      819 GB/s HBM.  VPU: 8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz
      ~= 3.85 Tops/s elementwise f32.
  RTX 3090:  35.6 TFLOP/s f32 FMA, 936 GB/s HBM, ~142 Gtexel/s texture
      bilinear (the unit grid_sample rides; one texel fetch = one full
      bilinear tap per channel-quad).

Usage: python scripts/roofline_raw.py [H W [V]]   (defaults 1152 1600 5)
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

TPU_MXU = 197e12  # FLOP/s
TPU_HBM = 819e9  # B/s
TPU_VPU = 3.85e12  # elementwise ops/s
GPU_FMA = 35.6e12
GPU_HBM = 936e9
GPU_TEX = 142e9  # bilinear texel fetches / s

# VPU cost of ONE bilinear tap in the Pallas kernel's inner loop, in
# elementwise ops per channel: 2 dynamic_gather lane-ops (two window rows)
# + 2 y-lerp FMAs + 2 x-lerp FMAs + ~2 ops of weight/address arithmetic
# amortized over the vreg.  Derivation: kernels/pallas_warp.py inner scan.
VPU_OPS_PER_TAP_PER_CH = 8.0


def flops_of(fn, *args):
    """XLA's algebraic FLOP count for fn(*args) (CPU backend)."""
    c = jax.jit(fn).lower(*args).compile()
    an = c.cost_analysis()
    if isinstance(an, list):  # older jax returns [dict]
        an = an[0]
    return float(an.get("flops", 0.0))


def nbytes(tree):
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
    )


def fmt_ms(s):
    return f"{s * 1e3:8.2f} ms"


def main():
    argv = sys.argv[1:]
    h, w = (int(argv[0]), int(argv[1])) if len(argv) >= 2 else (1152, 1600)
    v = int(argv[2]) if len(argv) >= 3 else 5

    from helpers import synthetic_sample

    from mvster_tpu.kernels.cost_volume import build_cost_volume
    from mvster_tpu.models import MVS4Net, MVS4NetConfig
    from mvster_tpu.nn.fpn import FPN4
    from mvster_tpu.nn.reg import Reg2d
    from bench_components import stage_inputs  # scripts/ sibling

    cfg = MVS4NetConfig.dtu_default(mono=False)
    model = MVS4Net(cfg)
    s = synthetic_sample(0, batch=1, nviews=v, h=h, w=w)
    imgs = jnp.asarray(s["imgs"])
    projs = {k: jnp.asarray(p) for k, p in s["proj_matrices"].items()}
    dvals = jnp.asarray(s["depth_values"])

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), imgs, projs, dvals,
                           train=False)
    )()
    out = jax.jit(
        lambda vs, im: model.apply(vs, im, projs, dvals, train=False,
                                   return_debug=True)
    )(variables, imgs)
    jax.block_until_ready(out["depth"])

    # (name, flops, vpu_channel_taps, io_floor_bytes, layer_floor_bytes,
    #  gpu_texture_fetches)
    rows = []

    # ---- FPN over V views ------------------------------------------------
    fpn = FPN4(cfg.fpn_base_channel, dcn=cfg.dcn)
    flat = imgs.reshape(v, h, w, 3)
    fvars = jax.jit(lambda: fpn.init(jax.random.PRNGKey(0), flat, False))()
    fout = jax.jit(lambda fv, x: fpn.apply(fv, x, False))(fvars, flat)
    f_flops = flops_of(lambda fv, x: fpn.apply(fv, x, False), fvars, flat)
    io_floor = nbytes(flat) + nbytes(fout)
    # per-layer activation floor: every intermediate conv activation writes
    # + reads HBM once (3x3 convs cannot fuse across layers).  Walk the
    # encoder shapes: [8,8]@1/1, [16,16,16]@1/2, [32,32,32]@1/4,
    # [64,64,64]@1/8 channels per view (nn/fpn.py enc_block specs) + the
    # top-down intras (64@1/8, 32..8 lateral adds) + outputs.
    act = 0
    for ch, scale, n in [(8, 1, 2), (16, 2, 3), (32, 4, 3), (64, 8, 3)]:
        act += n * (h // scale) * (w // scale) * ch
    for ch, scale in [(64, 8), (64, 4), (64, 2), (64, 1)]:  # intra pathway
        act += (h // scale) * (w // scale) * ch
    layer_floor = v * act * 4 * 2 + nbytes(flat) + nbytes(fout)
    rows.append(
        ("fpn (%d views)" % v, f_flops, 0.0, io_floor, layer_floor, 0.0))

    # ---- per-stage cost volume + reg2d ------------------------------------
    stages = stage_inputs(cfg, out, dvals)
    for si, (feat, proj, hypo) in enumerate(stages):
        g = cfg.group_cor_dim[si]
        nd = cfg.stage_splits[si]
        hs, ws, c = feat.shape[2], feat.shape[3], feat.shape[-1]

        def cv_fn(f, hy):
            return build_cost_volume(
                f[:, 0], [f[:, i] for i in range(1, v)], proj[:, 0],
                [proj[:, i] for i in range(1, v)], hy,
                group_cor=cfg.group_cor, group_dim=g,
                attn_temp=cfg.attn_temp, attn_fuse_d=cfg.attn_fuse_d,
                impl="xla",  # algebra identical; pallas won't lower on CPU
            )

        cv_flops = flops_of(cv_fn, feat, hypo)
        cor = jax.jit(cv_fn)(feat, hypo)
        taps_px = hs * ws * nd * (v - 1)  # bilinear taps (each = 4 corners)
        taps_ch = taps_px * c  # channel-taps the VPU must gather+blend
        # GPU texture units fetch 4 channels per bilinear tap (float4
        # textures), so grid_sample needs ceil(c/4) fetches per tap
        tex = taps_px * -(-c // 4)
        cv_io = nbytes(feat) + nbytes(hypo) + nbytes(cor)
        rows.append(
            (f"cost-volume s{si + 1} ({hs}x{ws} C{c} D{nd})",
             cv_flops, taps_ch, cv_io, cv_io, tex),
        )

        reg = Reg2d(cfg.reg_channel, cfg.agg_type)
        rvars = jax.jit(lambda: reg.init(jax.random.PRNGKey(0), cor, False))()
        r_flops = flops_of(lambda rv, x: reg.apply(rv, x, False), rvars, cor)
        rout = jax.jit(lambda rv, x: reg.apply(rv, x, False))(rvars, cor)
        r_io = nbytes(cor) + nbytes(rout)
        # reg2d U-Net on (B, D, H, W, C) volumes (nn/reg.py): enc levels
        # 8@1/1, 16@1/2 (x2 layers), 32@1/4 (x2), 64@1/8, decoder mirror
        # with skip adds — every activation carries the full D axis
        act = 0
        for ch, scale, n in [(8, 1, 2), (16, 2, 3), (32, 4, 3), (64, 8, 2),
                             (32, 4, 1), (16, 2, 1), (8, 1, 1)]:
            act += n * nd * (hs // scale) * (ws // scale) * ch
        r_layer = act * 4 * 2 + r_io
        rows.append(
            (f"reg2d s{si + 1}", r_flops, 0.0, r_io, r_layer, 0.0))

    # ---- report ------------------------------------------------------------
    print(f"\nroofline @ {h}x{w}, {v} views, f32 storage (bf16 MXU passes)\n")
    print(f"{'component':38s} {'GFLOP':>8s} {'Gtap·ch':>8s} {'io-floor':>9s} "
          f"{'layerMB':>8s} | {'TPU SoL':>10s} {'3090 SoL':>10s}")
    tot_tpu = tot_gpu = 0.0
    for name, fl, taps, io_b, layer_b, tex in rows:
        t_mxu = fl / TPU_MXU
        t_hbm = layer_b / TPU_HBM
        t_vpu = taps * VPU_OPS_PER_TAP_PER_CH / TPU_VPU
        t_tpu = max(t_mxu, t_hbm, t_vpu)
        g_fma = fl / GPU_FMA
        g_hbm = layer_b / GPU_HBM
        g_tex = tex / GPU_TEX
        t_gpu = max(g_fma, g_hbm, g_tex)
        tot_tpu += t_tpu
        tot_gpu += t_gpu
        print(f"{name:38s} {fl / 1e9:8.1f} {taps / 1e9:8.2f} "
              f"{io_b / 1e6:7.1f}MB {layer_b / 1e6:7.1f} | "
              f"{fmt_ms(t_tpu)} {fmt_ms(t_gpu)}")
    print("-" * 100)
    print(f"{'TOTAL forward speed-of-light':38s} {'':8s} {'':8s} {'':9s} "
          f"{'':8s} | {fmt_ms(tot_tpu)} {fmt_ms(tot_gpu)}")
    # NOTE the baseline's "s/view" unit is seconds per REFERENCE view, i.e.
    # per forward (one depth map from V input views) — exactly this total.
    print(f"\nper-forward SoL (the baseline's s/view unit): "
          f"TPU {tot_tpu * 1e3:.1f} ms, 3090 {tot_gpu * 1e3:.1f} ms "
          f"(3090 measured: 170 ms raw, 90 ms mid)")
    print("Compare TPU SoL against the measured component map in "
          "BENCHNOTES.md to get achieved efficiency per component.")


if __name__ == "__main__":
    main()
