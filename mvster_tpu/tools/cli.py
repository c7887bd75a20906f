"""Shared CLI flag surface for the train/test drivers.

One parser serving both entry points, replacing the duplicated-and-divergent
argparse blocks of the reference (train_mvs4.py:16-77 vs test_mvs4.py:22-79;
e.g. conf defaults 0.9 there but 0.5 in the published script — we default to
the published values, scripts/test_dtu.sh:19-23).
"""

from __future__ import annotations

import argparse

from mvster_tpu.models import MVS4NetConfig


def _csv_ints(text: str):
    return tuple(int(x) for x in text.split(",") if x)


def _csv_floats(text: str):
    return tuple(float(x) for x in text.split(",") if x)


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--arch_mode", default="fpn", choices=["fpn", "convnext", "convnext4"])
    p.add_argument("--reg_mode", default="reg2d", choices=["reg2d", "reg3d"])
    p.add_argument("--fpn_base_channel", type=int, default=8)
    p.add_argument("--reg_channel", type=int, default=8)
    p.add_argument("--ndepths", type=str, default="8,8,4,4")
    p.add_argument("--depth_inter_r", type=str, default="0.5,0.5,0.5,1")
    p.add_argument("--group_cor", action="store_true")
    p.add_argument("--group_cor_dim", type=str, default="8,8,4,4")
    p.add_argument("--inverse_depth", action="store_true")
    p.add_argument("--agg_type", default="ConvBnReLU3D")
    p.add_argument("--dcn", action="store_true")
    p.add_argument("--pos_enc", type=int, default=0)
    p.add_argument("--mono", action="store_true")
    p.add_argument("--ASFF", action="store_true")
    p.add_argument("--attn_temp", type=float, default=2.0)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv compute precision (norms/softmax/loss stay f32)")
    p.add_argument("--reg2d_fold", default="auto", choices=["auto", "on", "off"],
                   help="folded-depth reg2d eval formulation (nn/reg.py); "
                        "auto = the measured MVS4NetConfig default")


def model_config_from_args(args) -> MVS4NetConfig:
    fold_kw = {}
    if getattr(args, "reg2d_fold", "auto") != "auto":
        fold_kw["reg2d_fold"] = args.reg2d_fold == "on"
    return MVS4NetConfig(
        **fold_kw,
        arch_mode=args.arch_mode,
        reg_net=args.reg_mode,
        fpn_base_channel=args.fpn_base_channel,
        reg_channel=args.reg_channel,
        stage_splits=_csv_ints(args.ndepths),
        depth_interals_ratio=_csv_floats(args.depth_inter_r),
        group_cor=args.group_cor,
        group_cor_dim=_csv_ints(args.group_cor_dim),
        inverse_depth=args.inverse_depth,
        agg_type=args.agg_type,
        dcn=args.dcn,
        pos_enc=args.pos_enc,
        mono=args.mono,
        asff=args.ASFF,
        attn_temp=args.attn_temp,
        compute_dtype=args.compute_dtype,
    )


def loss_kwargs_from_args(args, mono: bool) -> dict:
    return dict(
        stage_lw=_csv_floats(args.dlossw),
        l1ot_lw=_csv_floats(args.l1ce_lw),
        inverse_depth=args.inverse_depth,
        ot_iter=args.ot_iter,
        ot_eps=args.ot_eps,
        ot_continous=args.ot_continous,
        ot_backend=args.ot_backend,
        mono=mono,
    )


def build_train_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="mvster_tpu training driver")
    p.add_argument("--mode", default="train", choices=["train", "test", "profile"])
    p.add_argument("--dataset", default="dtu")
    p.add_argument("--trainpath", required=True)
    p.add_argument("--testpath", default=None)
    p.add_argument("--trainlist", required=True)
    p.add_argument("--testlist", required=True)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--lrepochs", type=str, default="6,8,9:2")
    p.add_argument("--lr_scheduler", default="MS", choices=["MS", "cos", "onecycle"])
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=1,
                   help="GLOBAL batch size (sharded across the data mesh)")
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--loadckpt", default=None)
    p.add_argument("--logdir", default="./checkpoints/debug")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--summary_freq", type=int, default=100)
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--nviews", type=int, default=5)
    p.add_argument("--dlossw", type=str, default="1,1,1,1")
    p.add_argument("--l1ce_lw", type=str, default="0,1")
    p.add_argument("--ot_continous", action="store_true")
    p.add_argument("--ot_iter", type=int, default=10)
    p.add_argument("--ot_eps", type=float, default=1)
    p.add_argument("--ot_backend", default="xla", choices=["xla", "pallas"],
                   help="Sinkhorn OT loss implementation: xla (remat'd scan) "
                        "or pallas (VMEM-fused fwd+bwd kernel, "
                        "kernels/pallas_sinkhorn.py; discrete OT only)")
    p.add_argument("--rt", action="store_true")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split each batch into N sequential microbatches, "
                        "accumulate gradients, apply one optimizer update — "
                        "peak activation memory of one microbatch "
                        "(dist/train_step.py)")
    p.add_argument("--use_raw_train", action="store_true")
    p.add_argument("--num_workers", type=int, default=0,
                   help="decode samples in N worker processes (0 = in-process)")
    add_model_args(p)
    return p


def build_test_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="mvster_tpu inference + fusion driver")
    p.add_argument("--dataset", default="general_eval")
    p.add_argument("--testpath", required=True)
    p.add_argument("--testlist", required=True)
    p.add_argument("--loadckpt", required=True)
    p.add_argument("--outdir", default="./outputs")
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--num_view", type=int, default=5)
    p.add_argument("--eval_batch", type=int, default=1,
                   help="reference views per forward (serving throughput)")
    p.add_argument("--max_h", type=int, default=864)
    p.add_argument("--max_w", type=int, default=1152)
    p.add_argument("--fix_res", action="store_true")
    p.add_argument("--use_raw_train", action="store_true")
    p.add_argument("--filter_method", default="normal", choices=["normal", "gipuma"])
    p.add_argument("--conf", type=float, default=0.5)
    p.add_argument("--thres_view", type=int, default=4)
    p.add_argument("--split", default="intermediate")
    p.add_argument("--save_jpg", action="store_true")
    p.add_argument("--save_freq", type=int, default=20)
    p.add_argument("--vis_ETA", action="store_true")
    p.add_argument("--vis_mono", action="store_true")
    p.add_argument("--dtu_gt_dir", default=None,
                   help="DTU SampleSet 'MVS Data' dir; runs the Python metric when set")
    add_model_args(p)
    return p
