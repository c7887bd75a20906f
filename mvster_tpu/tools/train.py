"""Training driver: SPMD data-parallel MVS4Net training.

The train_mvs4.py replacement.  One program runs everywhere: single chip,
a multi-chip slice, or multi-host pods — the mesh covers all devices, the
global batch is sharded on the "data" axis, and per-process loaders read
disjoint dataset shards (jax.process_index).  No DDP wrapper, no NCCL
plumbing, no explicit scalar reduction (SURVEY.md section 5.8).

Usage (mirrors scripts/train_dtu.sh):
  python -m mvster_tpu.tools.train --trainpath $DTU --trainlist lists/dtu/train.txt \
      --testlist lists/dtu/val.txt --logdir ckpt/exp --batch_size 8 \
      --group_cor --inverse_depth --rt --mono --attn_temp 2
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np
import optax

from mvster_tpu.data import MVSLoader, find_dataset_def
from mvster_tpu.dist.mesh import make_data_mesh, maybe_initialize_distributed
from mvster_tpu.dist.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from mvster_tpu.models import MVS4Net
from mvster_tpu.models.losses import blend_loss, mvs4net_loss
from mvster_tpu.tools.cli import (
    build_train_parser,
    loss_kwargs_from_args,
    model_config_from_args,
)
from mvster_tpu.train.checkpoint import CheckpointManager
from mvster_tpu.train.logging import MetricLogger
from mvster_tpu.train.loop import evaluate, train_epoch
from mvster_tpu.train.schedules import make_lr_schedule
from jax.sharding import NamedSharding, PartitionSpec as P


def build_datasets(args):
    dataset_cls = find_dataset_def(args.dataset)
    if args.dataset.startswith("dtu"):
        train_ds = dataset_cls(
            args.trainpath, args.trainlist, "train", args.nviews,
            args.interval_scale, rt=args.rt, use_raw_train=args.use_raw_train,
            seed=args.seed,
        )
        val_ds = dataset_cls(
            args.testpath or args.trainpath, args.testlist, "val", args.nviews,
            args.interval_scale,
        )
    elif args.dataset.startswith("blendedmvs"):
        train_ds = dataset_cls(
            args.trainpath, args.trainlist, "train", args.nviews,
            robust_train=args.rt, seed=args.seed,
        )
        val_ds = dataset_cls(
            args.testpath or args.trainpath, args.testlist, "val", args.nviews,
            robust_train=False,
        )
    else:
        raise ValueError(f"unsupported training dataset {args.dataset}")
    return train_ds, val_ds


def main(argv=None):
    args = build_train_parser().parse_args(argv)
    from mvster_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    process_index, process_count = maybe_initialize_distributed()
    is_main = process_index == 0

    mesh = make_data_mesh()
    n_devices = mesh.devices.size
    if args.batch_size % (n_devices * process_count) and args.batch_size % n_devices:
        raise ValueError(
            f"global batch {args.batch_size} must divide across {n_devices} devices"
        )

    config = model_config_from_args(args)
    model = MVS4Net(config)
    loss_fn = blend_loss if args.dataset.startswith("blendedmvs") else mvs4net_loss
    loss_kwargs = loss_kwargs_from_args(args, mono=args.mono)

    train_ds, val_ds = build_datasets(args)
    per_process_batch = args.batch_size // process_count
    train_loader = MVSLoader(
        train_ds, per_process_batch, shuffle=True, drop_last=True,
        num_shards=process_count, shard_index=process_index, seed=args.seed,
        num_workers=args.num_workers,
    )
    # drop_last=False like the reference's val loader (train_mvs4.py:141-176);
    # the trailing partial batch is padded with zero-mask duplicates inside
    # evaluate() so jit keeps one compiled shape (train/loop.pad_eval_batch)
    val_loader = MVSLoader(
        val_ds, per_process_batch, shuffle=False, drop_last=False,
        num_shards=process_count, shard_index=process_index,
    )
    steps_per_epoch = len(train_loader)

    schedule = make_lr_schedule(
        args.lr_scheduler, args.lr, steps_per_epoch, args.epochs, args.lrepochs
    )
    tx = optax.adam(schedule, b1=0.9, b2=0.999)
    if args.wd > 0:
        tx = optax.chain(optax.add_decayed_weights(args.wd), tx)

    # ---- init / resume ----
    sample = train_ds[0]
    init_batch = {
        "imgs": np.asarray(sample["imgs"])[None],
        "proj_matrices": {
            k: np.asarray(v)[None] for k, v in sample["proj_matrices"].items()
        },
        "depth_values": np.asarray(sample["depth_values"])[None],
    }
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(args.seed),
            init_batch["imgs"], init_batch["proj_matrices"],
            init_batch["depth_values"], train=True,
        )
    )()

    if args.loadckpt:
        ckpt_mgr = CheckpointManager(args.logdir)
        loaded = ckpt_mgr.load_weights(variables["params"], args.loadckpt)
        variables = {**variables, **loaded}
        print(f"loaded weights from {args.loadckpt}")

    state = create_train_state(variables, tx)
    ckpt_mgr = CheckpointManager(args.logdir)
    start_epoch = 0
    if args.resume:
        restored, step = ckpt_mgr.restore(
            {"state": jax.device_get(state), "epoch": 0}
        )
        if restored is not None:
            state = jax.tree_util.tree_map(
                lambda a, b: jax.numpy.asarray(b), state, restored["state"]
            )
            start_epoch = int(restored["epoch"]) + 1
            print(f"resumed from step {step}, starting epoch {start_epoch}")

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, replicated)

    train_step = make_train_step(
        model, tx, loss_fn=loss_fn, loss_kwargs=loss_kwargs, mesh=mesh,
        grad_accum=getattr(args, "grad_accum", 1),
    )
    eval_step = make_eval_step(model, loss_fn=loss_fn, loss_kwargs=loss_kwargs,
                               mesh=mesh)

    logger = MetricLogger(args.logdir, is_main=is_main)
    print(
        f"training: {len(train_ds)} samples, {steps_per_epoch} steps/epoch, "
        f"{n_devices} devices, {process_count} processes"
    )

    if args.mode == "profile":
        # the reference declares --mode profile but raises NotImplementedError
        # (train_mvs4.py:428); here it captures a real device trace of a few
        # train steps, viewable in TensorBoard's profile plugin
        from mvster_tpu.train.loop import device_batch
        from mvster_tpu.utils.profiling import trace

        batch_iter = iter(train_loader)
        warm = device_batch(next(batch_iter), sharded)
        state, _, _ = train_step(state, warm)  # compile outside the trace
        with trace(os.path.join(args.logdir, "profile")):
            for _ in range(3):
                state, scalars, _ = train_step(
                    state, device_batch(next(batch_iter), sharded)
                )
            jax.block_until_ready(scalars["loss"])
        print(f"profile trace written to {args.logdir}/profile")
        return

    for epoch in range(start_epoch, args.epochs):
        state = train_epoch(
            state, train_step, train_loader, epoch, logger,
            summary_freq=args.summary_freq, batch_sharding=sharded,
        )
        if is_main and (epoch + 1) % args.save_freq == 0:
            ckpt_mgr.save(
                steps_per_epoch * (epoch + 1),
                {"state": jax.device_get(state), "epoch": epoch},
            )
        if epoch % args.eval_freq == 0 or epoch == args.epochs - 1:
            evaluate(
                state, eval_step, val_loader, logger,
                global_step=steps_per_epoch * (epoch + 1),
                batch_sharding=sharded,
            )
    logger.close()


if __name__ == "__main__":
    main()
