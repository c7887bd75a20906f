"""Sharded train/eval steps: jit over the data mesh, grads psum'd by XLA.

One SPMD program replaces the reference's DDP wrapper + gradient hooks +
explicit metric reduction (train_mvs4.py:389-392, utils.py:183-201): the batch
is sharded on the mesh's "data" axis, parameters are replicated, and every
cross-replica reduction (loss means, gradient averaging, metrics) is a global
op that GSPMD lowers to ICI collectives automatically.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from mvster_tpu.models.losses import mvs4net_loss
from mvster_tpu.train.metrics import depth_metrics


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
    )


def _collect_scalars_images(loss, aux, outputs, imgs, depth_gt_ms, mask_ms):
    """Per-batch scalar/image dicts (the reference train_sample's scalar
    set, train_mvs4.py:195-249) — shared by the plain and grad-accum
    paths."""
    final_stage = f"stage{len(aux['stage_ot_loss'])}"
    scalars = {"loss": loss}
    for i in range(len(aux["stage_ot_loss"])):
        scalars[f"s{i}_d_loss"] = aux["stage_l1_loss"][i]
        scalars[f"s{i}_c_loss"] = aux["stage_ot_loss"][i]
        scalars[f"s{i}_range_err_ratio"] = aux["range_err_ratio"][i]
    for k, v in aux.items():  # blend_loss extras: epe / err1 / err3
        if not isinstance(v, list):
            scalars[k] = v
    scalars.update(
        depth_metrics(
            outputs["depth"],
            depth_gt_ms[final_stage],
            mask_ms[final_stage] > 0.5,
        )
    )
    images = {
        "depth_est": outputs["depth"] * mask_ms[final_stage],
        "depth_est_nomask": outputs["depth"],
        "depth_gt": depth_gt_ms["stage1"],
        "ref_img": imgs[:, 0],
        "mask": mask_ms["stage1"],
        "errormap": jnp.abs(outputs["depth"] - depth_gt_ms[final_stage])
        * mask_ms[final_stage],
    }
    return scalars, images


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = mvs4net_loss,
    loss_kwargs: dict | None = None,
    mesh=None,
    donate: bool = True,
    jit: bool = True,
    grad_accum: int = 1,
):
    """Build the jitted sharded train step.

    Returns step(state, batch) -> (state, scalars) where batch is the numpy
    batch dict from MVSLoader (imgs (B,V,H,W,3), proj_matrices, depth,
    mask, depth_values).  jit=False returns the raw traceable step (for
    embedding in a larger jitted program, e.g. bench.py's chained-latency
    loop).

    grad_accum > 1 splits the batch into that many microbatches, runs them
    through a lax.scan that accumulates gradients at the INITIAL params,
    then applies one optimizer update on the mean gradient — exactly
    mean-of-microbatch-gradients + one update (tests compare against a
    hand-rolled loop at tight tolerance), with the compiled program (and
    peak activation memory) of a single microbatch.  Vs the monolithic
    full-batch step the update agrees in exact arithmetic for duplicated
    samples but NOT bitwise in f32 (different batch shapes compile to
    different conv tilings; see tests/test_grad_accum.py docstring), and
    BatchNorm normalizes per microbatch — the standard, documented
    semantics of accumulation.  This is both a production memory lever
    the reference lacks (train_mvs4.py has batch-per-GPU only) and the
    route past this environment's XLA-compile-helper wall at batch >= 8
    (BENCHNOTES.md).  batch_stats thread sequentially through the scan
    (the same running-stat semantics as consecutive smaller steps);
    reported masked depth metrics are means of per-microbatch masked
    means.
    """
    loss_kwargs = dict(loss_kwargs or {})
    assert grad_accum >= 1

    def compute_loss(params, batch_stats, imgs, projs, depth_values,
                     depth_gt_ms, mask_ms):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, projs, depth_values, train=True,
            mutable=["batch_stats"],
        )
        loss, aux = loss_fn(
            outputs, depth_gt_ms, mask_ms,
            depth_values=depth_values, **loss_kwargs,
        )
        return loss, (aux, mutated["batch_stats"], outputs)

    def apply_update(state, grads, new_stats):
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )

    def step(state: TrainState, batch):
        (loss, (aux, new_stats, outputs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params, state.batch_stats, batch["imgs"],
          batch["proj_matrices"], batch["depth_values"], batch["depth"],
          batch["mask"])
        new_state = apply_update(state, grads, new_stats)
        scalars, images = _collect_scalars_images(
            loss, aux, outputs, batch["imgs"], batch["depth"], batch["mask"]
        )
        return new_state, scalars, images

    def step_accum(state: TrainState, batch):
        a = grad_accum

        def split(x):
            assert x.shape[0] % a == 0, (x.shape, a)
            return x.reshape((a, x.shape[0] // a) + x.shape[1:])

        micro = jax.tree_util.tree_map(split, dict(batch))

        def body(carry, mb):
            stats, gacc = carry
            (loss, (aux, new_stats, outputs)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params, stats, mb["imgs"], mb["proj_matrices"],
              mb["depth_values"], mb["depth"], mb["mask"])
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            scalars, images = _collect_scalars_images(
                loss, aux, outputs, mb["imgs"], mb["depth"], mb["mask"]
            )
            return (new_stats, gacc), (scalars, images)

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_stats, gacc), (scalars_st, images_st) = jax.lax.scan(
            body, (state.batch_stats, zeros), micro
        )
        grads = jax.tree_util.tree_map(lambda g: g / a, gacc)
        new_state = apply_update(state, grads, new_stats)
        scalars = jax.tree_util.tree_map(
            lambda s: jnp.mean(s, axis=0), scalars_st
        )
        images = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), images_st
        )
        return new_state, scalars, images

    if grad_accum > 1:
        step = step_accum

    if not jit:
        return step
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    # in_shardings: state replicated, batch sharded on leading axis
    compiled = jax.jit(
        step,
        in_shardings=(replicated, sharded),
        out_shardings=(replicated, replicated, sharded),
        donate_argnums=(0,) if donate else (),
    )
    return compiled


def make_eval_step(model, loss_fn: Callable = mvs4net_loss,
                   loss_kwargs: dict | None = None, mesh=None):
    """No-grad eval step returning the same scalar dict (reference
    test_sample_depth, train_mvs4.py:252-307; mono disabled in eval)."""
    loss_kwargs = dict(loss_kwargs or {})
    loss_kwargs["mono"] = False

    def step(params, batch_stats, batch):
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["imgs"], batch["proj_matrices"], batch["depth_values"],
            train=False,
        )
        loss, aux = loss_fn(
            outputs, batch["depth"], batch["mask"],
            depth_values=batch["depth_values"], **loss_kwargs,
        )
        final_stage = f"stage{len(aux['stage_ot_loss'])}"
        scalars = {"loss": loss}
        for i in range(len(aux["stage_ot_loss"])):
            scalars[f"s{i}_d_loss"] = aux["stage_l1_loss"][i]
            scalars[f"s{i}_c_loss"] = aux["stage_ot_loss"][i]
            scalars[f"s{i}_range_err_ratio"] = aux["range_err_ratio"][i]
        for k, v in aux.items():
            if not isinstance(v, list):
                scalars[k] = v
        scalars.update(
            depth_metrics(
                outputs["depth"],
                batch["depth"][final_stage],
                batch["mask"][final_stage] > 0.5,
            )
        )
        return scalars

    if mesh is None:
        return jax.jit(step)
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, sharded),
        out_shardings=replicated,
    )
