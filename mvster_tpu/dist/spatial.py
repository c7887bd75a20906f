"""Spatial (H-axis) sharding: the sequence-parallel analog for MVS.

SURVEY.md section 5.7 identifies the workload's "sequence" axes as spatial
resolution / depth hypotheses / views.  The reference has no such scaling
axis; here the image-height axis shards across a second mesh dimension and
GSPMD inserts conv halo exchanges and warp-gather collectives automatically —
the idiomatic TPU route to resolutions whose activation footprint outgrows
one chip's HBM (e.g. >4K plane-sweep inference).

Verified in tests/test_multichip.py: a (data=2, spatial=4) mesh produces
depth maps matching single-device execution to float tolerance.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(data: int, spatial: int, devices=None) -> Mesh:
    """(data x spatial) mesh; batch shards on "data", image H on "spatial"."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(devices, ("data", "spatial"))


def make_spatial_infer_step(model, mesh: Mesh):
    """Jitted forward with imgs sharded (batch, -, H, -, -) over the mesh.

    Returns step(variables, imgs, proj_matrices, depth_values) ->
    (depth, confidence), both sharded P("data", "spatial") on (B, H, W).
    """
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    img_shard = NamedSharding(mesh, P("data", None, "spatial"))
    out_shard = NamedSharding(mesh, P("data", "spatial"))

    def fwd(variables, imgs, proj_matrices, depth_values):
        out = model.apply(variables, imgs, proj_matrices, depth_values,
                          train=False)
        return out["depth"], out["photometric_confidence"]

    def in_shardings(proj_matrices):
        return (
            rep, img_shard,
            jax.tree_util.tree_map(lambda _: dp, proj_matrices), dp,
        )

    # jit wrappers are cached per proj-matrix tree structure: constructing a
    # fresh jax.jit every call would pay retrace/cache-lookup overhead on the
    # hot inference path (round-1 review finding).
    compiled_cache: dict = {}

    def step(variables, imgs, proj_matrices, depth_values):
        key = tuple(sorted(proj_matrices))
        compiled = compiled_cache.get(key)
        if compiled is None:
            compiled = jax.jit(
                fwd,
                in_shardings=in_shardings(proj_matrices),
                out_shardings=(out_shard, out_shard),
            )
            compiled_cache[key] = compiled
        return compiled(
            jax.device_put(variables, rep),
            jax.device_put(imgs, img_shard),
            jax.device_put(proj_matrices, jax.tree_util.tree_map(
                lambda _: dp, proj_matrices)),
            jax.device_put(depth_values, dp),
        )

    return step


def make_spatial_train_step(model, optimizer, mesh: Mesh,
                            loss_kwargs: dict | None = None):
    """Full train step over a (data x spatial) mesh: batch on "data", image
    height on "spatial".  Params/optimizer state are replicated; GSPMD
    inserts conv halo exchanges for the H-sharded activations and the
    gradient psum over both mesh axes — the activation-memory scaling
    regime for training at resolutions that outgrow one chip's HBM.

    Returns step(state, batch) -> (state, scalars, images); callers
    device_put the operands (see __graft_entry__.dryrun_multichip).
    """
    from mvster_tpu.dist.train_step import make_train_step

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    img_shard = NamedSharding(mesh, P("data", None, "spatial"))  # (B,V,H,W,3)
    map_shard = NamedSharding(mesh, P("data", "spatial"))        # (B,H,W[,C])

    raw = make_train_step(model, optimizer, loss_kwargs=loss_kwargs, jit=False)
    batch_shardings = {
        "imgs": img_shard,
        "proj_matrices": dp,
        "depth_values": dp,
        "depth": map_shard,
        "mask": map_shard,
    }
    step = jax.jit(
        raw,
        in_shardings=(rep, batch_shardings),
        out_shardings=(rep, rep, map_shard),
    )
    return step, batch_shardings, rep
