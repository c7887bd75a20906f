"""Device mesh + sharding helpers: the NCCL/DDP replacement.

The reference's distributed layer is ~80 lines of NCCL plumbing (process
groups, DistributedSampler, gradient hooks, explicit scalar reduces —
train_mvs4.py:321-326, 389-416, utils.py:161-201).  On TPU the same program
is expressed declaratively: one mesh over all chips, batch sharded on a
"data" axis, parameters replicated, and XLA inserts psum/all-gather
collectives over ICI during pjit compilation.  Multi-host slices run this
exact SPMD program per process (jax.distributed.initialize + per-process data
sharding via MVSLoader num_shards/shard_index).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def maybe_initialize_distributed():
    """Multi-host init (no-op single-process); reference: dist.init_process_group.

    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID mirror the
    reference's WORLD_SIZE / RANK env rendezvous (train_mvs4.py:321-326).
    They are passed explicitly because jax 0.9 has no generic env-var cluster
    plugin (auto-detection covers SLURM/k8s/MPI/TPU-pod only); on real TPU
    pods with megascale, the no-arg auto-detect path is used instead.
    Exercised for real by tests/test_multiprocess.py: two coordinator-
    connected CPU processes run the sharded train step in lockstep.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        num = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(num) if num is not None else None,
            process_id=int(pid) if pid is not None else None,
        )
    elif "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()
