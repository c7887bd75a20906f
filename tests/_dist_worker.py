"""Worker for tests/test_multiprocess.py: one rank of a 2-process CPU job.

Runs the REAL multi-host code path (dist.mesh.maybe_initialize_distributed
reading the JAX_* env rendezvous, global mesh over all processes' devices,
sharded loader shards, the production train step) and prints per-step
metrics for the parent test to compare across ranks.
"""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import jax

# force the CPU platform + 2 local devices per process BEFORE any backend
# init (the axon PJRT plugin ignores env overrides; see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402
import optax  # noqa: E402

from mvster_tpu.dist.mesh import make_data_mesh, maybe_initialize_distributed  # noqa: E402
from mvster_tpu.dist.train_step import create_train_state, make_train_step  # noqa: E402
from mvster_tpu.models import MVS4Net, MVS4NetConfig  # noqa: E402


def main():
    process_index, process_count = maybe_initialize_distributed()
    assert process_count == 2, f"expected 2 processes, got {process_count}"
    devices = jax.devices()
    assert len(devices) == 4, f"expected 4 global devices, got {len(devices)}"

    sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))
    from helpers import synthetic_sample

    mesh = make_data_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    cfg = MVS4NetConfig(
        group_cor=True, group_cor_dim=(4, 4, 4, 4), inverse_depth=True,
        fpn_base_channel=4, reg_channel=4,
    )
    model = MVS4Net(cfg)

    # the same seeded GLOBAL batch on every process; each process feeds only
    # its addressable shards (the loader-shard contract: disjoint sample
    # ranges per process, num_shards/shard_index in MVSLoader)
    s = synthetic_sample(0, batch=4, nviews=2, h=64, w=64, with_gt=True)

    def globalize(tree, sharding):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_callback(
                np.asarray(x).shape, sharding,
                lambda idx, arr=np.asarray(x): arr[idx],
            ),
            tree,
        )

    batch = globalize(
        {
            "imgs": s["imgs"],
            "proj_matrices": s["proj_matrices"],
            "depth_values": s["depth_values"],
            "depth": s["depth"],
            "mask": s["mask"],
        },
        sharded,
    )

    variables = model.init(
        jax.random.PRNGKey(0),
        np.asarray(s["imgs"][:1]),
        {k: np.asarray(v[:1]) for k, v in s["proj_matrices"].items()},
        np.asarray(s["depth_values"][:1]),
        train=True,
    )
    state = create_train_state(variables, optax.sgd(1e-3))
    state = globalize(jax.device_get(state), replicated)

    step = make_train_step(
        model, optax.sgd(1e-3), loss_kwargs=dict(inverse_depth=True, ot_iter=2),
        mesh=mesh, donate=False,
    )
    for i in range(2):
        state, scalars, _ = step(state, batch)
        loss = float(scalars["loss"])
        err = float(scalars["abs_depth_error"])
        print(f"RESULT rank={process_index} step={i} "
              f"loss={loss:.6f} abs_err={err:.6f}", flush=True)
    print(f"DONE rank={process_index}", flush=True)


if __name__ == "__main__":
    main()
