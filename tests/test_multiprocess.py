"""Real multi-PROCESS SPMD: two coordinator-connected CPU processes.

Round-1 gap: section 5.8 claimed multi-host support via jax.distributed but
nothing ever ran two processes.  This launches 2 OS processes (2 CPU devices
each -> a 4-device global mesh), connected through the production rendezvous
path (dist.mesh.maybe_initialize_distributed reading JAX_COORDINATOR_ADDRESS
/ JAX_NUM_PROCESSES / JAX_PROCESS_ID, the analog of the reference's
WORLD_SIZE env:// NCCL init, train_mvs4.py:321-326), and runs two sharded
train steps.  Both ranks must complete and report identical metrics — the
replicated-scalars invariant DDP's all-reduce provides implicitly.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_spmd_train_steps_agree():
    port = _free_port()
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS",)  # workers pick their own device counts
    }
    procs = []
    for rank in range(2):
        env = dict(
            env_base,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outputs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=1200)
        outputs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    results = {}
    for rank, out in enumerate(outputs):
        found = re.findall(
            r"RESULT rank=(\d) step=(\d) loss=([\d.eE+-]+) abs_err=([\d.eE+-]+)",
            out,
        )
        assert len(found) == 2, f"rank {rank} printed {len(found)} results:\n{out[-4000:]}"
        for r, step, loss, err in found:
            results[(int(r), int(step))] = (float(loss), float(err))
        assert f"DONE rank={rank}" in out

    # replicated scalars must agree bit-for-bit-ish across ranks
    for step in (0, 1):
        l0, e0 = results[(0, step)]
        l1, e1 = results[(1, step)]
        assert abs(l0 - l1) <= 1e-5 * max(1.0, abs(l0)), (step, l0, l1)
        assert abs(e0 - e1) <= 1e-4 * max(1.0, abs(e0)), (step, e0, e1)
    # the second step must differ from the first (the optimizer moved)
    assert results[(0, 0)][0] != results[(0, 1)][0]
