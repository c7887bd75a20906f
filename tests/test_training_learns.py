"""Training LEARNS, not just runs (round-1 verdict gap #2).

A short optimization run on textured-plane scenes must drive the final-stage
masked absolute depth error down by a large factor — on a single device AND
on the 8-device data mesh, with the published loss ingredients (Sinkhorn OT
supervision, mono branch, inverse depth, group correlation).  One-step loss
parity and smoke finiteness cannot catch a broken VJP (e.g. through the cost
volume or the remat'd Sinkhorn reverse sweep); a flat error curve here can.

Matches the reference's demonstrated capability: train_mvs4.py:83-176 trains
10 epochs to the published DTU metrics.  plane_scene_sample gives decisive
cost-volume peaks (see tests/helpers.py), so the cascade can localize the
plane as soon as the attention/regularization weights learn to sharpen.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.helpers import plane_scene_sample
from mvster_tpu.dist.mesh import make_data_mesh
from mvster_tpu.dist.train_step import create_train_state, make_train_step
from mvster_tpu.models import MVS4Net, MVS4NetConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = MVS4NetConfig(
    group_cor=True, group_cor_dim=(4, 4, 4, 4), inverse_depth=True,
    fpn_base_channel=4, reg_channel=4, attn_temp=2.0, mono=True,
)
H = W = 64


def _plane_batch(n):
    """n textured planes at distinct depths spanning the hypothesis range."""
    parts = []
    for i in range(n):
        z = 500.0 + 350.0 * i / max(n - 1, 1)  # within [425, 935]
        s = plane_scene_sample(seed=100 + i, h=H, w=W, z=z)
        gt = {
            f"stage{k}": np.full((1, H // sc, W // sc), z, np.float32)
            for k, sc in zip(range(1, 5), [8, 4, 2, 1])
        }
        mask = {
            f"stage{k}": np.ones((1, H // sc, W // sc), np.float32)
            for k, sc in zip(range(1, 5), [8, 4, 2, 1])
        }
        parts.append((s, gt, mask))
    cat = lambda xs: jnp.asarray(np.concatenate(xs, axis=0))
    return {
        "imgs": cat([s["imgs"] for s, _, _ in parts]),
        "proj_matrices": {
            k: cat([s["proj_matrices"][k] for s, _, _ in parts])
            for k in parts[0][0]["proj_matrices"]
        },
        "depth_values": cat([s["depth_values"] for s, _, _ in parts]),
        "depth": {
            k: cat([g[k] for _, g, _ in parts]) for k in parts[0][1]
        },
        "mask": {
            k: cat([m[k] for _, _, m in parts]) for k in parts[0][2]
        },
    }


def _train(batch_n, steps, mesh=None, lr=1e-3, cfg=CFG):
    batch = _plane_batch(batch_n)
    model = MVS4Net(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=True,
    )
    tx = optax.adam(lr, b1=0.9, b2=0.999)
    state = create_train_state(variables, tx)
    # published loss config: pure OT (l1ot_lw default), ot_iter 10, mono on
    step = make_train_step(
        model, tx, loss_kwargs=dict(inverse_depth=True, ot_iter=10, mono=True),
        mesh=mesh, donate=False,
    )
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
        batch = jax.device_put(batch, NamedSharding(mesh, P("data")))
    errs, losses = [], []
    for _ in range(steps):
        state, scalars, _ = step(state, batch)
        errs.append(float(scalars["abs_depth_error"]))
        losses.append(float(scalars["loss"]))
    return np.array(errs), np.array(losses)


def _assert_learned(errs, losses):
    assert np.isfinite(losses).all(), "loss diverged"
    start = errs[:3].mean()
    end = errs[-3:].mean()
    # random-init argmax error is tens of mm; a working gradient path drives
    # the plane localization to a few mm.  5x is far above run-to-run noise
    # while a dead VJP (flat curve) fails by a wide margin.
    assert end < start / 5, f"abs depth error did not drop: {start:.2f} -> {end:.2f}"
    # loss must also trend down (OT + mono both contribute)
    assert losses[-3:].mean() < 0.7 * losses[:3].mean(), (
        f"loss did not decrease: {losses[:3].mean():.4f} -> {losses[-3:].mean():.4f}"
    )


def test_training_learns_single_device():
    errs, losses = _train(batch_n=2, steps=60)
    _assert_learned(errs, losses)


def test_training_learns_8dev_mesh():
    errs, losses = _train(batch_n=8, steps=60, mesh=make_data_mesh(8))
    _assert_learned(errs, losses)


def test_training_learns_bf16():
    """bf16 conv compute (f32 master params, norms, geometry, losses) must
    still learn — guards the mixed-precision train step (VERDICT r2 #5).
    Features are upcast to f32 at the cost-volume boundary so the Pallas
    warp-fwd/scatter-bwd pair stays active (models/mvs4net.py:_stage)."""
    import dataclasses

    cfg16 = dataclasses.replace(CFG, compute_dtype="bfloat16")
    errs, losses = _train(batch_n=2, steps=60, cfg=cfg16)
    _assert_learned(errs, losses)
