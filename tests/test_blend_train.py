"""BlendedMVS fine-tune path: blend_loss through the sharded train step."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tests.helpers import synthetic_sample
from mvster_tpu.dist.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from mvster_tpu.models import MVS4Net, MVS4NetConfig
from mvster_tpu.models.losses import blend_loss


def test_blend_loss_train_step_runs():
    s = synthetic_sample(0, batch=2, nviews=2, h=64, w=64, with_gt=True)
    batch = {
        "imgs": jnp.asarray(s["imgs"]),
        "proj_matrices": {k: jnp.asarray(v) for k, v in s["proj_matrices"].items()},
        "depth_values": jnp.asarray(s["depth_values"]),
        "depth": {k: jnp.asarray(v) for k, v in s["depth"].items()},
        "mask": {k: jnp.asarray(v) for k, v in s["mask"].items()},
    }
    cfg = MVS4NetConfig(
        group_cor=True, group_cor_dim=(4, 4, 4, 4), inverse_depth=True,
        fpn_base_channel=4, reg_channel=4, mono=True,
    )
    model = MVS4Net(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=True,
    )
    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(
        model, tx, loss_fn=blend_loss,
        loss_kwargs=dict(inverse_depth=True, ot_iter=3, mono=True),
        donate=False,
    )
    new_state, scalars, _ = step(state, batch)
    assert np.isfinite(float(scalars["loss"]))

    eval_step = make_eval_step(
        model, loss_fn=blend_loss, loss_kwargs=dict(inverse_depth=True, ot_iter=3)
    )
    scalars = eval_step(new_state.params, new_state.batch_stats, batch)
    assert np.isfinite(float(scalars["loss"]))
