"""sg_cuts measurement hook (MVS4NetConfig.sg_cuts): stop-gradient cuts at
subsystem boundaries for the backward-decomposition probe
(scripts/probe_train_bwd.py).  Contract: forward numerics identical; params
upstream of a cut receive exactly zero gradient (so XLA DCEs their backward
— the latency delta IS that subsystem's backward cost)."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import synthetic_sample

from mvster_tpu.models import MVS4Net, MVS4NetConfig
from mvster_tpu.models.losses import mvs4net_loss


def _setup(cuts):
    model = MVS4Net(MVS4NetConfig.dtu_default(mono=True, sg_cuts=cuts))
    s = synthetic_sample(0, batch=1, nviews=2, h=64, w=64, with_gt=True)
    batch = {
        "imgs": jnp.asarray(s["imgs"]),
        "proj_matrices": {k: jnp.asarray(p)
                          for k, p in s["proj_matrices"].items()},
        "depth_values": jnp.asarray(s["depth_values"]),
        "depth": {k: jnp.asarray(x) for k, x in s["depth"].items()},
        "mask": {k: jnp.asarray(x) for k, x in s["mask"].items()},
    }
    return model, batch


def _grads(model, batch, variables):
    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["imgs"], batch["proj_matrices"], batch["depth_values"],
            train=True, mutable=["batch_stats"],
        )
        # Nonzero l1 weight (vs the published pure-OT (0, 1) default) so the
        # mono L1 term is a REAL gradient contributor — the bypass
        # assertions below (mono reaches the backbone past the logits cut)
        # are vacuous under a 0.0 weight.
        loss, _ = mvs4net_loss(
            out, batch["depth"], batch["mask"],
            depth_values=batch["depth_values"],
            inverse_depth=True, ot_iter=2, mono=True, l1ot_lw=(0.5, 1.0),
        )
        return loss

    return jax.grad(loss_fn)(variables["params"])


def test_fpn_cut_zeroes_backbone_grads_only():
    model, batch = _setup(("fpn",))
    base, _ = _setup(())
    variables = base.init(jax.random.PRNGKey(0), batch["imgs"],
                          batch["proj_matrices"], batch["depth_values"],
                          train=True)
    # identical param tree and forward output
    v_cut = model.init(jax.random.PRNGKey(0), batch["imgs"],
                       batch["proj_matrices"], batch["depth_values"],
                       train=True)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(v_cut),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    out_a = base.apply(variables, batch["imgs"], batch["proj_matrices"],
                       batch["depth_values"], train=False)
    out_b = model.apply(variables, batch["imgs"], batch["proj_matrices"],
                        batch["depth_values"], train=False)
    np.testing.assert_array_equal(np.asarray(out_a["depth"]),
                                  np.asarray(out_b["depth"]))

    g_cut = _grads(model, batch, variables)
    g_full = _grads(base, batch, variables)
    feat_norm = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(g_cut["feature"])
    )
    assert feat_norm == 0.0, "fpn cut must zero all backbone grads"
    # downstream (reg) grads still flow
    reg_norm = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(g_cut["reg_0"])
    )
    assert reg_norm > 0.0
    # and the uncut model does reach the backbone
    full_norm = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(g_full["feature"])
    )
    assert full_norm > 0.0


def test_warp_cut_removes_scatter_path_only():
    """The "warp" cut stops gradient at the warped SOURCE features inside
    the per-view loop: the scatter backward is DCE'd, but the backbone
    still receives gradient through the reference feature (correlate) and
    the mono decoder — so it must change backbone grads without zeroing
    them, and leave the forward bitwise identical."""
    model, batch = _setup(("warp",))
    base, _ = _setup(())
    variables = base.init(jax.random.PRNGKey(0), batch["imgs"],
                          batch["proj_matrices"], batch["depth_values"],
                          train=True)
    out_a = base.apply(variables, batch["imgs"], batch["proj_matrices"],
                       batch["depth_values"], train=False)
    out_b = model.apply(variables, batch["imgs"], batch["proj_matrices"],
                        batch["depth_values"], train=False)
    np.testing.assert_array_equal(np.asarray(out_a["depth"]),
                                  np.asarray(out_b["depth"]))

    g_cut = _grads(model, batch, variables)
    g_full = _grads(base, batch, variables)
    n_cut = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g_cut["feature"]))
    n_full = sum(float(jnp.sum(jnp.abs(x)))
                 for x in jax.tree_util.tree_leaves(g_full["feature"]))
    assert n_cut > 0.0, "ref/mono paths must still reach the backbone"
    assert not np.isclose(n_cut, n_full), (
        "warp cut must remove the source-feature (scatter) contribution"
    )


def test_logits_cut_zeroes_reg_grads():
    model, batch = _setup(("logits",))
    variables = model.init(jax.random.PRNGKey(0), batch["imgs"],
                           batch["proj_matrices"], batch["depth_values"],
                           train=True)
    g = _grads(model, batch, variables)
    for name in ("reg_0", "reg_1", "reg_2", "reg_3"):
        n = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g[name]))
        assert n == 0.0, f"{name} grads must be zero past the logits cut"
    # the mono path bypasses the cut: backbone still gets gradient
    n_feat = sum(float(jnp.sum(jnp.abs(x)))
                 for x in jax.tree_util.tree_leaves(g["feature"]))
    assert n_feat > 0.0
