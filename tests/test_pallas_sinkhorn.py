"""Pallas Sinkhorn kernel vs the pure-jax implementation (interpret mode).

Values AND gradients must match: the kernel's backward pass is a hand-derived
reverse sweep, validated against jax autodiff of core.sinkhorn.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvster_tpu.core.sinkhorn import sinkhorn

# Force interpret mode on CPU for all pallas_calls in this module
from jax.experimental.pallas import tpu as pltpu


def _inputs(seed, b=1, d=8, h=8, w=8):
    rng = np.random.default_rng(seed)
    hypo = np.sort(
        rng.uniform(400, 900, size=(b, d, h, w)).astype(np.float32), axis=1
    )
    gt = rng.uniform(420, 880, size=(b, h, w)).astype(np.float32)
    logits = rng.normal(size=(b, d, h, w)).astype(np.float32)
    attn = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    mask = rng.uniform(size=(b, h, w)) > 0.3
    return (
        jnp.asarray(gt), jnp.asarray(hypo),
        jnp.asarray(attn.astype(np.float32)), jnp.asarray(mask),
    )


@pytest.mark.parametrize("d", [4, 8])
def test_pallas_sinkhorn_matches_reference_impl(d):
    from mvster_tpu.kernels.pallas_sinkhorn import sinkhorn_loss_pallas

    gt, hypo, attn, mask = _inputs(0, d=d)
    ref_loss = sinkhorn(gt, hypo, attn, mask, iters=10, eps=1.0)[1]
    with pltpu.force_tpu_interpret_mode():
        our_loss = sinkhorn_loss_pallas(gt, hypo, attn, mask, iters=10, eps=1.0)
    np.testing.assert_allclose(float(our_loss), float(ref_loss), rtol=1e-5)


def test_ot_backend_pallas_matches_xla_through_loss():
    """The production dispatch: mvs4net_loss(ot_backend="pallas") must equal
    the default XLA backend in value AND attn gradients.  This is the path
    `--ot_backend pallas` (tools/cli.py) reaches; reference equivalent:
    ot_loss inside MVS4net_loss (/root/reference/models/mvs4net_utils.py:
    1096-1141)."""
    from tests.test_losses_schedules import _fake_outputs
    from mvster_tpu.models.losses import mvs4net_loss

    outputs, gt, mask = _fake_outputs(3, h=8, w=8)

    def total(attns, backend):
        outs = {
            k: dict(v, attn_weight=attns[k]) for k, v in outputs.items()
        }
        return mvs4net_loss(
            outs, gt, mask, ot_iter=6, ot_eps=1.0, ot_backend=backend
        )[0]

    attns = {k: jnp.asarray(v["attn_weight"]) for k, v in outputs.items()}
    l_x, g_x = jax.value_and_grad(lambda a: total(a, "xla"))(attns)
    with pltpu.force_tpu_interpret_mode():
        l_p, g_p = jax.value_and_grad(lambda a: total(a, "pallas"))(attns)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    for k in attns:
        np.testing.assert_allclose(
            np.asarray(g_p[k]), np.asarray(g_x[k]), rtol=2e-4, atol=5e-7
        )


def test_pallas_sinkhorn_gradient_matches_autodiff():
    from mvster_tpu.kernels.pallas_sinkhorn import sinkhorn_loss_pallas

    gt, hypo, attn, mask = _inputs(1, d=4, h=4, w=4)

    def ref_fn(a):
        return sinkhorn(gt, hypo, a, mask, iters=6, eps=1.0)[1]

    def our_fn(a):
        return sinkhorn_loss_pallas(gt, hypo, a, mask, iters=6, eps=1.0)

    ref_grad = jax.grad(ref_fn)(attn)
    with pltpu.force_tpu_interpret_mode():
        our_grad = jax.grad(our_fn)(attn)
    np.testing.assert_allclose(
        np.asarray(our_grad), np.asarray(ref_grad), rtol=2e-4, atol=1e-7
    )
