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
