"""Sinkhorn OT loss parity vs the torch reference oracle + invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import reference_on_path
from mvster_tpu.core import sinkhorn

torch = pytest.importorskip("torch")

HAS_REF = reference_on_path()


def _random_inputs(seed, b=2, d=4, h=6, w=8):
    rng = np.random.default_rng(seed)
    hypo = np.sort(rng.uniform(400, 900, size=(b, d, h, w)).astype(np.float32), axis=1)
    gt = rng.uniform(420, 880, size=(b, h, w)).astype(np.float32)
    logits = rng.normal(size=(b, d, h, w)).astype(np.float32)
    attn = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    mask = rng.uniform(size=(b, h, w)) > 0.3
    return gt, hypo, attn.astype(np.float32), mask


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
@pytest.mark.parametrize("continuous", [False, True])
def test_sinkhorn_matches_reference(continuous):
    from models.mvs4net_utils import sinkhorn as ref_sinkhorn

    gt, hypo, attn, mask = _random_inputs(0)
    t_ref, loss_ref = ref_sinkhorn(
        torch.from_numpy(gt),
        torch.from_numpy(hypo),
        torch.from_numpy(attn),
        torch.from_numpy(mask),
        iters=10,
        eps=1,
        continuous=continuous,
    )
    t_ours, loss_ours = sinkhorn(
        jnp.asarray(gt),
        jnp.asarray(hypo),
        jnp.asarray(attn),
        jnp.asarray(mask),
        iters=10,
        eps=1,
        continuous=continuous,
    )
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=2e-4)
    b, d, h, w = attn.shape
    t_ref_np = t_ref.numpy().reshape(b, h * w, d, -1)
    np.testing.assert_allclose(np.asarray(t_ours), t_ref_np, rtol=2e-3, atol=1e-5)


def test_sinkhorn_marginals_approach_inputs():
    """After convergence the coupling's row marginals equal pred_dist."""
    gt, hypo, attn, mask = _random_inputs(1)
    t_map, _ = sinkhorn(
        jnp.asarray(gt), jnp.asarray(hypo), jnp.asarray(attn), jnp.asarray(mask),
        iters=50, eps=1, continuous=False,
    )
    b, d, h, w = attn.shape
    rows = np.asarray(t_map).sum(axis=3)  # (B, HW, D): should equal pred_dist
    pred = attn.transpose(0, 2, 3, 1).reshape(b, h * w, d)
    np.testing.assert_allclose(rows, pred, atol=1e-3)


def test_sinkhorn_zero_loss_when_prediction_is_gt():
    """Perfectly concentrated prediction on the GT bin -> near-zero OT loss."""
    b, d, h, w = 1, 4, 4, 4
    hypo = np.broadcast_to(
        np.linspace(400, 700, d, dtype=np.float32)[None, :, None, None], (b, d, h, w)
    ).copy()
    gt = np.full((b, h, w), 500.0, np.float32)  # exactly bin 1
    attn = np.full((b, d, h, w), 1e-6, np.float32)
    attn[:, 1] = 1.0 - 3e-6
    mask = np.ones((b, h, w), bool)
    _, loss = sinkhorn(
        jnp.asarray(gt), jnp.asarray(hypo), jnp.asarray(attn), jnp.asarray(mask),
        iters=30, eps=1, continuous=False,
    )
    assert float(loss) < 0.05
