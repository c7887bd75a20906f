"""Polyphase vs input-dilated transposed-conv parity.

The reg2d up-path deconvs (reference mvs4net_utils.py:870-923, torch
ConvTranspose3d(k=(1,3,3), stride=(1,2,2), padding=1, output_padding=1))
route onto deconv_polyphase_2x2 at large spatial sizes (measured table in
nn/blocks.py).  Both formulations must agree to float tolerance on the
SAME flipped-DHWIO kernel, and the module must produce identical trees
whichever branch the routing picks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvster_tpu.nn import blocks
from mvster_tpu.nn.blocks import (
    ConvTransposeBnReLU3d,
    deconv_dilated,
    deconv_polyphase_2x2,
)


@pytest.mark.parametrize("shape", [(1, 4, 12, 16, 6), (2, 3, 9, 11, 4)])
def test_polyphase_matches_dilated(shape):
    rng = np.random.default_rng(0)
    b, d, h, w, ci = shape
    co = 3
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 3, 3, ci, co)), jnp.float32)
    ref = deconv_dilated(x, k, (1, 3, 3), (1, 2, 2))
    out = deconv_polyphase_2x2(x, k)
    assert out.shape == ref.shape == (b, d, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_module_routing_parity(monkeypatch):
    """Force the routing threshold both ways; module outputs must match."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 10, 4)), jnp.float32)
    mod = ConvTransposeBnReLU3d(3, stride=(1, 2, 2), kernel_size=(1, 3, 3))
    params = mod.init(jax.random.PRNGKey(0), x)

    monkeypatch.setattr(blocks, "_POLYPHASE_MIN_PIXELS", 1)
    poly = mod.apply(params, x)
    monkeypatch.setattr(blocks, "_POLYPHASE_MIN_PIXELS", 1 << 30)
    dil = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(poly), np.asarray(dil), atol=1e-5)


def test_polyphase_grad_matches():
    """Train path: gradients through both formulations agree."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 2, 6, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 3, 3, 4, 3)), jnp.float32)

    g_dil = jax.grad(lambda k_: jnp.sum(jnp.sin(
        deconv_dilated(x, k_, (1, 3, 3), (1, 2, 2)))))(k)
    g_poly = jax.grad(lambda k_: jnp.sum(jnp.sin(
        deconv_polyphase_2x2(x, k_))))(k)
    np.testing.assert_allclose(np.asarray(g_poly), np.asarray(g_dil),
                               atol=1e-4)
