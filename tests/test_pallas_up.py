"""Pallas W-axis 2x upsample kernel vs the dense einsum resize (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mvster_tpu.core.sampling import (
    _interp_matrix,
    resize_bilinear_align_corners,
)
from mvster_tpu.kernels.pallas_up import up2w_pallas, up2w_supported


def _ref_up2w(x):
    """Dense align-corners interpolation matrix along W (the pre-stencil
    einsum formulation — the numerical reference for the resize family)."""
    w = x.shape[-2]
    mat = _interp_matrix(x.dtype, w, 2 * w)
    return jnp.einsum("bhwc,Ww->bhWc", x, mat,
                      precision=jax.lax.Precision.HIGHEST)


@pytest.mark.parametrize(
    "shape",
    [
        (1, 8, 8, 32),      # smallest supported width for C=32 (cb=8)
        (2, 16, 20, 64),    # odd block count, clamped halos both sides
        (1, 9, 12, 64),     # rows not divisible by the row block (pad path)
        (5, 16, 64, 32),    # multi-batch fold
        (1, 8, 4, 128),     # C=128: one column per input block
    ],
)
def test_up2w_matches_einsum(shape):
    x = jnp.asarray(
        np.random.RandomState(sum(shape)).randn(*shape), jnp.float32
    )
    with pltpu.force_tpu_interpret_mode():
        assert up2w_supported(x)
        got = up2w_pallas(x)
    want = _ref_up2w(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_up2w_guard_rejects_unsupported():
    assert not up2w_supported(jnp.zeros((1, 8, 8, 8), jnp.float32))   # C=8
    assert not up2w_supported(jnp.zeros((1, 8, 8, 64), jnp.bfloat16))
    assert not up2w_supported(jnp.zeros((1, 8, 3, 64), jnp.float32))  # w*C%IB
    assert not up2w_supported(jnp.zeros((8, 8, 64), jnp.float32))     # ndim


def test_resize2x_routes_kernel_and_matches_matrix_path():
    """The full 2D 2x resize through the kernel (W) + stencil (H) matches
    the dense two-matrix einsum within f32 associativity."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 16, 64),
                    jnp.float32)
    mh = _interp_matrix(jnp.float32, 12, 24)
    mw = _interp_matrix(jnp.float32, 16, 32)
    want = jnp.einsum("bhwc,Hh,Ww->bHWc", x, mh, mw,
                      precision=jax.lax.Precision.HIGHEST)
    with pltpu.force_tpu_interpret_mode():
        got = resize_bilinear_align_corners(x, 24, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_resize2x_5d_lead_dims():
    """resize_bilinear_align_corners folds leading dims for the kernel."""
    x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 8, 8, 32),
                    jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = resize_bilinear_align_corners(x, 16, 16)
    want = jnp.stack(
        [_ref_up2w_2d(x[i]) for i in range(2)]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _ref_up2w_2d(x):
    h, w = x.shape[-3], x.shape[-2]
    mh = _interp_matrix(x.dtype, h, 2 * h)
    mw = _interp_matrix(x.dtype, w, 2 * w)
    return jnp.einsum("bhwc,Hh,Ww->bHWc", x, mh, mw,
                      precision=jax.lax.Precision.HIGHEST)
