"""Pallas warp-backward (scatter) kernel vs the XLA VJP (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mvster_tpu.core.sampling import grid_sample_zeros


def _coords(D, H, W, slope=0.06):
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = np.stack([gx * 1.03 + 2.0 * k - 3 for k in range(D)])[None]
    y = np.stack(
        [gy * 0.96 + 0.7 * k + gx * slope - 2 for k in range(D)]
    )[None]
    return jnp.asarray(x.astype(np.float32)), jnp.asarray(y.astype(np.float32))


@pytest.mark.parametrize("C", [3, 8, 32])
def test_scatter_matches_xla_vjp(C):
    # C=3/8 (cp=8, b2=16) route the band-matmul branch; C=32 routes the
    # scnt-bounded per-source-row scan (b2*cp = 512 > _BAND_MM_ROWS)
    from mvster_tpu.kernels.pallas_scatter import scatter_grad_pallas

    rng = np.random.default_rng(0)
    B, D, H, W = 1, 4, 64, 64
    cot = jnp.asarray(rng.normal(size=(B, D, H, W, C)).astype(np.float32))
    x, y = _coords(D, H, W)

    _, vjp = jax.vjp(
        lambda s: grid_sample_zeros(s, x, y),
        jnp.zeros((B, H, W, C), jnp.float32),
    )
    ref = np.asarray(vjp(cot)[0])
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(scatter_grad_pallas(cot, x, y, (B, H, W, C)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_band_chunk_slow_path_matches_xla():
    """Chunks whose rows' window bases spread more than (nko-nk) blocks
    take the per-row fallback; craft coords whose x jumps ~3 lane-blocks
    every 4 output rows so every chunk trips it (W=640: nk=3, nko=4,
    xb spreads 128 -> 512 within a chunk, > (nko-nk)*LANE)."""
    from mvster_tpu.kernels.pallas_scatter import scatter_grad_pallas

    from mvster_tpu.core.sampling import grid_sample_zeros

    rng = np.random.default_rng(3)
    B, D, H, W, C = 1, 2, 32, 640, 8
    cot = jnp.asarray(rng.normal(size=(B, D, H, W, C)).astype(np.float32))
    i = np.arange(H, dtype=np.float32)[None, None, :, None]
    jj = np.arange(W, dtype=np.float32)[None, None, None, :]
    x = np.broadcast_to(
        0.15 * jj + 20.0 + 400.0 * ((i // 4) % 2), (B, D, H, W)
    ).astype(np.float32)
    y = np.broadcast_to(i * 0.9 + 0.3, (B, D, H, W)).astype(np.float32)
    x, y = jnp.asarray(x), jnp.asarray(y)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(scatter_grad_pallas(cot, x, y, (B, H, W, C)))
    _, vjp = jax.vjp(
        lambda s: grid_sample_zeros(s, x, y), jnp.zeros((B, H, W, C)))
    ref = np.asarray(vjp(cot)[0])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_band_matmul_matches_legacy_scan():
    """The band-matmul branch (chunked: _OCHUNK output rows stacked along
    the contraction axis) computes the identical per-element tap sum as
    the scnt-bounded scan it folds into the MXU."""
    from mvster_tpu.kernels import pallas_scatter as ps

    rng = np.random.default_rng(2)
    B, D, H, W, C = 1, 4, 64, 64, 8
    cot = jnp.asarray(rng.normal(size=(B, D, H, W, C)).astype(np.float32))
    x, y = _coords(D, H, W, slope=0.11)

    orig = ps._BAND_MM_ROWS
    try:
        with pltpu.force_tpu_interpret_mode():
            band = np.asarray(
                ps.scatter_grad_pallas(cot, x, y, (B, H, W, C)))
            ps._BAND_MM_ROWS = 0
            legacy = np.asarray(
                ps.scatter_grad_pallas(cot, x, y, (B, H, W, C)))
    finally:
        ps._BAND_MM_ROWS = orig
    np.testing.assert_allclose(band, legacy, rtol=1e-6, atol=1e-6)


def test_custom_vjp_grad_matches():
    """End-to-end: grad through grid_sample_zeros_vjp == grad through the
    plain XLA formulation (src grad; coords are stop-gradient by contract)."""
    from mvster_tpu.kernels.pallas_scatter import grid_sample_zeros_vjp

    rng = np.random.default_rng(1)
    B, D, H, W, C = 1, 2, 32, 64, 3
    src = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    x, y = _coords(D, H, W)

    def loss_ref(s):
        return jnp.sum(jnp.tanh(grid_sample_zeros(s, x, y)))

    def loss_new(s):
        return jnp.sum(jnp.tanh(grid_sample_zeros_vjp(s, x, y)))

    g_ref = np.asarray(jax.grad(loss_ref)(src))
    with pltpu.force_tpu_interpret_mode():
        g_new = np.asarray(jax.grad(loss_new)(src))
    np.testing.assert_allclose(g_new, g_ref, rtol=1e-5, atol=1e-5)
