"""Folded-depth reg2d: tree identity + numerics vs the standard branch.

The folded formulation (nn/reg.py) runs the whole reg2d U-Net with the
depth-hypothesis axis folded into the conv lane dimension.  It must be a
drop-in for checkpoints: identical variable trees (paths, shapes, AND init
values — the param RNG folds over the path) and float-tolerance-identical
eval outputs.  Reference semantics: reg2d at
/root/reference/models/mvs4net_utils.py:870-907.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvster_tpu.nn.reg import Reg2d, fold_kernel_band, fold_kernel_diag, fold_volume


def _vol(rng, b=1, d=4, h=16, w=24, c=4):
    return jnp.asarray(rng.normal(size=(b, d, h, w, c)), jnp.float32)


def test_fold_kernel_diag_matches_per_depth():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(1, 3, 3, 4, 6)), jnp.float32)
    x = _vol(rng, d=3, c=4)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = jax.lax.conv_general_dilated(
        fold_volume(x), fold_kernel_diag(k, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(fold_volume(ref)), atol=1e-5
    )


def test_fold_kernel_band_matches_depth_conv():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 5)), jnp.float32)
    x = _vol(rng, d=4, c=4)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = jax.lax.conv_general_dilated(
        fold_volume(x), fold_kernel_band(k, 4), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(fold_volume(ref)), atol=1e-4
    )


def test_init_trees_identical():
    """Init under fold=True must equal init under fold=False bit-for-bit."""
    rng = np.random.default_rng(2)
    x = _vol(rng)
    va = Reg2d(base_channels=4, fold=False).init(
        jax.random.PRNGKey(7), x, False
    )
    vb = Reg2d(base_channels=4, fold=True).init(
        jax.random.PRNGKey(7), x, False
    )
    fa = jax.tree_util.tree_flatten_with_path(va)
    fb = jax.tree_util.tree_flatten_with_path(vb)
    assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
    for (pa, la), (_, lb) in zip(fa[0], fb[0]):
        assert la.shape == lb.shape, pa
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=str(pa))


@pytest.mark.parametrize("d,c", [(4, 4), (8, 8)])
def test_folded_eval_matches_standard(d, c):
    rng = np.random.default_rng(3)
    x = _vol(rng, d=d, c=c)
    variables = Reg2d(fold=False).init(jax.random.PRNGKey(0), x, False)
    # perturb batch_stats away from init so the BN affine is non-trivial
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.default_rng(4).normal(size=v.shape).astype(v.dtype)
        if v.ndim == 1 else v,
        variables,
    )
    ref = Reg2d(fold=False).apply(variables, x, False)
    out = Reg2d(fold=True).apply(variables, x, False)
    assert out.shape == ref.shape == x.shape[:4]
    assert out.dtype == ref.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fold_train_and_variant_route_standard():
    """fold=True must not change training (mutable BN) or agg variants."""
    rng = np.random.default_rng(5)
    x = _vol(rng)
    for kwargs in ({}, {"agg_type": "ConvBnReLU3D_CAM"}):
        m0 = Reg2d(base_channels=4, fold=False, **kwargs)
        m1 = Reg2d(base_channels=4, fold=True, **kwargs)
        v = m0.init(jax.random.PRNGKey(1), x, True)
        r0, s0 = m0.apply(v, x, True, mutable=["batch_stats"])
        r1, s1 = m1.apply(v, x, True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            s0, s1,
        )


def test_folded_bf16_close():
    """bf16 compute dtype routes through the folded branch too."""
    rng = np.random.default_rng(6)
    x = _vol(rng)
    v = Reg2d(dtype=jnp.bfloat16, fold=False).init(jax.random.PRNGKey(2), x, False)
    ref = Reg2d(dtype=jnp.bfloat16, fold=False).apply(v, x, False)
    out = Reg2d(dtype=jnp.bfloat16, fold=True).apply(v, x, False)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05, rtol=0.05)


def test_full_model_fold_routing_parity():
    """MVS4Net eval forward with reg2d_fold on vs off: same variables, same
    depths to f32 tolerance — covers the routed path production executes.

    Textured-plane scene (decisive cost peaks) + cascade-tie handling as in
    test_model_parity.assert_stage_close: argmax at flat-cost pixels is
    float noise, and a tie-flip legitimately diverges the cascade there, so
    stages compare only where the hypothesis windows agree.
    """
    import dataclasses

    from helpers import plane_scene_sample

    from mvster_tpu.models import MVS4Net, MVS4NetConfig

    s = plane_scene_sample(11, h=64, w=64)
    imgs = jnp.asarray(s["imgs"])
    projs = {k: jnp.asarray(p) for k, p in s["proj_matrices"].items()}
    dvals = jnp.asarray(s["depth_values"])

    cfg0 = MVS4NetConfig.dtu_default(mono=False, warp_impl="xla",
                                     reg2d_fold=False)
    m0 = MVS4Net(cfg0)
    m1 = MVS4Net(dataclasses.replace(cfg0, reg2d_fold=True))
    v = m0.init(jax.random.PRNGKey(0), imgs, projs, dvals, train=False)
    o0 = m0.apply(v, imgs, projs, dvals, train=False)
    o1 = m1.apply(v, imgs, projs, dvals, train=False)
    for st in ["stage1", "stage2", "stage3", "stage4"]:
        h0 = np.asarray(o0[st]["hypo_depth"])
        h1 = np.asarray(o1[st]["hypo_depth"])
        valid = np.all(np.isclose(h0, h1, rtol=5e-4), axis=1)  # (B, H, W)
        assert valid.mean() > 0.9, f"{st}: windows agree {valid.mean():.2%}"
        a0 = np.asarray(o0[st]["attn_weight"])
        a1 = np.asarray(o1[st]["attn_weight"])
        vmask = np.broadcast_to(valid[:, None], a0.shape)
        np.testing.assert_allclose(a1[vmask], a0[vmask], atol=2e-3,
                                   err_msg=st)
    d0 = np.asarray(o0["depth"])
    d1 = np.asarray(o1["depth"])
    mismatch = np.mean(np.abs(d0 - d1) > 1e-2)
    assert mismatch < 0.01, f"depth mismatch at {mismatch:.2%} of pixels"


def test_cost_volume_folded_emission_parity():
    """build_cost_volume(out_layout='folded') must equal fold_volume of the
    bdhwc output on the XLA path AND on the fused Pallas packed path
    (interpret mode) — the layouts must be numerics-invariant."""
    from jax.experimental.pallas import tpu as pltpu

    from helpers import plane_scene_sample

    from mvster_tpu.core.geometry import compose_projection
    from mvster_tpu.core.hypothesis import init_inverse_range
    from mvster_tpu.kernels.cost_volume import build_cost_volume

    sample = plane_scene_sample(2)
    imgs = jnp.asarray(sample["imgs"])
    composed = compose_projection(
        jnp.asarray(sample["proj_matrices"]["stage4"])
    )
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 4, 64, 64)
    args = (
        imgs[:, 0], [imgs[:, 1], imgs[:, 2]],
        composed[:, 0], [composed[:, 1], composed[:, 2]], hypo,
    )
    kw = dict(group_cor=True, group_dim=3, attn_temp=2.0)

    ref = build_cost_volume(*args, **kw, impl="xla")
    out = build_cost_volume(*args, **kw, impl="xla", out_layout="folded")
    assert out.shape == (1, 1, 64, 64, 4 * 3)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(fold_volume(ref))
    )

    with pltpu.force_tpu_interpret_mode():
        pref = build_cost_volume(*args, **kw, impl="pallas")
        pout = build_cost_volume(*args, **kw, impl="pallas",
                                 out_layout="folded")
    np.testing.assert_array_equal(
        np.asarray(pout), np.asarray(fold_volume(pref))
    )
