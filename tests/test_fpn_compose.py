"""Composed FPN tail (nn/fpn.py:_composed_tail) parity.

The eval-only composed branch must be checkpoint-identical to the standard
branch (same param tree from the same seed — the param-mirror contract) and
numerically equal up to f32 reassociation: it computes the same
   out4(up(intra) + inner3(conv0))
with out4 distributed over the sum, out4 ∘ inner3 composed in weight space,
and inner3's bias turned into a border-aware bias map.  Mirrors the folded
reg2d test strategy (tests/test_reg_folded.py).  Reference behavior:
FPN4.forward tail, /root/reference/models/mvs4net_utils.py:488-489.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvster_tpu.nn.fpn import FPN4


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(la, lb):
        assert pa == pb, f"param path mismatch: {pa} vs {pb}"
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.parametrize("mode", ["hconv", "up"])
def test_composed_tail_matches_standard(mode):
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 64, 3))

    std = FPN4(8, compose_tail=False)
    cmp_ = FPN4(8, compose_tail=True, compose_mode=mode)
    v_std = std.init(rng, x, False)
    v_cmp = cmp_.init(rng, x, False)
    # checkpoint-identical trees: the composed branch only mirrors params
    _trees_equal(v_std, v_cmp)

    o_std = std.apply(v_std, x, False)
    o_cmp = cmp_.apply(v_std, x, False)  # std params through composed math
    for k in ("stage1", "stage2", "stage3"):
        np.testing.assert_array_equal(
            np.asarray(o_std[k]), np.asarray(o_cmp[k])
        )
    np.testing.assert_allclose(
        np.asarray(o_std["stage4"]), np.asarray(o_cmp["stage4"]),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("mode", ["hconv", "up"])
def test_composed_tail_border_bias(mode):
    """The border bias map and the W-shift masks are the non-conv terms —
    check the exact corner/edge/interior structure against a brute-force
    standard apply on a tiny image where borders dominate."""
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 24, 3))
    std = FPN4(8, compose_tail=False)
    cmp_ = FPN4(8, compose_tail=True, compose_mode=mode)
    v = std.init(rng, x, False)
    a = np.asarray(std.apply(v, x, False)["stage4"])
    b = np.asarray(cmp_.apply(v, x, False)["stage4"])
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("cls_name", ["FPN4ConvNeXt", "FPN4ConvNeXt4"])
def test_composed_tail_convnext_variants(cls_name):
    """The ConvNeXt FPN variants share the tail structure; same contract."""
    import mvster_tpu.nn.fpn as fpn_mod

    cls = getattr(fpn_mod, cls_name)
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 48, 3))
    std = cls(8, compose_tail=False)
    cmp_ = cls(8, compose_tail=True)
    v_std = std.init(rng, x, False)
    v_cmp = cmp_.init(rng, x, False)
    _trees_equal(v_std, v_cmp)
    a = np.asarray(std.apply(v_std, x, False)["stage4"])
    b = np.asarray(cmp_.apply(v_std, x, False)["stage4"])
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["hconv", "up"])
def test_composed_tail_bfloat16(mode):
    """bf16 compute mode: raw lax.conv has no nn.Conv auto-cast, so the
    composed branch must cast its inputs to the kernels' dtype itself (the
    f32 intra meeting a bf16 kernel crashed the r5c window).  Parity vs the
    standard bf16 branch at bf16 tolerance."""
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 48, 3))
    std = FPN4(8, dtype=jnp.bfloat16, compose_tail=False)
    cmp_ = FPN4(8, dtype=jnp.bfloat16, compose_tail=True, compose_mode=mode)
    v = std.init(rng, x, False)
    a = np.asarray(std.apply(v, x, False)["stage4"], np.float32)
    b = np.asarray(cmp_.apply(v, x, False)["stage4"], np.float32)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)


def test_composed_tail_train_routes_standard():
    """train=True must take the standard branch (BatchNorm-free tail, but
    the routing contract mirrors reg2d_fold: training never composes)."""
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 16, 16, 3))
    m = FPN4(8, compose_tail=True)
    v = m.init(rng, x, False)
    o_train, _ = m.apply(v, x, True, mutable=["batch_stats"])
    o_std, _ = FPN4(8, compose_tail=False).apply(
        v, x, True, mutable=["batch_stats"]
    )
    for k in o_std:
        np.testing.assert_array_equal(
            np.asarray(o_std[k]), np.asarray(o_train[k])
        )
