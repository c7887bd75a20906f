"""End-to-end numerical parity: flax MVS4Net vs the torch reference oracle.

The strongest test we can run without the released checkpoint: random-init the
reference torch model, convert its state dict with our converter, run both
models on an identical synthetic sample, and require matching outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import reference_on_path
from tests.helpers import plane_scene_sample, synthetic_sample, to_torch_inputs
from mvster_tpu.models import MVS4Net, MVS4NetConfig
from mvster_tpu.tools.convert_torch_ckpt import convert_state_dict

torch = pytest.importorskip("torch")

HAS_REF = reference_on_path()


def build_torch_model(**overrides):
    from models.MVS4Net import MVS4net as TorchMVS4net

    kwargs = dict(
        arch_mode="fpn", reg_net="reg2d", num_stage=4, fpn_base_channel=8,
        reg_channel=8, stage_splits=[8, 8, 4, 4],
        depth_interals_ratio=[0.5, 0.5, 0.5, 1], group_cor=True,
        group_cor_dim=[8, 8, 4, 4], inverse_depth=True,
        agg_type="ConvBnReLU3D", dcn=False, pos_enc=0, mono=False,
        asff=False, attn_temp=2,
    )
    kwargs.update(overrides)
    torch.manual_seed(0)
    model = TorchMVS4net(**kwargs)
    # Random init makes the depth distribution nearly uniform, so argmax
    # depth is decided by float noise.  Sharpen the logit heads (any weights
    # are equally valid for a numerics test) so argmax is well-separated and
    # the cascade comparison is well-conditioned.
    with torch.no_grad():
        for reg in model.reg:
            reg.prob.weight *= 40.0
            if reg.prob.bias is not None:
                reg.prob.bias.normal_(0.0, 0.5)
    return model


def jax_config_from(**overrides):
    kwargs = dict(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
        attn_temp=2.0,
    )
    kwargs.update(overrides)
    return MVS4NetConfig(**kwargs)


def run_pair(torch_overrides, jax_overrides, seed=0, nviews=3, h=64, w=64,
             train_stats_pass=True, scene="plane"):
    if scene == "plane":
        # textured plane: the cost volume has a decisive true-depth peak, so
        # argmax comparisons are well-conditioned (random images give flat
        # cost and pure tie-noise argmax)
        sample = plane_scene_sample(seed, h=h, w=w)
    else:
        sample = synthetic_sample(seed, nviews=nviews, h=h, w=w)
    imgs_t, projs_t, dv_t = to_torch_inputs(sample)

    tmodel = build_torch_model(**torch_overrides)
    if train_stats_pass:
        tmodel.train()
        with torch.no_grad():
            tmodel(imgs_t, projs_t, dv_t)  # populate BN running stats
    tmodel.eval()
    with torch.no_grad():
        ref_out = tmodel(imgs_t, projs_t, dv_t)

    variables = convert_state_dict(tmodel.state_dict())
    model = MVS4Net(jax_config_from(**jax_overrides))
    our_out = jax.jit(
        lambda v, i, p, d: model.apply(v, i, p, d, train=False)
    )(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(sample["imgs"]),
        {k: jnp.asarray(v) for k, v in sample["proj_matrices"].items()},
        jnp.asarray(sample["depth_values"]),
    )
    return ref_out, our_out


def assert_stage_close(ref_out, our_out, atol=2e-3, depth_frac=0.01):
    """Stage-by-stage comparison that tracks cascade-tie divergence.

    Argmax at flat-cost pixels (out-of-frustum warps) is float noise in BOTH
    frameworks; those ties feed the next stage's hypothesis windows, so a
    single tie-flip legitimately diverges the cascade at that pixel.  We
    therefore compare each stage only where its hypothesis windows agree
    (upstream argmax agreed) and require that region to dominate.
    """
    for s in range(1, 5):
        key = f"stage{s}"
        ref_attn = ref_out[key]["attn_weight"].numpy()
        our_attn = np.asarray(our_out[key]["attn_weight"])
        ref_hypo = ref_out[key]["hypo_depth"].numpy()
        our_hypo = np.asarray(our_out[key]["hypo_depth"])

        # pixels whose hypothesis windows match = cascade agreed up to here
        valid = np.all(
            np.isclose(our_hypo, ref_hypo, rtol=5e-4), axis=1
        )  # (B, H, W)
        assert valid.mean() > 0.9, (
            f"{key}: only {valid.mean():.2%} of hypothesis windows agree"
        )

        vmask = np.broadcast_to(valid[:, None], ref_attn.shape)
        np.testing.assert_allclose(
            our_attn[vmask], ref_attn[vmask], atol=atol,
            err_msg=f"{key} attn_weight mismatch (valid pixels)",
        )
        ref_exp = (ref_attn * ref_hypo).sum(1)
        our_exp = (our_attn * our_hypo).sum(1)
        np.testing.assert_allclose(
            our_exp[valid], ref_exp[valid], rtol=5e-3, atol=1e-2,
            err_msg=f"{key} expected-depth mismatch",
        )

        ref_depth = ref_out[key]["depth"].numpy()
        our_depth = np.asarray(our_out[key]["depth"])
        # among valid pixels, compare argmax where the reference is decisive
        top2 = np.sort(ref_attn, axis=1)[:, -2:]
        decisive = ((top2[:, 1] - top2[:, 0]) > 0.05) & valid
        mismatch = ~np.isclose(our_depth, ref_depth, rtol=1e-3, atol=1e-2)
        frac = mismatch[decisive].mean() if decisive.any() else 0.0
        assert frac <= depth_frac, (
            f"{key} decisive-pixel depth mismatch fraction {frac}"
        )


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
def test_full_model_parity_default_dtu_config():
    ref_out, our_out = run_pair({}, {})
    assert_stage_close(ref_out, our_out)


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
def test_full_model_parity_forward_depth_mode():
    """Non-inverse depth path + squared-difference correlation."""
    ref_out, our_out = run_pair(
        dict(inverse_depth=False, group_cor=False),
        dict(inverse_depth=False, group_cor=False),
    )
    assert_stage_close(ref_out, our_out)


def test_cost_volume_peaks_at_true_depth():
    """Functional geometry test: with raw images as features, the plane-sweep
    group-correlation volume must peak at the textured plane's true depth.
    (The full model with random weights can't be tested this way — an
    untrained regularizer has arbitrary logit sign.)
    """
    from mvster_tpu.core.geometry import compose_projection
    from mvster_tpu.core.hypothesis import init_inverse_range
    from mvster_tpu.kernels.cost_volume import build_cost_volume

    sample = plane_scene_sample(0)
    imgs = jnp.asarray(sample["imgs"])  # (1, V, H, W, 3)
    composed = compose_projection(jnp.asarray(sample["proj_matrices"]["stage4"]))
    hypo = init_inverse_range(jnp.asarray(sample["depth_values"]), 16, 64, 64)
    cor = build_cost_volume(
        imgs[:, 0], [imgs[:, 1], imgs[:, 2]],
        composed[:, 0], [composed[:, 1], composed[:, 2]],
        hypo, group_cor=True, group_dim=3, attn_temp=2.0,
    )  # (1, D, H, W, 3)
    score = np.asarray(jnp.sum(cor, axis=-1))[0]  # (D, H, W)
    best = score.argmax(axis=0)  # correlation peaks at alignment
    depth_at_best = np.take_along_axis(
        np.asarray(hypo)[0], best[None], axis=0
    )[0]
    interior = depth_at_best[16:48, 16:48]
    # bin spacing near 600 is ~30; accept the true bin +-1 neighbor (the
    # correlation peak straddles bins).  Edge columns are out-of-frustum for
    # one of the two sources and legitimately noisy.
    frac = (np.abs(interior - sample["plane_depth"]) < 40).mean()
    assert frac > 0.55, f"only {frac:.2%} of cost-volume peaks at true depth"
    assert abs(np.median(interior) - sample["plane_depth"]) < 10


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
def test_converted_tree_matches_flax_init_structure():
    """Converter output must line up leaf-for-leaf with flax init."""
    sample = synthetic_sample(1, nviews=2, h=64, w=64)
    tmodel = build_torch_model(mono=True)
    variables = convert_state_dict(tmodel.state_dict())

    model = MVS4Net(jax_config_from(mono=True))
    init_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["imgs"]),
        {k: jnp.asarray(v) for k, v in sample["proj_matrices"].items()},
        jnp.asarray(sample["depth_values"]),
        train=True,
    )

    def leaf_paths(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(leaf_paths(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = v.shape
        return out

    init_params = leaf_paths(init_vars["params"])
    conv_params = leaf_paths(variables["params"])
    assert set(init_params) == set(conv_params), (
        sorted(set(init_params) ^ set(conv_params))[:10]
    )
    for path, shape in init_params.items():
        assert conv_params[path] == shape, (path, shape, conv_params[path])

    init_stats = leaf_paths(init_vars["batch_stats"])
    conv_stats = leaf_paths(variables["batch_stats"])
    assert set(init_stats) == set(conv_stats)
