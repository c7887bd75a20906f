"""Parity tests for the optional model variants.

Covers the checkpoint-convertible variant space: reg3d regularizer, the
attention aggregation blocks (CAM/DCAM/PAM/PDAM), ASFF feature fusion,
ConvNeXt backbones, and the train-mode mono decoder — each run through both
frameworks with converted weights on the textured-plane scene.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import reference_on_path
from tests.helpers import plane_scene_sample, to_torch_inputs
from tests.test_model_parity import (
    assert_stage_close,
    build_torch_model,
    jax_config_from,
    run_pair,
)
from mvster_tpu.models import MVS4Net

torch = pytest.importorskip("torch")

HAS_REF = reference_on_path()

# (name, torch overrides, jax overrides, run_pair kwargs)
VARIANTS = [
    # reg3d at 64x64 collapses its deepest level to 1x1x1, which torch BN
    # rejects in train mode -> skip the running-stats priming pass
    ("reg3d", dict(reg_net="reg3d"), dict(reg_net="reg3d"),
     dict(train_stats_pass=False)),
    ("cam", dict(agg_type="ConvBnReLU3D_CAM"), dict(agg_type="ConvBnReLU3D_CAM"), {}),
    ("dcam", dict(agg_type="ConvBnReLU3D_DCAM"), dict(agg_type="ConvBnReLU3D_DCAM"), {}),
    ("pam", dict(agg_type="ConvBnReLU3D_PAM"), dict(agg_type="ConvBnReLU3D_PAM"), {}),
    ("pdam", dict(agg_type="ConvBnReLU3D_PDAM"), dict(agg_type="ConvBnReLU3D_PDAM"), {}),
    ("asff", dict(asff=True), dict(asff=True), {}),
]
# NOTE: no full-model convnext rows — the reference MVS4net only assigns
# self.feature for arch_mode == "fpn" (MVS4Net.py:36-37), so its convnext
# modes crash on construction.  The backbones themselves are parity-tested
# in isolation below (test_convnext_backbone_parity_isolated).


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
@pytest.mark.parametrize(
    "name,t_over,j_over,kwargs", VARIANTS, ids=[v[0] for v in VARIANTS]
)
def test_variant_parity(name, t_over, j_over, kwargs):
    ref_out, our_out = run_pair(t_over, j_over, **kwargs)
    assert_stage_close(ref_out, our_out)


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
def test_mono_decoder_parity_isolated():
    """Mono decoder parity with controlled inputs.

    (Full-model train-mode comparison is intentionally NOT bitwise: we fold
    views into the batch for the FPN, so train-mode BatchNorm statistics are
    computed over B*V images instead of per-view B — a deliberate TPU-first
    change that only affects training-mode normalization.)
    """
    from models.mvs4net_utils import mono_depth_decoder as TorchMono

    from mvster_tpu.nn.mono import MonoDepthDecoder
    from mvster_tpu.tools.convert_torch_ckpt import convert_state_dict

    rng = np.random.default_rng(0)
    b, h, w = 2, 8, 8
    chans = {1: 64, 2: 32, 3: 16, 4: 8}
    feats = {
        s: rng.normal(size=(b, h * 2 ** (s - 1), w * 2 ** (s - 1), c)).astype(
            np.float32
        )
        for s, c in chans.items()
    }
    d_min = np.full((b,), 425.0, np.float32)
    d_max = np.full((b,), 935.0, np.float32)

    torch.manual_seed(0)
    tmod = TorchMono()
    tmod.train()
    t_outputs = {
        f"stage{s}": {"mono_feat": torch.from_numpy(f.transpose(0, 3, 1, 2).copy())}
        for s, f in feats.items()
    }
    with torch.no_grad():
        ref = tmod(t_outputs, torch.from_numpy(d_min), torch.from_numpy(d_max))

    sd = {f"mono_depth_decoder.{k}": v for k, v in tmod.state_dict().items()}
    variables = convert_state_dict(sd)
    variables = {
        "params": variables["params"]["mono_depth_decoder"],
        "batch_stats": variables["batch_stats"]["mono_depth_decoder"],
    }
    ours, _ = MonoDepthDecoder().apply(
        variables, {f"stage{s}": jnp.asarray(f) for s, f in feats.items()},
        jnp.asarray(d_min), jnp.asarray(d_max), True,
        mutable=["batch_stats"],
    )
    for s in range(2, 5):
        np.testing.assert_allclose(
            np.asarray(ours[f"stage{s}"]),
            ref[f"stage{s}"]["mono_depth"].numpy(),
            rtol=1e-4, atol=0.05,
            err_msg=f"stage{s} mono_depth mismatch",
        )


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
@pytest.mark.parametrize("kind", ["convnext", "convnext4"])
def test_convnext_backbone_parity_isolated(kind):
    """ConvNeXt FPN backbones vs the pure-torch oracles FPN4_convnext /
    FPN4_convnext4 (mvs4net_utils.py:581-721) with converted weights.

    Isolated (not full-model) because the reference MVS4net never wires
    these backbones: arch_mode != 'fpn' leaves self.feature unset and the
    model unconstructable (MVS4Net.py:36-37) — ours wires them for real.
    """
    from models.mvs4net_utils import FPN4_convnext, FPN4_convnext4

    from mvster_tpu.nn.fpn import FPN4ConvNeXt, FPN4ConvNeXt4
    from mvster_tpu.tools.convert_torch_ckpt import convert_state_dict

    t_cls, j_cls = {
        "convnext": (FPN4_convnext, FPN4ConvNeXt),
        "convnext4": (FPN4_convnext4, FPN4ConvNeXt4),
    }[kind]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)

    torch.manual_seed(0)
    tmod = t_cls(8)
    # layer-scale gamma init (1e-6) crushes encoder outputs to ~1e-6, which
    # makes the comparison trivially pass at any atol; use a realistic
    # magnitude as a trained checkpoint would have
    with torch.no_grad():
        for mod in tmod.modules():
            if hasattr(mod, "gamma") and getattr(mod, "gamma", None) is not None:
                mod.gamma.normal_(0.5, 0.2)
    tmod.eval()
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))

    sd = {f"feature.{k}": v for k, v in tmod.state_dict().items()}
    variables = convert_state_dict(sd)
    variables = {
        "params": variables["params"]["feature"],
        "batch_stats": variables["batch_stats"]["feature"],
    }
    ours = j_cls(8).apply(variables, jnp.asarray(x), False)
    for s in range(1, 5):
        got = np.asarray(ours[f"stage{s}"])
        want = ref[f"stage{s}"].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=2e-4,
            err_msg=f"{kind} stage{s} feature mismatch",
        )


def test_posenc_shapes():
    """pos_enc variants are dead in the reference (flag exists, module list
    never populated — MVS4Net.py:42-43); ours are wired for real.  Shape and
    finiteness checks (no oracle exists)."""
    from mvster_tpu.nn.posenc import PosEncLearned, PosEncSine

    x = jnp.ones((1, 4, 8, 8, 16))
    depth = jnp.linspace(425, 935, 4)[None, :, None, None] * jnp.ones((1, 4, 8, 8))
    out = PosEncSine().apply({}, x, depth)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())

    mod = PosEncLearned(4)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == x.shape


def test_dcn_block_runs():
    """Pure-JAX modulated deformable conv: zero-init offsets must behave as a
    plain (modulated-at-0.5) conv; output finite, shape preserved."""
    from mvster_tpu.nn.dcn import DeformConv2d

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 8)),
                    jnp.float32)
    mod = DeformConv2d(8)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == (2, 16, 16, 8)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
def test_dcn_oracle_parity():
    """Modulated deformable conv vs the reference's loadable pure-PyTorch
    DeformConv2d (mvs4net_utils.py:267-401) with converted weights and
    RANDOMIZED (non-zero) offset/modulation branches, so the gather math —
    not just the plain-conv degenerate case — is what's compared.

    Border note: the two implementations clamp differently when a sample
    falls outside the zero-padded input (the reference's independently
    clamped corner taps can double-weight the border texel; ours uses
    standard clamped bilinear).  Every such tap reads the ZERO padding, so
    the discrepancy multiplies zeros and outputs still agree exactly.
    """
    from models.mvs4net_utils import DeformConv2d as TorchDCN

    from mvster_tpu.nn.dcn import DeformConv2d

    rng = np.random.default_rng(0)
    b, h, w, c, outc, ks = 2, 12, 14, 8, 6, 3
    n = ks * ks
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)

    torch.manual_seed(0)
    tmod = TorchDCN(c, outc, kernel_size=ks, padding=1, stride=1,
                    modulation=True)
    # the offset/modulation convs are zero-initialized (identity
    # deformation) — randomize them so offsets of ~O(1) px exercise the
    # bilinear gather; keep them moderate so most samples stay interior
    with torch.no_grad():
        tmod.p_conv.weight.normal_(0.0, 0.3)
        tmod.p_conv.bias.normal_(0.0, 0.5)
        tmod.m_conv.weight.normal_(0.0, 0.3)
        tmod.m_conv.bias.normal_(0.0, 0.5)
    tmod.eval()
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))

    # manual weight conversion:
    #   p_conv/m_conv: torch (O, I, kh, kw) -> flax (kh, kw, I, O); the
    #     reference's offset channel split [dy x n | dx x n] matches ours
    #   main kernel: the reference applies a ks-strided Conv2d over taps
    #     laid out row-major (tap index = ki*ks + kj), so torch weight
    #     (O, C, ki, kj) -> our einsum kernel (n, C, O) at n = ki*ks + kj;
    #     bias=None in the reference -> use_bias=False here
    tw = {k: v.numpy() for k, v in tmod.state_dict().items()}
    kernel = np.transpose(
        tw["conv.weight"].reshape(outc, c, n), (2, 1, 0)
    ).copy()  # (n, C, O); reshape flattens (ki, kj) row-major = tap order
    variables = {
        "params": {
            "p_conv": {
                "kernel": jnp.asarray(
                    tw["p_conv.weight"].transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(tw["p_conv.bias"]),
            },
            "m_conv": {
                "kernel": jnp.asarray(
                    tw["m_conv.weight"].transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(tw["m_conv.bias"]),
            },
            "kernel": jnp.asarray(kernel),
        }
    }
    ours = DeformConv2d(outc, kernel_size=ks).apply(
        variables, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(ours),
        ref.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4,
    )
