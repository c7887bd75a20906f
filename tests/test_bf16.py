"""bfloat16 compute mode: close to f32 on a structured scene."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.helpers import plane_scene_sample
from mvster_tpu.models import MVS4Net, MVS4NetConfig


def test_bf16_mode_close_to_f32():
    sample = plane_scene_sample(0)
    imgs = jnp.asarray(sample["imgs"])
    projs = {k: jnp.asarray(v) for k, v in sample["proj_matrices"].items()}
    dv = jnp.asarray(sample["depth_values"])

    cfg32 = MVS4NetConfig.dtu_default(mono=False)
    cfg16 = MVS4NetConfig.dtu_default(mono=False, compute_dtype="bfloat16")
    m32, m16 = MVS4Net(cfg32), MVS4Net(cfg16)
    variables = m32.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)

    out32 = jax.jit(lambda v, i, p, d: m32.apply(v, i, p, d, train=False))(
        variables, imgs, projs, dv
    )
    out16 = jax.jit(lambda v, i, p, d: m16.apply(v, i, p, d, train=False))(
        variables, imgs, projs, dv
    )
    # params are shared f32; bf16 only changes conv compute precision.
    # stage1 attention should agree closely; depths within a bin or two.
    a32 = np.asarray(out32["stage1"]["attn_weight"])
    a16 = np.asarray(out16["stage1"]["attn_weight"])
    assert np.abs(a32 - a16).mean() < 0.02
    d32 = np.asarray(out32["depth"])
    d16 = np.asarray(out16["depth"])
    assert np.isfinite(d16).all()
    # most final depths agree within 2% (argmax flips only near ties)
    agree = np.mean(np.abs(d16 - d32) / d32 < 0.02)
    assert agree > 0.7, f"only {agree:.2%} of bf16 depths near f32"
