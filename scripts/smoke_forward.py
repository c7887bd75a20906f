"""Smoke-drive the flagship model end-to-end through the public API.

Builds MVS4Net with the published DTU config, random-inits it, runs a jitted
forward at DTU-mid shape on whatever accelerator jax sees, and prints depth
statistics + wall time.  Usage: python scripts/smoke_forward.py [H W V]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mvster_tpu.models import MVS4Net, MVS4NetConfig

sys.path.insert(0, "tests")
from helpers import synthetic_sample  # noqa: E402


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    v = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    print("devices:", jax.devices())

    sample = synthetic_sample(0, nviews=v, h=h, w=w)
    imgs = jnp.asarray(sample["imgs"])
    projs = {k: jnp.asarray(p) for k, p in sample["proj_matrices"].items()}
    dv = jnp.asarray(sample["depth_values"])

    model = MVS4Net(MVS4NetConfig.dtu_default(mono=False))
    t0 = time.time()
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)
    )()
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s; params:",
          sum(x.size for x in jax.tree_util.tree_leaves(variables["params"])))

    @jax.jit
    def forward(variables, imgs, projs, dv):
        return model.apply(variables, imgs, projs, dv, train=False)

    t0 = time.time()
    out = forward(variables, imgs, projs, dv)
    jax.block_until_ready(out)
    print(f"first call (compile+run): {time.time() - t0:.1f}s")

    times = []
    for _ in range(5):
        t0 = time.time()
        out = forward(variables, imgs, projs, dv)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    depth = np.asarray(out["depth"])
    conf = np.asarray(out["photometric_confidence"])
    print(f"steady-state forward: {min(times) * 1000:.1f} ms")
    print(f"depth shape {depth.shape} range [{depth.min():.1f}, {depth.max():.1f}]")
    print(f"confidence range [{conf.min():.3f}, {conf.max():.3f}]")
    for s in range(1, 5):
        d = np.asarray(out[f"stage{s}"]["depth"])
        print(f"  stage{s}: depth {d.shape}, hypo {np.asarray(out[f'stage{s}']['hypo_depth']).shape}")
    assert np.isfinite(depth).all(), "non-finite depths!"
    assert depth.min() >= 0, "negative depth!"
    fb = sum(int(out[f"stage{s}"]["warp_fallbacks"]) for s in range(1, 5))
    print(
        f"pallas warp fallbacks: {fb}/{4 * (v - 1)} stage-views took the "
        f"XLA path" + (" (DEGRADED)" if fb else "")
    )

    # On-chip Pallas-vs-XLA warp parity as a committed, reproducible check
    # (VERDICT r2 #6): both cost-volume impls at the production stage-4
    # geometry (this forward's own refined hypotheses), referenced from
    # PARITY.md.  The 1e-5 bound is loose against the measured ~5e-7 —
    # it catches kernel-layout regressions, not float noise.
    from mvster_tpu.core.geometry import compose_projection
    from mvster_tpu.kernels.cost_volume import build_cost_volume

    pr = compose_projection(projs["stage4"])
    ref_proj, src_projs = pr[:, 0], jnp.stack(
        [pr[:, i] for i in range(1, v)]
    )
    rngf = np.random.default_rng(1)
    rf = jnp.asarray(rngf.normal(size=(1, h, w, 8)), jnp.float32)
    sf = jnp.asarray(rngf.normal(size=(v - 1, 1, h, w, 8)), jnp.float32)
    hypo = out["stage4"]["hypo_depth"]

    # Arguments, NOT closure captures: axon ships jit-embedded constants
    # with the compile payload, and the raw-size features (~300 MB f32)
    # blow the tunnel's request-size limit (HTTP 413).
    def both(rf, sf, ref_proj, src_projs, hypo):
        kw = dict(group_cor=True, group_dim=4)
        cvp, nfb = build_cost_volume(
            rf, sf, ref_proj, src_projs, hypo, impl="pallas",
            with_fallbacks=True, **kw,
        )
        # unpacked entry: identical coordinates to the XLA path, so any
        # drift here is genuine kernel drift (tight 1e-5 bound below)
        cvu = build_cost_volume(
            rf, sf, ref_proj, src_projs, hypo, impl="pallas",
            pallas_coords="unpacked", **kw,
        )
        cvx = build_cost_volume(
            rf, sf, ref_proj, src_projs, hypo, impl="xla", **kw
        )
        return (jnp.max(jnp.abs(cvp - cvx)), jnp.max(jnp.abs(cvu - cvx)),
                nfb)

    err, err_u, nfb = jax.jit(both)(rf, sf, ref_proj, src_projs, hypo)
    print(
        f"on-chip warp parity (stage4 pallas vs xla): packed max|d| = "
        f"{float(err):.2e}, unpacked max|d| = {float(err_u):.2e}, "
        f"fallbacks {int(nfb)}/{v - 1}"
    )
    assert int(nfb) == 0 or float(err) == 0.0, "parity check did not run the kernel"
    # Packed tolerance matches tests/test_pallas_warp.test_build_cost_
    # volume_packed_coords_matches: the geometry-direct packed entry (the
    # default) reassociates the coordinate dot products (<= 1e-4 px), which
    # shifts bilinear weights by the same order — on unit-normal features
    # the correlation then moves by up to ~1e-3 (measured on-chip 4.7e-4).
    # The unpacked entry shares the XLA path's exact coordinates, so it
    # keeps the tight bound (measured ~5e-7) and catches genuine kernel
    # drift the loose packed bound cannot (ADVICE r4).
    assert float(err) <= 2e-3, f"pallas warp diverged from XLA: {float(err)}"
    assert float(err_u) <= 1e-5, (
        f"pallas kernel (unpacked coords) diverged from XLA: {float(err_u)}"
    )
    print("OK")


if __name__ == "__main__":
    main()
