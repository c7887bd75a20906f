"""A/B the space-to-depth conv routing at the model-component level.

Measures FPN4 (5 views) and Reg2d stage-4 apply at the raw eval size with
the s2d routing enabled vs disabled (chained protocol), to validate the
nn/s2d.py heuristic against the BENCHNOTES raw component map
(FPN 144.3 ms, reg2d s4 72.3 ms at round 2).

Usage: python scripts/probe_s2d_model.py [H W]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main(h=1152, w=1600):
    import mvster_tpu.nn.s2d as s2d
    from mvster_tpu.nn.fpn import FPN4
    from mvster_tpu.nn.reg import Reg2d
    from mvster_tpu.utils.profiling import chain_latency

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(5, h, w, 3)), jnp.float32)
    fpn = FPN4(base_channels=8)
    fpn_vars = jax.jit(fpn.init)(jax.random.PRNGKey(0), imgs[:1])

    vol = jnp.asarray(rng.normal(size=(1, 4, h, w, 8)), jnp.float32)
    reg = Reg2d(base_channels=8)
    reg_vars = jax.jit(reg.init)(jax.random.PRNGKey(0), vol[:, :, :64, :64])

    def fpn_fn(carry, v, x):
        out = fpn.apply(v, x + 1e-12 * carry)
        return jnp.float32(sum(jnp.mean(o) for o in out.values()))

    def reg_fn(carry, v, x):
        return jnp.mean(reg.apply(v, x + 1e-12 * carry))

    for on in [False, True]:
        saved = s2d.S2D_ENABLED
        s2d.S2D_ENABLED = on  # routing is default-off since round 4
        try:
            t_f = chain_latency(fpn_fn, fpn_vars, imgs, iters=6)
            t_r = chain_latency(reg_fn, reg_vars, vol, iters=6)
            print(
                f"s2d={'on ' if on else 'off'} @ {h}x{w}: "
                f"FPN4(5v) {t_f * 1e3:7.2f} ms   reg2d-s4 {t_r * 1e3:7.2f} ms"
            )
        finally:
            s2d.S2D_ENABLED = saved


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
