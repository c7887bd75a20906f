"""Benchmark: Pallas fused Sinkhorn loss vs XLA (+remat) on the real TPU.

Measures value+grad latency at the cascade's realistic stage shapes with
the chained protocol (utils/profiling.chain_latency) — wall-clock +
block_until_ready is invalid through the hosted axon runtime
(BENCHNOTES.md), which is what this script used before round 3.
The committed verdict lives in BENCHNOTES.md ("Sinkhorn backend").
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mvster_tpu.core.sinkhorn import sinkhorn
from mvster_tpu.kernels.pallas_sinkhorn import sinkhorn_loss_pallas
from mvster_tpu.utils.profiling import chain_latency


def timeit(vg_fn, attn, *rest, iters=12):
    """Chained per-iteration latency of loss+grad: the carry perturbs the
    attention input and the returned scalar folds the gradient sum so the
    whole backward is on the measured path."""

    def one(carry, a, *r):
        loss, grad = vg_fn(a + 1e-12 * carry, *r)
        return loss + jnp.sum(grad) * 1e-20

    return chain_latency(one, attn, *rest, iters=iters)


def main():
    rng = np.random.default_rng(0)
    for name, (b, d, h, w) in {
        "stage1 (D=8, 64x80)": (2, 8, 64, 80),
        "stage4 (D=4, 512x640)": (2, 4, 512, 640),
    }.items():
        hypo = jnp.asarray(
            np.sort(rng.uniform(400, 900, size=(b, d, h, w)).astype(np.float32), axis=1)
        )
        gt = jnp.asarray(rng.uniform(420, 880, size=(b, h, w)).astype(np.float32))
        logits = rng.normal(size=(b, d, h, w)).astype(np.float32)
        attn = jnp.asarray(np.exp(logits) / np.exp(logits).sum(1, keepdims=True))
        mask = jnp.asarray(rng.uniform(size=(b, h, w)) > 0.3)

        xla_vg = jax.jit(
            jax.value_and_grad(
                lambda a, g_, h_, m_: jax.checkpoint(
                    lambda a_: sinkhorn(g_, h_, a_, m_, iters=10, eps=1.0)[1]
                )(a)
            )
        )
        pls_vg = jax.jit(
            jax.value_and_grad(
                lambda a, g_, h_, m_: sinkhorn_loss_pallas(
                    g_, h_, a, m_, iters=10, eps=1.0
                )
            )
        )
        lx, gx = xla_vg(attn, gt, hypo, mask)
        lp, gp = pls_vg(attn, gt, hypo, mask)
        err_l = abs(float(lx) - float(lp)) / abs(float(lx))
        err_g = float(jnp.max(jnp.abs(gx - gp)))
        t_xla = timeit(lambda a, g_, h_, m_: xla_vg(a, g_, h_, m_),
                       attn, gt, hypo, mask)
        t_pls = timeit(lambda a, g_, h_, m_: pls_vg(a, g_, h_, m_),
                       attn, gt, hypo, mask)
        print(
            f"{name}: xla {t_xla * 1e3:7.3f} ms | pallas {t_pls * 1e3:7.3f} ms "
            f"({t_xla / t_pls:4.1f}x) | rel-loss-err {err_l:.2e} max-grad-err {err_g:.2e}"
        )


if __name__ == "__main__":
    main()
