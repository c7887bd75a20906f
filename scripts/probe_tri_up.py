"""A/B the hypothesis-schedule trilinear 2x upsample: stencil vs einsum.

ADVICE r4 item 2: resize_trilinear_align_corners routes exact-2x H/W
unconditionally through the 3-tap stencil while the bilinear sibling was
demoted to never-route after an in-model regression.  This probe measures
the REAL consumer — schedule_inverse_range at every cascade transition
(the (B, D, H/2, W/2) -> (B, D, H, W) hypothesis upsample + 1/x) — with
the stencil routed vs monkeypatched to the einsum arm, chained protocol.

Usage: python scripts/probe_tri_up.py [H W]   (model input size; default raw)
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mvster_tpu.core import sampling
from mvster_tpu.core.hypothesis import schedule_inverse_range
from mvster_tpu.utils.profiling import chain_latency

# cascade transitions: (ndepths, output h-div, w-div) for stages 2..4
TRANSITIONS = [(8, 8), (4, 4), (4, 2), (4, 1)]


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1152
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    rng = np.random.default_rng(0)

    rows = []
    for nd, div in TRANSITIONS[1:]:  # stage2..4 consume the schedule
        hs, ws = h // div, w // div
        # previous-stage bounds at half resolution, inverse-depth ordered
        inv_max = jnp.asarray(
            1.0 / (900.0 + 50.0 * rng.random((1, hs // 2, ws // 2))),
            jnp.float32,
        )
        inv_min = inv_max + jnp.asarray(
            (1 / 425.0 - 1 / 935.0) * (0.2 + 0.1 * rng.random(
                (1, hs // 2, ws // 2))),
            jnp.float32,
        )

        def sched(carry, a, b):
            out = schedule_inverse_range(a + 1e-12 * carry, b, nd, hs, ws)
            return jnp.mean(out)

        t_st = chain_latency(sched, inv_min, inv_max, iters=8)
        sampling._TRI_STENCIL2X = False
        try:
            t_ei = chain_latency(sched, inv_min, inv_max, iters=8)
        finally:
            sampling._TRI_STENCIL2X = True
        rows.append((nd, hs, ws, t_st * 1e3, t_ei * 1e3))
        print(f"D{nd} -> {hs}x{ws}: stencil {t_st * 1e3:7.3f} ms | "
              f"einsum {t_ei * 1e3:7.3f} ms")

    tot_st = sum(r[3] for r in rows)
    tot_ei = sum(r[4] for r in rows)
    print(f"\ncascade total ({h}x{w}): stencil {tot_st:.3f} ms vs "
          f"einsum {tot_ei:.3f} ms")


if __name__ == "__main__":
    main()
