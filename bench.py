"""Headline benchmark: DTU-mid inference seconds/view on one TPU chip.

Mirrors the reference measurement protocol (forward pass only, no-grad,
batch 1, 5 views, 512x640 — test_mvs4.py:204-207; published baseline 0.09
s/view on an RTX 3090, README.md:80).  Prints ONE JSON line.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SEC_PER_VIEW = 0.09


def main():
    from mvster_tpu.models import MVS4Net, MVS4NetConfig

    sys.path.insert(0, "tests")
    from helpers import synthetic_sample

    h, w, v = 512, 640, 5
    model = MVS4Net(MVS4NetConfig.dtu_default(mono=False))

    # a few distinct on-device inputs so no caching can shortcut the timing
    variants = []
    for seed in range(4):
        s = synthetic_sample(seed, nviews=v, h=h, w=w)
        variants.append(
            (
                jnp.asarray(s["imgs"]),
                {k: jnp.asarray(p) for k, p in s["proj_matrices"].items()},
                jnp.asarray(s["depth_values"]),
            )
        )

    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), variants[0][0], variants[0][1], variants[0][2],
            train=False,
        )
    )()
    jax.block_until_ready(variables)

    @jax.jit
    def forward(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return out["depth"], out["photometric_confidence"]

    # warmup / compile
    for args in variants:
        jax.block_until_ready(forward(variables, *args))

    iters = 40
    times = []
    for i in range(iters):
        args = variants[i % len(variants)]
        t0 = time.perf_counter()
        out = forward(variables, *args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    sec_per_view = float(np.median(times))

    print(
        json.dumps(
            {
                "metric": "dtu_mid_sec_per_view",
                "value": sec_per_view,
                "unit": "s/view (512x640, 5 views, batch 1, forward only)",
                "vs_baseline": BASELINE_SEC_PER_VIEW / sec_per_view,
            }
        )
    )


if __name__ == "__main__":
    main()
