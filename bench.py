"""Headline benchmark: DTU inference seconds/view + train-step ms on one TPU chip.

Mirrors the reference measurement protocol (forward pass only, no-grad,
batch 1, 5 views — test_mvs4.py:204-207; published baselines 0.09 s/view mid
and 0.17 s/view raw on an RTX 3090, README.md:80-81).  Prints ONE JSON line:
the headline metric is DTU-mid s/view; raw s/view and the full train-step
latency (DTU-mid, batch 2, OT iter 10 + mono — the published training
config) ride along in "extras" so every published number is
driver-measured from the same run.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SEC_PER_VIEW = 0.09
BASELINE_RAW_SEC_PER_VIEW = 0.17


def _variants(h, w, v, n=4, with_gt=False, batch=1):
    """A few distinct on-device inputs so no caching can shortcut timing."""
    sys.path.insert(0, "tests")
    from helpers import synthetic_sample

    out = []
    for seed in range(n):
        s = synthetic_sample(seed, batch=batch, nviews=v, h=h, w=w,
                             with_gt=with_gt)
        item = {
            "imgs": jnp.asarray(s["imgs"]),
            "proj_matrices": {
                k: jnp.asarray(p) for k, p in s["proj_matrices"].items()
            },
            "depth_values": jnp.asarray(s["depth_values"]),
        }
        if with_gt:
            item["depth"] = {k: jnp.asarray(x) for k, x in s["depth"].items()}
            item["mask"] = {k: jnp.asarray(x) for k, x in s["mask"].items()}
        out.append(item)
    return out


def _median_time(fn, variants, iters):
    for v in variants:  # warmup / compile
        jax.block_until_ready(fn(v))
    times = []
    for i in range(iters):
        v = variants[i % len(variants)]
        t0 = time.perf_counter()
        out = fn(v)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_forward(model, variables, h, w, v, iters=40):
    """NOTE: `variables` must be an explicit jit ARGUMENT.  Closing over the
    param tree embeds it as compile-time constants, which the axon runtime
    re-ships per execution — measured 195 ms/call vs 0.26 ms with the
    argument form for the identical program."""
    variants = _variants(h, w, v)

    @jax.jit
    def forward(vs, batch):
        out = model.apply(vs, batch["imgs"], batch["proj_matrices"],
                          batch["depth_values"], train=False)
        return out["depth"], out["photometric_confidence"]

    return _median_time(lambda b: forward(variables, b), variants, iters)


def bench_train_step(iters=20):
    """Full train step (fwd+bwd+adam) at DTU-mid, batch 2, OT it10 + mono."""
    import optax

    from mvster_tpu.dist.train_step import create_train_state, make_train_step
    from mvster_tpu.models import MVS4Net, MVS4NetConfig

    model = MVS4Net(MVS4NetConfig.dtu_default(mono=True))
    variants = _variants(512, 640, 5, n=2, with_gt=True, batch=2)
    b0 = variants[0]
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), b0["imgs"], b0["proj_matrices"],
            b0["depth_values"], train=True,
        )
    )()
    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(
        model, tx, loss_kwargs=dict(inverse_depth=True, ot_iter=10, mono=True),
        donate=False,
    )

    holder = {"state": state}

    def run(batch):
        new_state, scalars, _ = step(holder["state"], batch)
        holder["state"] = new_state
        return scalars["loss"]

    return _median_time(run, variants, iters)


def main():
    from mvster_tpu.models import MVS4Net, MVS4NetConfig

    model = MVS4Net(MVS4NetConfig.dtu_default(mono=False))
    v0 = _variants(512, 640, 5, n=1)[0]
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), v0["imgs"], v0["proj_matrices"],
            v0["depth_values"], train=False,
        )
    )()
    jax.block_until_ready(variables)

    mid = bench_forward(model, variables, 512, 640, 5, iters=40)
    # raw eval size: max_h 1200 snaps to the 64-multiple 1152
    # (general_eval4.py:92-109)
    raw = bench_forward(model, variables, 1152, 1600, 5, iters=20)
    train_ms = bench_train_step(iters=20) * 1e3

    print(
        json.dumps(
            {
                "metric": "dtu_mid_sec_per_view",
                "value": mid,
                "unit": "s/view (512x640, 5 views, batch 1, forward only)",
                "vs_baseline": BASELINE_SEC_PER_VIEW / mid,
                "extras": {
                    "dtu_raw_sec_per_view": raw,
                    "dtu_raw_vs_baseline": BASELINE_RAW_SEC_PER_VIEW / raw,
                    "train_step_ms_mid_b2": train_ms,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
