"""Headline benchmark: DTU inference seconds/view + train-step ms on one TPU chip.

Mirrors the reference measurement protocol (forward pass only, no-grad,
batch 1, 5 views — test_mvs4.py:204-207; published baselines 0.09 s/view mid
and 0.17 s/view raw on an RTX 3090, README.md:80-81).  Prints ONE JSON line:
the headline metric is DTU-mid s/view; raw s/view and the full train-step
latency (DTU-mid, batch 2, OT iter 10 + mono — the published training
config) ride along in "extras" so every published number is
driver-measured from the same run.

Measurement protocol: `chain_latency` (mvster_tpu/utils/profiling.py) —
iterations chained by data dependency inside one jitted fori_loop with a
scalar fetched to the host.  Wall-clock + block_until_ready is NOT valid
through the hosted axon runtime (executions complete asynchronously after
block_until_ready returns); see BENCHNOTES.md for the full analysis and
the diagnostics that invalidated the round-1 numbers.
"""

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

_T0 = time.time()


def _stamp(msg):
    """Progress to stderr (the JSON line owns stdout): bench.py compiles
    ~10 distinct programs and can spend tens of minutes cold — the stamps
    plus the persistent compile cache (enabled in main) keep reruns fast
    and hangs diagnosable."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)

BASELINE_SEC_PER_VIEW = 0.09
BASELINE_RAW_SEC_PER_VIEW = 0.17


def _batch(h, w, v, with_gt=False, batch=1, seed=0):
    from helpers import synthetic_sample

    s = synthetic_sample(seed, batch=batch, nviews=v, h=h, w=w, with_gt=with_gt)
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
    return item


def bench_forward(model, variables, h, w, v, iters=8):
    """Chained per-forward latency.  NOTE: `variables` must be an explicit
    argument of the traced fn — closing over the param tree embeds it as
    constants the runtime re-ships per execution (~195 ms/call extra)."""
    from mvster_tpu.utils.profiling import chain_latency

    batch = _batch(h, w, v)

    def one_forward(carry, vs, b):
        imgs = b["imgs"] + 1e-12 * carry  # serialize iterations
        out = model.apply(vs, imgs, b["proj_matrices"], b["depth_values"],
                          train=False)
        return jnp.mean(out["depth"]) + jnp.mean(out["photometric_confidence"])

    return chain_latency(one_forward, variables, batch, iters=iters)


def bench_train_step_threaded(batch_size=8, grad_accum=1):
    """Train step at batch >= 4 via dispatch_chain_latency: the fori_loop
    chain wrapper exceeds the XLA compile helper there, so iterations are
    serialized as dependent state->state dispatches with a final-state
    scalar fetch instead (utils/profiling.py).  Publishes the
    production-relevant large-batch number (VERDICT r2 #5).

    grad_accum > 1 runs the batch as that many scan microbatches with one
    optimizer update (dist/train_step.py) — the published route to b8: the
    monolithic b8 program is rejected by this environment's XLA compile
    helper (HTTP 500, BENCH_r03), while grad_accum=2 compiles the b4-sized
    program once."""
    import optax

    from mvster_tpu.dist.train_step import create_train_state, make_train_step
    from mvster_tpu.models import MVS4Net, MVS4NetConfig
    from mvster_tpu.utils.profiling import dispatch_chain_latency

    model = MVS4Net(MVS4NetConfig.dtu_default(mono=True))
    batch = _batch(512, 640, 5, with_gt=True, batch=batch_size)
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
            batch["depth_values"], train=True,
        )
    )()
    import jax.numpy as jnp

    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)
    # donate=False: dispatch_chain_latency re-dispatches from the SAME
    # initial state across its compile/warm/timed runs, so the production
    # default donate_argnums=(0,) would hand the runtime deleted buffers on
    # every call after the first — the "TPU backend error (InvalidArgument)"
    # that blanked the b1/b4/b8 extras in BENCH_r04 (VERDICT r4 weak #2)
    step = make_train_step(
        model, tx, loss_kwargs=dict(inverse_depth=True, ot_iter=10, mono=True),
        grad_accum=grad_accum, donate=False,
    )
    return dispatch_chain_latency(
        lambda st, bt: step(st, bt)[0], state, batch,
        probe=lambda st: jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), st.params, jnp.float32(0.0)
        ),
    )


def bench_train_step(iters=6, compute_dtype="float32"):
    """Full train step (fwd+bwd+adam) at DTU-mid, batch 2, OT it10 + mono.
    compute_dtype="bfloat16" benches the bf16-conv mode (f32 master params,
    norms, geometry, and losses — tests/test_training_learns.py guards that
    this mode still learns).

    chain_latency carries an f32 scalar, so iterations are serialized
    through a 1e-12 batch perturbation from a FIXED initial state (each
    iteration re-runs the step from the same TrainState) — not
    state-threaded consecutive steps.  The timing is still valid: all
    fwd+bwd+adam work depends on the perturbed batch, and the returned
    scalar sums a probe of the updated params so the optimizer update
    cannot be dead-code-eliminated."""
    import optax

    from mvster_tpu.dist.train_step import create_train_state, make_train_step
    from mvster_tpu.models import MVS4Net, MVS4NetConfig
    from mvster_tpu.utils.profiling import chain_latency

    model = MVS4Net(
        MVS4NetConfig.dtu_default(mono=True, compute_dtype=compute_dtype)
    )
    batch = _batch(512, 640, 5, with_gt=True, batch=2)
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
            batch["depth_values"], train=True,
        )
    )()
    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(
        model, tx, loss_kwargs=dict(inverse_depth=True, ot_iter=10, mono=True),
        jit=False,
    )

    def one_step(carry, st0, b):
        # chain_latency carries a scalar, so the chain serializes through the
        # batch perturbation rather than the state.  The returned scalar sums
        # a probe of the updated params so the optimizer update can't be
        # dead-code-eliminated (the adam math itself is the work measured).
        b2 = dict(b)
        b2["imgs"] = b["imgs"] + 1e-12 * carry
        new_state, scalars, _ = step(st0, b2)
        probe = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), new_state.params, jnp.float32(0.0)
        )
        return scalars["loss"] + 1e-30 * probe

    return chain_latency(one_step, state, batch, iters=iters)


def _probe_devices(timeout_s=600):
    """Bounded jax.devices() probe: the axon TPU tunnel's outage mode is an
    indefinite HANG (not an error), which would otherwise eat the whole
    driver budget.  Runs the probe in a daemon thread so a hang can't block
    process exit."""
    import threading

    result = {}

    def probe():
        try:
            result["devices"] = jax.devices()
        except Exception as e:  # UNAVAILABLE etc.
            result["error"] = f"{type(e).__name__}: {e}"[:300]

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return None, f"jax.devices() hung >{timeout_s}s (axon tunnel outage)"
    if "error" in result:
        return None, result["error"]
    return result["devices"], None


def main():
    devices, err = _probe_devices()
    if err is not None:
        # one valid JSON line even when the chip is unreachable, so the
        # driver records a diagnosable artifact instead of a timeout
        print(
            json.dumps(
                {
                    "metric": "dtu_mid_sec_per_view",
                    "value": None,
                    "unit": "s/view (512x640, 5 views, batch 1, forward only)",
                    "vs_baseline": None,
                    "error": f"TPU unreachable: {err}",
                }
            )
        )
        return
    print(f"devices: {devices}", file=sys.stderr)

    from mvster_tpu.models import MVS4Net, MVS4NetConfig
    from mvster_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    model = MVS4Net(MVS4NetConfig.dtu_default(mono=False))
    b0 = _batch(512, 640, 5)
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), b0["imgs"], b0["proj_matrices"],
            b0["depth_values"], train=False,
        )
    )()
    jax.block_until_ready(variables)

    _stamp("mid f32 forward")
    mid = bench_forward(model, variables, 512, 640, 5, iters=8)
    # raw eval size: max_h 1200 snaps to the 64-multiple 1152
    # (general_eval4.py:92-109)
    _stamp("raw f32 forward")
    raw = bench_forward(model, variables, 1152, 1600, 5, iters=4)

    extras = {
        "dtu_raw_sec_per_view": raw,
        "dtu_raw_vs_baseline": BASELINE_RAW_SEC_PER_VIEW / raw,
        "protocol": "chained fori_loop + scalar fetch; b8 via "
                    "state-threaded dispatch chain (BENCHNOTES.md)",
    }
    # bf16 compute mode at raw (TPU-native precision; the warp kernel runs
    # f32 behind a boundary upcast — models/mvs4net.py:_stage)
    try:
        model16 = MVS4Net(
            MVS4NetConfig.dtu_default(mono=False, compute_dtype="bfloat16")
        )
        _stamp("raw bf16 forward")
        raw16 = bench_forward(model16, variables, 1152, 1600, 5, iters=4)
        extras["dtu_raw_bf16_sec_per_view"] = raw16
        extras["dtu_raw_bf16_vs_baseline"] = BASELINE_RAW_SEC_PER_VIEW / raw16
        _stamp("mid bf16 forward")
        mid16 = bench_forward(model16, variables, 512, 640, 5, iters=8)
        extras["dtu_mid_bf16_sec_per_view"] = mid16
        extras["dtu_mid_bf16_vs_baseline"] = BASELINE_SEC_PER_VIEW / mid16
    except Exception as e:  # keep the headline if bf16 mode regresses
        extras["dtu_raw_bf16_error"] = f"{type(e).__name__}: {e}"[:200]

    _stamp("train step b2 f32")
    extras["train_step_ms_mid_b2"] = bench_train_step(iters=4) * 1e3
    _stamp("train step b2 bf16")
    try:
        extras["train_step_ms_mid_b2_bf16"] = (
            bench_train_step(iters=4, compute_dtype="bfloat16") * 1e3
        )
    except Exception as e:
        extras["train_step_ms_mid_b2_bf16_error"] = (
            f"{type(e).__name__}: {e}"[:200]
        )
    # batch-scaling anchors b1/b4/b8 (VERDICT r3 #5).  b8 runs as
    # grad_accum=2 x b4 microbatches: the monolithic b8 program is rejected
    # by this environment's XLA compile helper (HTTP 500 tpu_compile_helper
    # exit 1, BENCH_r03 extras) under BOTH wrapper protocols — that wall is
    # documented in BENCHNOTES.md; accumulation is the production answer.
    for key, fn in [
        ("train_step_ms_mid_b1", lambda: bench_train_step_threaded(1)),
        ("train_step_ms_mid_b4", lambda: bench_train_step_threaded(4)),
        ("train_step_ms_mid_b8_accum2",
         lambda: bench_train_step_threaded(8, grad_accum=2)),
    ]:
        try:
            _stamp(key)
            extras[key] = fn() * 1e3
        except Exception as e:
            extras[key + "_error"] = f"{type(e).__name__}: {e}"[:200]

    _stamp("done")
    print(
        json.dumps(
            {
                "metric": "dtu_mid_sec_per_view",
                "value": mid,
                "unit": "s/view (512x640, 5 views, batch 1, forward only)",
                "vs_baseline": BASELINE_SEC_PER_VIEW / mid,
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
