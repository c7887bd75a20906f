"""Profiling / tracing utilities.

Upgrades the reference's manual wall-clock + peak-GPU-memory instrumentation
(test_mvs4.py:157-166, 204-207; `--mode profile` is declared but raises
NotImplementedError at train_mvs4.py:428) to first-class tools:

  * `trace(logdir)` — context manager around `jax.profiler` producing
    TensorBoard-viewable device traces (the torch.profiler/NVTX equivalent).
  * `Timer` — `block_until_ready`-bracketed wall timer (dispatch-async-safe).
  * `device_memory_stats` — per-device HBM usage (peak GPU memory equivalent).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device results before stopping.

    with Timer() as t:
        out = step(...)
        t.block_on(out)
    print(t.elapsed)
    """

    def __enter__(self):
        self.start = time.perf_counter()
        self.elapsed = None
        return self

    def block_on(self, tree):
        jax.block_until_ready(tree)
        return tree

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


def chain_latency(
    make_scalar,
    *args,
    iters: int = 8,
    reps: int = 3,
    lo: int = 1,
) -> float:
    """True per-iteration device latency of `make_scalar`, in seconds.

    THE trustworthy timing protocol for this codebase.  Wall-clock +
    `block_until_ready` is NOT a valid measurement through the hosted axon
    runtime: executions whose outputs stay device-side complete
    asynchronously after block_until_ready returns, so the classic
    warmup/median loop measures dispatch (~25 us) rather than compute —
    that artifact produced the bogus round-1 "0.24 ms/view" headline
    (real value ~170 ms; see BENCHNOTES.md).  Two things force honesty:

      1. iterations chained by data dependency inside ONE jitted
         `lax.fori_loop` (no per-call dispatch, nothing elidable), and
      2. a scalar result fetched to the host (small outputs are returned
         eagerly, so the fetch blocks until the whole chain executed).

    `make_scalar(carry, *args)` must return a scalar that depends on all
    the compute being measured, and must feed `carry` (a f32 scalar) into
    its inputs (e.g. `x + 1e-12 * carry`) so iterations can't be hoisted
    or reordered.  The trip count is a traced argument: one compile,
    no unrolling.  Reported value is (T(iters) - T(lo)) / (iters - lo),
    minimum over `reps` repeats — fixed overheads (dispatch, input
    upload, result fetch) cancel in the subtraction.
    """
    import jax.numpy as jnp

    @jax.jit
    def chain(n, *a):
        def body(_, carry):
            return jnp.asarray(make_scalar(carry, *a), jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(jnp.int32(lo), *args))  # compile
    float(chain(jnp.int32(lo), *args))  # warm

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(jnp.int32(n), *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(iters) - timed(lo)) / (iters - lo)


def dispatch_chain_latency(
    step,
    state,
    *args,
    probe,
    n_lo: int = 2,
    n_hi: int = 6,
    reps: int = 3,
) -> float:
    """Per-step device latency of a state-threaded `step`, in seconds.

    The fallback protocol for programs too large for the `chain_latency`
    fori_loop wrapper (the XLA compile helper rejects the train step at
    batch >= 4 when wrapped in a traced-trip-count loop).  Honesty comes
    from the same two ingredients, realized differently:

      1. n dependent dispatches chained through the carried `state`
         (dispatch i+1 consumes dispatch i's output, so the device must
         run them serially), and
      2. `probe(state)` fetches a scalar from the FINAL state to the
         host, which cannot complete until the whole chain executed.

    Reported value is (T(n_hi) - T(n_lo)) / (n_hi - n_lo), min over reps:
    the subtraction cancels fixed overheads (upload, fetch), and the
    per-dispatch RPC (~25 us on this runtime) is negligible against the
    >100 ms steps this protocol exists for.  `step(state, *args) ->
    state` must be pre-jitted; `probe(state)` -> scalar array.
    """
    def run(n, st):
        for _ in range(n):
            st = step(st, *args)
        return float(probe(st))

    run(1, state)  # compile
    run(1, state)  # warm

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n, state)
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo)


def device_memory_stats(device=None) -> dict:
    """Bytes in use / peak / limit for a device (empty dict if unsupported)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats[k] for k in keys if k in stats}
