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


def device_memory_stats(device=None) -> dict:
    """Bytes in use / peak / limit for a device (empty dict if unsupported)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats[k] for k in keys if k in stats}
