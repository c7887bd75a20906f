"""Where do raw-size convs lose the MXU? Achieved-FLOPs probe.

The raw component map (BENCHNOTES.md) shows FPN+reg2d = 242 ms of the
608 ms raw forward, ~20x above their naive FLOP floor.  Hypothesis: the
8-16 output-channel convs at full resolution utilize ~C/128 of the MXU
lanes.  This probe measures achieved TFLOP/s for single convs across
channel counts at the raw stage shapes, with the chained protocol.

(The space-to-depth rewrite rows this probe used to carry adjudicated
AGAINST s2d in round 4 — the isolated conv wins 1.9x but the in-model
A/B loses ~2x at every production size; verdict + data in BENCHNOTES.md,
module deleted.)

Usage: python scripts/probe_conv_eff.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mvster_tpu.utils.profiling import chain_latency


def conv_flops(h, w, k, cin, cout):
    return h * w * k * k * cin * cout * 2


def bench_conv(h, w, k, cin, cout, dtype=jnp.float32, iters=6):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, h, w, cin)), dtype)
    wt = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.1, dtype)

    def f(carry, x_, w_):
        y = jax.lax.conv_general_dilated(
            x_ + jnp.asarray(1e-12 * carry, dtype), w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.mean(y.astype(jnp.float32))

    t = chain_latency(f, x, wt, iters=iters)
    tf = conv_flops(h, w, k, cin, cout) / t / 1e12
    print(
        f"conv {k}x{k} {cin:4d}->{cout:4d} @ {h}x{w} {x.dtype.name}: "
        f"{t * 1e3:8.2f} ms  ({tf:6.2f} TF/s)"
    )
    return t


def bench_conv333(d, h, w, cin, cout, dtype=jnp.float32, iters=6):
    """The production reg2d aggregation conv: 3D NDHWC (3,3,3) SAME."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, d, h, w, cin)), dtype)
    wt = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, dtype)
    flops = d * conv_flops(h, w, 3, 3 * cin, cout)

    def f3d(carry, x_, w_):
        y = jax.lax.conv_general_dilated(
            x_ + jnp.asarray(1e-12 * carry, dtype), w_, (1, 1, 1),
            ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.mean(y.astype(jnp.float32))

    t = chain_latency(f3d, x, wt, iters=iters)
    print(
        f"conv333 {cin:3d}->{cout:3d} @ D{d} {h}x{w} {x.dtype.name}: "
        f"{t * 1e3:8.2f} ms ({flops / t / 1e12:5.2f} TF/s)"
    )
    return t


def main():
    h, w = 1152, 1600
    print(f"== channel sweep, 3x3 @ {h}x{w} f32 ==")
    for cin, cout in [(8, 8), (64, 8), (16, 16), (32, 32), (64, 64),
                      (128, 128)]:
        bench_conv(h, w, 3, cin, cout)
    print("== the raw hot convs, f32 vs bf16 ==")
    for hh, ww, ci, co in [
        (1152, 1600, 64, 8),   # raw FPN out4
        (576, 800, 64, 16),    # raw FPN out3
        (512, 640, 64, 8),     # mid FPN out4
    ]:
        bench_conv(hh, ww, 3, ci, co)
        bench_conv(hh, ww, 3, ci, co, dtype=jnp.bfloat16)
    print("== reg2d stage4 aggregation convs ==")
    for dd, hh, ww, ci, co in [
        (4, 512, 640, 8, 8),     # mid reg2d stage4 agg conv
        (4, 1152, 1600, 8, 8),   # raw reg2d stage4 agg conv
    ]:
        bench_conv333(dd, hh, ww, ci, co)
        bench_conv333(dd, hh, ww, ci, co, dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
