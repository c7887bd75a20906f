"""Where do raw-size convs lose the MXU? Achieved-FLOPs probe.

The raw component map (BENCHNOTES.md) shows FPN+reg2d = 242 ms of the
608 ms raw forward, ~20x above their naive FLOP floor.  Hypothesis: the
8-16 output-channel convs at full resolution utilize ~C/128 of the MXU
lanes.  This probe measures achieved TFLOP/s for single convs across
channel counts and for space-to-depth (f=2) weight-equivalent rewrites,
at the raw stage-4 shape, with the chained protocol.

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


def bench_s2d(h, w, cin, cout, f=2, k=3, dtype=jnp.float32, iters=6):
    """Equivalent conv on space-to-depth blocks: input (H/f, W/f, cin*f^2),
    kernel kb = ceil((k+f-1)/f), output (H/f, W/f, cout*f^2)."""
    kb = -(-(k + f - 1) // f)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, h // f, w // f, cin * f * f)), dtype)
    wt = jnp.asarray(
        rng.normal(size=(kb, kb, cin * f * f, cout * f * f)) * 0.1, dtype
    )

    def fn(carry, x_, w_):
        y = jax.lax.conv_general_dilated(
            x_ + jnp.asarray(1e-12 * carry, dtype), w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.mean(y.astype(jnp.float32))

    t = chain_latency(fn, x, wt, iters=iters)
    useful = conv_flops(h, w, k, cin, cout)
    paid = conv_flops(h // f, w // f, kb, cin * f * f, cout * f * f)
    print(
        f"s2d{f} conv {k}x{k} {cin:4d}->{cout:4d} @ {h}x{w} {x.dtype.name} "
        f"(pays {kb}x{kb} {cin * f * f}->{cout * f * f}): {t * 1e3:8.2f} ms "
        f"(useful {useful / t / 1e12:6.2f} TF/s, paid {paid / t / 1e12:6.2f})"
    )
    return t


def bench_s2d_real(h, w, cin, cout, k=3, dtype=jnp.float32, iters=6):
    """The PRODUCTION s2d path (nn/s2d.conv3x3_s2d), including the pad /
    space-to-depth / depth-to-space transposes that bench_s2d excludes —
    those are full-tensor bandwidth ops and dominate at small sizes."""
    from mvster_tpu.nn.s2d import conv3x3_s2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, h, w, cin)), dtype)
    wt = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.1, dtype)

    def fn(carry, x_, w_):
        y = conv3x3_s2d(x_ + jnp.asarray(1e-12 * carry, dtype), w_)
        return jnp.mean(y.astype(jnp.float32))

    t = chain_latency(fn, x, wt, iters=iters)
    tf = conv_flops(h, w, k, cin, cout) / t / 1e12
    print(
        f"s2dREAL conv {k}x{k} {cin:4d}->{cout:4d} @ {h}x{w} {x.dtype.name}"
        f" (incl. transforms): {t * 1e3:8.2f} ms  (useful {tf:6.2f} TF/s)"
    )
    return t


def bench_conv333_pair(d, h, w, cin, cout, dtype=jnp.float32, iters=6):
    """The PRODUCTION reg2d aggregation pair: 3D NDHWC (3,3,3) SAME conv
    vs nn/s2d.conv333_s2d on the real (B, D, H, W, C) shape — the A/B that
    actually places S2D_MIN_PIXELS for the reg2d rows (ADVICE r3)."""
    from mvster_tpu.nn.s2d import conv333_s2d

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

    def fs2d(carry, x_, w_):
        y = conv333_s2d(x_ + jnp.asarray(1e-12 * carry, dtype), w_)
        return jnp.mean(y.astype(jnp.float32))

    t0 = chain_latency(f3d, x, wt, iters=iters)
    t1 = chain_latency(fs2d, x, wt, iters=iters)
    print(
        f"conv333 {cin:3d}->{cout:3d} @ D{d} {h}x{w} {x.dtype.name}: "
        f"direct3d {t0 * 1e3:8.2f} ms ({flops / t0 / 1e12:5.2f} TF/s) | "
        f"s2dREAL {t1 * 1e3:8.2f} ms ({flops / t1 / 1e12:5.2f} TF/s)"
    )
    return t0, t1


def main():
    h, w = 1152, 1600
    print(f"== channel sweep, 3x3 @ {h}x{w} f32 ==")
    for cin, cout in [(8, 8), (64, 8), (16, 16), (32, 32), (64, 64),
                      (128, 128)]:
        bench_conv(h, w, 3, cin, cout)
    print("== the two raw hot convs, f32 vs s2d2/s2d4 ==")
    bench_conv(h, w, 3, 64, 8)                 # FPN out4
    bench_s2d(h, w, 64, 8, f=2)
    bench_s2d(h, w, 64, 8, f=4)
    bench_conv(h // 2, w // 2, 3, 64, 16)      # FPN out3
    bench_s2d(h // 2, w // 2, 64, 16, f=2)
    print("== bf16 variants ==")
    bench_conv(h, w, 3, 64, 8, dtype=jnp.bfloat16)
    bench_s2d(h, w, 64, 8, f=2, dtype=jnp.bfloat16)
    bench_s2d(h, w, 64, 8, f=4, dtype=jnp.bfloat16)
    print("== mid-size shapes (S2D_MIN_PIXELS tuning) ==")
    # The round-3 mid map regressed FPN 18.5 -> 38.5 ms with s2d routed at
    # mid sizes; measure exactly the mid FPN/reg2d shapes to place the
    # pixel threshold between the win and loss regions.
    for hh, ww, ci, co in [
        (512, 640, 64, 8),    # mid FPN out4
        (256, 320, 64, 16),   # mid FPN out3
        (576, 800, 64, 16),   # raw FPN out3
    ]:
        bench_conv(hh, ww, 3, ci, co)
        bench_s2d_real(hh, ww, ci, co)
        bench_conv(hh, ww, 3, ci, co, dtype=jnp.bfloat16)
        bench_s2d_real(hh, ww, ci, co, dtype=jnp.bfloat16)
    # reg2d stage4 rows: the production pair is the 3D NDHWC conv vs
    # conv333_s2d on the real (B, D, H, W, C) shape (ADVICE r3) — the
    # folded-batch 2D proxy above mis-prices both sides.
    for dd, hh, ww, ci, co in [
        (4, 512, 640, 8, 8),     # mid reg2d stage4 agg conv
        (4, 1152, 1600, 8, 8),   # raw reg2d stage4 agg conv
    ]:
        bench_conv333_pair(dd, hh, ww, ci, co)
        bench_conv333_pair(dd, hh, ww, ci, co, dtype=jnp.bfloat16)
    print("== does s2d still pay at cout=32? (S2D_MAX_COUT tuning) ==")
    # reg2d conv4/conv7 and FPN conv2 run 32-channel 3x3s at 288x400-576x800;
    # if s2d wins here too, raise nn/s2d.py:S2D_MAX_COUT to 32.
    for hh, ww in [(576, 800), (288, 400)]:
        bench_conv(hh, ww, 3, 32, 32)
        bench_s2d(hh, ww, 32, 32, f=2)
        bench_conv(hh, ww, 3, 32, 32, dtype=jnp.bfloat16)
        bench_s2d(hh, ww, 32, 32, f=2, dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
