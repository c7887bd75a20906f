"""Per-layer FPN time map at raw size: which convs own the 144 ms?

The raw component map (BENCHNOTES.md) attributes 144.6 ms of the 563 ms
raw forward to FPN4 (5 views).  The paper floor for those FLOPs is
11.8 ms (scripts/roofline_raw.py), so ~12x is lost somewhere inside —
this probe times each encoder/lateral/out layer in isolation with the
chained protocol (utils/profiling.chain_latency) at the layer's real
production shape (views folded into batch, exactly as the cascade runs
it), so the sum reconciles against the component map's FPN row and the
cliff layers can be attacked individually instead of by guesswork.

Layer list mirrors nn/fpn.FPN4 (reference FPN4,
/root/reference/models/mvs4net_utils.py:419-502).

Usage: python scripts/probe_fpn_layers.py [H W V]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mvster_tpu.core.sampling import resize_bilinear_align_corners
from mvster_tpu.utils.profiling import chain_latency


def bench(name, fn, *args, flops=0, iters=6):
    t = chain_latency(fn, *args, iters=iters)
    tf = f" ({flops / t / 1e12:5.2f} TF/s)" if flops else ""
    print(f"  {name:34s} {t * 1e3:8.2f} ms{tf}")
    return t


def conv_flops(h, w, k, cin, cout):
    return h * w * k * k * cin * cout * 2


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    h, w = (int(argv[0]), int(argv[1])) if len(argv) >= 2 else (1152, 1600)
    v = int(argv[2]) if len(argv) >= 3 else 5
    b = 8  # base_channels
    bv = v  # batch 1 x views folded
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape), jnp.float32)

    def conv(x, wt, stride=1, carry=0.0):
        return jax.lax.conv_general_dilated(
            x + 1e-12 * carry, wt, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def bn_relu(y):
        # BN folds to scale+shift at inference; keep the elementwise tail
        # so fusion behavior matches the model.
        return jnp.maximum(y * 1.01 + 0.01, 0.0)

    total = 0.0
    print(f"FPN4 per-layer map @ {h}x{w}, {v} views folded into batch, f32")

    # encoder: (name, hin, win, cin, cout, k, stride)
    enc = [
        ("conv0_0", h, w, 3, b, 3, 1),
        ("conv0_1", h, w, b, b, 3, 1),
        ("conv1_0", h, w, b, 2 * b, 5, 2),
        ("conv1_1", h // 2, w // 2, 2 * b, 2 * b, 3, 1),
        ("conv1_2", h // 2, w // 2, 2 * b, 2 * b, 3, 1),
        ("conv2_0", h // 2, w // 2, 2 * b, 4 * b, 5, 2),
        ("conv2_1", h // 4, w // 4, 4 * b, 4 * b, 3, 1),
        ("conv2_2", h // 4, w // 4, 4 * b, 4 * b, 3, 1),
        ("conv3_0", h // 4, w // 4, 4 * b, 8 * b, 5, 2),
        ("conv3_1", h // 8, w // 8, 8 * b, 8 * b, 3, 1),
        ("conv3_2", h // 8, w // 8, 8 * b, 8 * b, 3, 1),
    ]
    for name, hi, wi, ci, co, k, s in enc:
        x = arr(bv, hi, wi, ci)
        wt = arr(k, k, ci, co) * 0.1

        def f(carry, x_, w_, s=s):
            return jnp.mean(bn_relu(conv(x_, w_, s, carry)))

        total += bench(
            f"{name} {k}x{k}s{s} {ci}->{co} @{hi}x{wi}", f, x, wt,
            flops=conv_flops(hi // s, wi // s, k, ci, co),
        )

    # laterals + top-down: inner 1x1 at each level, bilinear up, add
    final = 8 * b
    lat = [
        ("out1 1x1 64->64 @/8", h // 8, w // 8, 8 * b, 8 * b, 1),
        ("inner1 1x1 32->64 @/4", h // 4, w // 4, 4 * b, final, 1),
        ("inner2 1x1 16->64 @/2", h // 2, w // 2, 2 * b, final, 1),
        ("inner3 1x1 8->64 @/1", h, w, b, final, 1),
    ]
    for name, hi, wi, ci, co, k in lat:
        x = arr(bv, hi, wi, ci)
        wt = arr(k, k, ci, co) * 0.1

        def f(carry, x_, w_):
            return jnp.mean(conv(x_, w_, 1, carry))

        total += bench(name, f, x, wt,
                       flops=conv_flops(hi, wi, k, ci, co))

    # bilinear align-corners upsamples of the 64ch intra maps
    for name, hi, wi in [
        ("up /8->/4 64ch", h // 8, w // 8),
        ("up /4->/2 64ch", h // 4, w // 4),
        ("up /2->/1 64ch", h // 2, w // 2),
    ]:
        x = arr(bv, hi, wi, final)

        def f(carry, x_):
            y = resize_bilinear_align_corners(x_ + 1e-12 * carry,
                                              hi * 2, wi * 2)
            return jnp.mean(y)

        total += bench(name, f, x)

    # out heads (plain 3x3 convs; the s2d rewrite was deleted in round 4
    # after the in-model A/B verdict — BENCHNOTES.md)
    outs = [
        ("out2 3x3 64->32 @/4", h // 4, w // 4, final, 4 * b),
        ("out3 3x3 64->16 @/2", h // 2, w // 2, final, 2 * b),
        ("out4 3x3 64->8 @/1", h, w, final, b),
    ]
    for name, hi, wi, ci, co in outs:
        x = arr(bv, hi, wi, ci)
        wt = arr(3, 3, ci, co) * 0.1

        def f(carry, x_, w_):
            return jnp.mean(conv(x_, w_, 1, carry))

        total += bench(name, f, x, wt,
                       flops=conv_flops(hi, wi, 3, ci, co))

    # fused tail at full res: up + add-lateral + out4 as ONE jit body —
    # measures what XLA fusion buys over the isolated pieces.  Run at 2
    # views, not 5: the chained-latency wrapper holds two carry copies of
    # every argument and the 5-view raw tail OOMed HBM (16.04 G > 15.75 G
    # in the 2026-08-19 r4d run); scale the printed ms by 2.5 to compare
    # against the 5-view isolated rows.
    bt = 2
    xi = arr(bt, h // 2, w // 2, final)
    lat3 = arr(bt, h, w, final)
    w4 = arr(3, 3, final, b) * 0.1

    def tail(carry, x_, l_, w_):
        intra = resize_bilinear_align_corners(x_ + 1e-12 * carry, h, w) + l_
        return jnp.mean(conv(intra, w_))

    bench("FUSED up+add+out4 @/1 (2v)", tail, xi, lat3, w4,
          flops=conv_flops(h, w, 3, final, b))

    # same with an optimization barrier after the add: round-4 measured
    # the fused subgraph SLOWER than its isolated parts (81.6 vs 63 ms at
    # raw) — hypothesis: XLA fuses the upsample stencil INTO the conv
    # input, recomputing it per conv-window tap.  The barrier forces the
    # upsampled sum to materialize first.
    def tail_bar(carry, x_, l_, w_):
        intra = resize_bilinear_align_corners(x_ + 1e-12 * carry, h, w) + l_
        intra = jax.lax.optimization_barrier(intra)
        return jnp.mean(conv(intra, w_))

    bench("BARRIER up+add | out4 @/1 (2v)", tail_bar, xi, lat3, w4,
          flops=conv_flops(h, w, 3, final, b))

    # bandwidth anchor: a pure elementwise copy at the full-res 64ch
    # shape — the speed-of-light reference for every stencil/upsample row
    xb64 = arr(bv, h, w, final)
    bench("ANCHOR copy @/1 64ch (x*1.0001)",
          lambda carry, x_: jnp.mean(x_ * (1.0001 + 1e-12 * carry)), xb64)

    print(f"  {'SUM of isolated layers':34s} {total * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
