"""Per-layer reg2d time map at the stage-4 geometry: which layers own it?

The round-4 raw component map (BENCHNOTES.md) charges 71.3 ms (f32) /
54.4 ms (bf16) to reg2d at raw stage4 (input (1, 4, 1152, 1600, 4)).
Suspects: the full-res low-channel (1,3,3) convs (the MXU lane cliff)
and the TRANSPOSED convs, which run as input-dilated convolutions at the
OUTPUT resolution — 3/4 of their taps hit inserted zeros, so XLA pays
4x the useful FLOPs at the worst possible channel counts.  This probe
times every reg2d layer in isolation at its production shape (mirrors
nn/reg.Reg2d; reference reg2d /root/reference/models/mvs4net_utils.py:
870-923) and A/Bs each transpose conv against its polyphase
decomposition (4 sub-kernels at the INPUT resolution producing 4*cout
channels + depth_to_space — same math, dense taps, 4x the lanes).

Usage: python scripts/probe_reg_layers.py [H W] [--d N] [--cin N]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mvster_tpu.utils.profiling import chain_latency


def bench(name, fn, *args, flops=0, iters=6):
    t = chain_latency(fn, *args, iters=iters)
    tf = f" ({flops / t / 1e12:5.2f} TF/s)" if flops else ""
    print(f"  {name:42s} {t * 1e3:8.2f} ms{tf}")
    return t


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dims", nargs="*", type=int, metavar="H W")
    ap.add_argument("--d", type=int, default=4, help="depth hypotheses")
    ap.add_argument("--cin", type=int, default=4, help="cost-volume groups")
    ns = ap.parse_args()
    h, w = (ns.dims[0], ns.dims[1]) if len(ns.dims) >= 2 else (1152, 1600)
    d, cin, b = ns.d, ns.cin, 8
    rng = np.random.default_rng(0)
    print(f"reg2d per-layer map @ stage4 ({h}x{w} D{d} C{cin}), f32")

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape), jnp.float32)

    def conv133(x, wt, stride, carry):
        return jax.lax.conv_general_dilated(
            x + 1e-12 * carry, wt, (1, stride, stride),
            ((0, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def conv333(x, wt, carry):
        return jax.lax.conv_general_dilated(
            x + 1e-12 * carry, wt, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    total = 0.0
    # encoder path: (name, hin, win, cin, cout, stride)
    enc = [
        ("conv0 (1,3,3) 4->8 @/1", h, w, cin, b, 1),
        ("conv1 (1,3,3)s2 8->16 @/1->/2", h, w, b, 2 * b, 2),
        ("conv3 (1,3,3)s2 16->32 @/2->/4", h // 2, w // 2, 2 * b, 4 * b, 2),
        ("conv5 (1,3,3)s2 32->64 @/4->/8", h // 4, w // 4, 4 * b, 8 * b, 2),
    ]
    for name, hi, wi, ci, co, s in enc:
        x = arr(1, d, hi, wi, ci)
        wt = arr(1, 3, 3, ci, co) * 0.1
        fl = d * (hi // s) * (wi // s) * 9 * ci * co * 2
        total += bench(name, lambda c, x_, w_: jnp.mean(conv133(x_, w_, s, c)),
                       x, wt, flops=fl)

    # aggregation blocks: full (3,3,3) convs
    agg = [
        ("conv2 (3,3,3) 16->16 @/2", h // 2, w // 2, 2 * b),
        ("conv4 (3,3,3) 32->32 @/4", h // 4, w // 4, 4 * b),
        ("conv6 (3,3,3) 64->64 @/8", h // 8, w // 8, 8 * b),
    ]
    for name, hi, wi, ci in agg:
        x = arr(1, d, hi, wi, ci)
        wt = arr(3, 3, 3, ci, ci) * 0.1
        fl = d * hi * wi * 27 * ci * ci * 2
        total += bench(name, lambda c, x_, w_: jnp.mean(conv333(x_, w_, c)),
                       x, wt, flops=fl)

    # transpose convs, production form (input-dilated at output res) vs
    # polyphase decomposition (sub-kernels at input res + depth_to_space)
    tr = [
        ("conv7^T 64->32 @/8->/4", h // 8, w // 8, 8 * b, 4 * b),
        ("conv9^T 32->16 @/4->/2", h // 4, w // 4, 4 * b, 2 * b),
        ("conv11^T 16->8 @/2->/1", h // 2, w // 2, 2 * b, b),
    ]
    for name, hi, wi, ci, co in tr:
        x = arr(1, d, hi, wi, ci)
        wt = arr(1, 3, 3, ci, co) * 0.1
        fl = d * 2 * hi * 2 * wi * 9 * ci * co * 2  # paid taps incl. zeros

        def f_dil(c, x_, w_):
            y = jax.lax.conv_general_dilated(
                x_ + 1e-12 * c, w_, (1, 1, 1),
                ((0, 0), (1, 2), (1, 2)), lhs_dilation=(1, 2, 2),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return jnp.mean(y)

        total += bench(name + " [dilated]", f_dil, x, wt, flops=fl)

        # polyphase: out[2i+oi] taps input rows i+si where the flipped
        # kernel tap k = 1 + 2*si - oi is in range — exactly 2 taps for
        # oi=1 ((si,k) = (0,0),(1,2)) and 1 tap for oi=0 (k=1).  As one
        # dense conv: 2x2 VALID kernel over x padded by one row/col at
        # the END, sub-kernel (si,sj,oi,oj) = w[1+2si-oi, 1+2sj-oj] (zero
        # when out of range), emitting 4*cout channels -> depth_to_space.
        kb = np.zeros((1, 2, 2, ci, 4 * co), np.float32)
        wnp = np.asarray(wt)
        for oi in range(2):
            for oj in range(2):
                for si in range(2):
                    for sj in range(2):
                        ki, kj = 1 + 2 * si - oi, 1 + 2 * sj - oj
                        if 0 <= ki <= 2 and 0 <= kj <= 2:
                            kb[0, si, sj, :, (oi * 2 + oj) * co:(oi * 2 + oj + 1) * co] = (
                                wnp[0, ki, kj]
                            )
        kbj = jnp.asarray(kb)

        def f_poly(c, x_, w_):
            xp = jnp.pad(x_ + 1e-12 * c,
                         ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp, w_, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )  # (1, d, hi, wi, 4*co)
            b_, d_, hh, ww, _ = y.shape
            y = y.reshape(b_, d_, hh, ww, 2, 2, co)
            y = jnp.transpose(y, (0, 1, 2, 4, 3, 5, 6))
            return jnp.mean(y.reshape(b_, d_, 2 * hh, 2 * ww, co))

        bench(name + " [polyphase]", f_poly, x, kbj,
              flops=d * hi * wi * 4 * ci * 4 * co * 2)

        # numerics: polyphase must equal the dilated form
        ya = f_dil(0.0, x, wt)
        # recompute without the mean for comparison
        y_dil = jax.lax.conv_general_dilated(
            x, wt, (1, 1, 1), ((0, 0), (1, 2), (1, 2)),
            lhs_dilation=(1, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        y_p = jax.lax.conv_general_dilated(
            xp, kbj, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        b_, d_, hh, ww, _ = y_p.shape
        y_p = jnp.transpose(
            y_p.reshape(b_, d_, hh, ww, 2, 2, co), (0, 1, 2, 4, 3, 5, 6)
        ).reshape(b_, d_, 2 * hh, 2 * ww, co)
        err = float(jnp.max(jnp.abs(y_p - y_dil)))
        rng_ = float(jnp.max(jnp.abs(y_dil)))
        print(f"    polyphase parity: max|d| = {err:.2e} (range {rng_:.2e})")
        del ya

    # prob head: 1x1x1 8->1 at full res
    x = arr(1, d, h, w, b)
    wt = arr(1, 1, 1, b, 1) * 0.1
    total += bench("prob (1,1,1) 8->1 @/1",
                   lambda c, x_, w_: jnp.mean(conv333(x_, w_, c)), x, wt,
                   flops=d * h * w * b * 2)

    print(f"  SUM of isolated [dilated] layers    {total * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
