"""Benchmark: the warp+group-correlation hot op, XLA vs Pallas, vs speed of light.

Per-stage shapes of DTU-mid (512x640) and DTU-raw (1152x1600) inference
(batch 1, one source view) — the op behind the reference's homo_warping +
group correlation (mvs4net_utils.py:13-59, 1036-1040).

For each shape, reports:
  * XLA fused gather path latency (kernels/cost_volume.py)
  * the HBM speed-of-light bound for the op's irreducible traffic
    (read src + ref once, write the (D, H, W, G) volume once; the
    (D, H, W, C) warped intermediate counts only if materialized)
  * the Pallas kernel (kernels/pallas_warp.py — production inference path,
    5-12x the XLA gather at every stage)

The committed results table lives in kernels/pallas_warp.py's docstring.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mvster_tpu.kernels.cost_volume import correlate, warp_src_feature
from mvster_tpu.kernels.pallas_warp import warp_correlate_pallas

# H, W, C, D, G per cascade stage
MID_STAGES = {
    "mid-stage1": (64, 80, 64, 8, 8),
    "mid-stage2": (128, 160, 32, 8, 8),
    "mid-stage3": (256, 320, 16, 4, 4),
    "mid-stage4": (512, 640, 8, 4, 4),
}
RAW_STAGES = {
    "raw-stage1": (144, 200, 64, 8, 8),
    "raw-stage2": (288, 400, 32, 8, 8),
    "raw-stage3": (576, 800, 16, 4, 4),
    "raw-stage4": (1152, 1600, 8, 4, 4),
}

# v5e HBM ~ 819 GB/s; override with --bw <GB/s> for other chips
HBM_GBPS = 819.0


def timeit(fn, variants, iters=8):
    """True per-call device latency via the chained protocol.

    Wall-clock + block_until_ready is invalid through the hosted axon
    runtime (async completion / elided repeats measure the ~25 us dispatch
    RPC, not the kernel) — see BENCHNOTES.md.  The source operand is
    perturbed by the chain carry; coordinates stay loop-invariant, which
    matches production (the gather is the measured op, the coordinate math
    is ~1% of it and hoisting it is what XLA does in the real model too)."""
    from mvster_tpu.utils.profiling import chain_latency

    src, ref, x, y = variants[0]

    def one(carry, s, r, xx, yy):
        return jnp.mean(fn(s + 1e-12 * carry, r, xx, yy))

    return chain_latency(one, src, ref, x, y, iters=iters)


def sol_us(h, w, c, d, g, fused: bool) -> float:
    """HBM speed-of-light for the op in microseconds (f32).

    fused: src+ref read once, cor volume written once.
    unfused: adds a round trip of the (D, H, W, C) warped intermediate.
    """
    n = h * w
    traffic = 4 * (2 * c * n + d * n * g)  # src+ref in, cor out
    if not fused:
        traffic += 2 * 4 * d * n * c  # warped write + read
    return traffic / (HBM_GBPS * 1e9) * 1e6


def make_variants(h, w, c, d, n=1, seed=0):
    rng = np.random.default_rng(seed)
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = []
    for i in range(n):
        src = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
        ref = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
        x = np.stack(
            [gx + (3.0 + 0.1 * i) * k for k in range(d)]
        )[None].astype(np.float32)
        y = np.stack(
            [gy + (0.5 + 0.05 * i) * k for k in range(d)]
        )[None].astype(np.float32)
        out.append((src, ref, jnp.asarray(x), jnp.asarray(y)))
    return out


def main():
    rows = []
    for name, (h, w, c, d, g) in {**MID_STAGES, **RAW_STAGES}.items():
        variants = make_variants(h, w, c, d)
        src, ref, x, y = variants[0]

        def _xla(s, r, xx, yy):
            from mvster_tpu.core.sampling import grid_sample_zeros

            return correlate(grid_sample_zeros(s, xx, yy), r, True, g)

        xla_fn = jax.jit(_xla)
        a = xla_fn(src, ref, x, y)
        t_x = timeit(xla_fn, variants) * 1e6
        sol_f = sol_us(h, w, c, d, g, fused=True)
        sol_u = sol_us(h, w, c, d, g, fused=False)

        pls_fn = jax.jit(
            lambda s, r, xx, yy: warp_correlate_pallas(s, r, xx, yy, g)
        )
        try:
            b = np.asarray(pls_fn(src, ref, x, y))
            err = np.abs(np.asarray(a) - b).max()
            t_p = timeit(pls_fn, variants) * 1e6
            pallas = f"{t_p:8.1f} us (max-err {err:.2e})"
        except Exception as e:
            pallas = f"unavailable ({type(e).__name__}: {str(e)[:120]})"

        # rp sweep: the measured table that places _row_pack's thresholds
        # (VERDICT r3: the h>=384 -> rp=4 guess was negative at mid stage4)
        rp_cells = []
        if "--rp-sweep" in sys.argv:
            for rp in (1, 2, 4):
                if 128 % (rp * d) or h % (8 * rp):
                    continue
                fn = jax.jit(
                    lambda s, r, xx, yy, rp=rp: warp_correlate_pallas(
                        s, r, xx, yy, g, force_rp=rp
                    )
                )
                try:
                    br, pr = jax.jit(
                        lambda s, r, xx, yy, rp=rp: warp_correlate_pallas(
                            s, r, xx, yy, g, force_rp=rp, return_pred=True
                        )
                    )(src, ref, x, y)
                    if not bool(pr):
                        rp_cells.append(f"rp{rp} infeasible")
                        continue
                    e2 = np.abs(np.asarray(a) - np.asarray(br)).max()
                    t2 = timeit(fn, variants) * 1e6
                    rp_cells.append(f"rp{rp} {t2:7.1f} us (err {e2:.1e})")
                except Exception as e:
                    rp_cells.append(f"rp{rp} error {type(e).__name__}")

        rows.append((name, h, w, c, d, t_x, sol_f, sol_u, pallas))
        print(
            f"{name:11s} ({h:4d}x{w:4d} C{c:2d} D{d}): xla {t_x:8.1f} us | "
            f"SoL fused {sol_f:6.1f} us / unfused {sol_u:6.1f} us | "
            f"xla/SoL-fused {t_x / sol_f:4.2f}x | pallas {pallas}"
        )
        if rp_cells:
            print(f"{'':11s}  rp sweep: " + " | ".join(rp_cells))

    total_mid = sum(r[5] for r in rows if r[0].startswith("mid"))
    total_raw = sum(r[5] for r in rows if r[0].startswith("raw"))
    print(f"\nper-view totals: mid {total_mid:.1f} us, raw {total_raw:.1f} us")


if __name__ == "__main__":
    main()
