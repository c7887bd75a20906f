"""W-phase-packed convolution probe: the lane-cliff attack without transposes.

The FPN layer map (BENCHNOTES r4e) shows the low-channel full-res convs run
the MXU at 0.4-0.7 TF/s: out4 3x3 64->8 @1152x1600 = 23.7 ms, inner3 1x1
8->64 = 5.1 ms, conv0_1 3x3 8->8 = 4.4 ms.  The s2d rewrite (deleted, r4)
proved the utilization win is real in isolation but its 2x2 block packing
needed pad/transpose chains that cost ~2x the win in-model.

W-only phase packing has NO such chains: in channels-last row-major,
(H, W, C) -> (H, W/4, 4C) is an adjacent-dim merge — a free view — and a
conv emitting 4 output W-phases as channel groups [p0c0..p0c7, p1c0, ...]
views back to (H, W, C) for free.  Three formulations, all arithmetic-exact:

  * out-packed (co-starved convs, e.g. 64->8): stride-(1,4) conv with a
    width-6 kernel K6[ky, j, ci, p*co+c] = K[ky, j-p, ci, c] (0<=j-p<=2),
    input padded W (1,1).  2x MACs, 4x output lanes.
  * in-packed (ci-starved 1x1, e.g. 8->64): input viewed (H, W/4, 4ci),
    kernel (1,1,4ci,4co) block-diagonal.  4x MACs, 4x K and lanes.
  * both-packed (3x3 tiny ci and co): input viewed (H, W/4, 4ci), kernel
    (3,3,4ci,4co) with phase-band structure (chunk offsets -1,0,+1).
    4x MACs, 4x K and lanes.

Parity is asserted on every row before timing.  Run on TPU:
    python scripts/probe_wpack.py            # raw-size rows
    python scripts/probe_wpack.py 512 640    # mid-size rows
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def wpack_out_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, ci, co) -> (3, 6, ci, 4*co) stride-4 output-phase kernel."""
    kh, kw, ci, co = k.shape
    assert kw == 3
    cols = []
    for j in range(6):
        phases = []
        for p in range(4):
            if 0 <= j - p <= 2:
                phases.append(k[:, j - p])
            else:
                phases.append(jnp.zeros_like(k[:, 0]))
        cols.append(jnp.concatenate(phases, axis=-1))  # (3, ci, 4co)
    return jnp.stack(cols, axis=1)  # (3, 6, ci, 4co)


def conv_wpack_out(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv via stride-4 output-phase packing; free output view."""
    b, h, w, ci = x.shape
    co = k.shape[-1]
    k6 = wpack_out_kernel(k)
    y = jax.lax.conv_general_dilated(
        x, k6, (1, 4), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W/4, 4co)
    return y.reshape(b, h, w, co)


def wpack_in_kernel_1x1(k: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, ci, co) -> (1, 1, 4ci, 4co) block-diagonal phase kernel."""
    ci, co = k.shape[2], k.shape[3]
    eye = jnp.eye(4, dtype=k.dtype)
    out = jnp.einsum("ab,io->aibo", eye, k[0, 0])
    return out.reshape(1, 1, 4 * ci, 4 * co)


def conv_wpack_in_1x1(x: jnp.ndarray, k: jnp.ndarray, bias=None) -> jnp.ndarray:
    """1x1 conv with input AND output W-phase packed; both views free."""
    b, h, w, ci = x.shape
    co = k.shape[-1]
    xp = x.reshape(b, h, w // 4, 4 * ci)
    y = jax.lax.conv_general_dilated(
        xp, wpack_in_kernel_1x1(k), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, 4)
    return y.reshape(b, h, w, co)


def wpack_both_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, ci, co) -> (3, 3, 4ci, 4co) chunk-space phase-band kernel.

    Output phase p (column 4q+p) reads input columns 4q+p-1..4q+p+1;
    input column u = 4(q+dq)+a contributes via chunk offset dq in
    {-1,0,+1} when 4dq + a - p is in [-1, 1] (kernel tap kx = 4dq+a-p+1).
    """
    kh, kw, ci, co = k.shape
    assert kw == 3
    chunks = []
    for dq in (-1, 0, 1):
        blocks = jnp.zeros((kh, 4 * ci, 4 * co), k.dtype)
        for a in range(4):       # input phase
            for p in range(4):   # output phase
                kx = 4 * dq + a - p + 1
                if 0 <= kx <= 2:
                    blocks = blocks.at[
                        :, a * ci:(a + 1) * ci, p * co:(p + 1) * co
                    ].set(k[:, kx])
        chunks.append(blocks)
    return jnp.stack(chunks, axis=1)  # (3, 3, 4ci, 4co)


def conv_wpack_both(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv with input and output W-phase packed; free views."""
    b, h, w, ci = x.shape
    co = k.shape[-1]
    xp = x.reshape(b, h, w // 4, 4 * ci)
    y = jax.lax.conv_general_dilated(
        xp, wpack_both_kernel(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, h, w, co)


def direct(x, k, stride=1):
    pad = (k.shape[0] // 2, k.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [pad, (k.shape[1] // 2, k.shape[1] // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def check_parity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 8)), jnp.float32)
    k38 = jnp.asarray(rng.normal(size=(3, 3, 8, 8)), jnp.float32)
    k364 = jnp.asarray(rng.normal(size=(3, 3, 64, 8)), jnp.float32)
    x64 = jnp.asarray(rng.normal(size=(1, 16, 32, 64)), jnp.float32)
    k1 = jnp.asarray(rng.normal(size=(1, 1, 8, 64)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(64,)), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(conv_wpack_out(x64, k364)), np.asarray(direct(x64, k364)),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(conv_wpack_in_1x1(x, k1, b1)),
        np.asarray(direct(x, k1) + b1), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(conv_wpack_both(x, k38)), np.asarray(direct(x, k38)),
        atol=1e-4,
    )
    print("parity OK (out-packed, in-packed 1x1, both-packed)")


def main():
    check_parity()
    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) >= 3 else (1152, 1600)
    v = 5
    from mvster_tpu.utils.profiling import chain_latency

    rng = np.random.default_rng(1)

    def bench(name, fn, x, k, flops):
        t = chain_latency(
            lambda carry, kk, xx: jnp.mean(fn(xx + 1e-12 * carry, kk)),
            k, x, iters=6,
        )
        print(f"  {name:44s} {t * 1e3:8.2f} ms ({flops / t / 1e12:5.2f} TF/s)")
        return t

    rows = [
        # (label, ci, co, ksize, maker-pairs)
        ("out4 3x3 64->8", 64, 8, 3,
         [("direct", direct), ("wpack_out", conv_wpack_out)]),
        ("conv0_1 3x3 8->8", 8, 8, 3,
         [("direct", direct), ("wpack_both", conv_wpack_both),
          ("wpack_out", conv_wpack_out)]),
        ("inner3 1x1 8->64", 8, 64, 1,
         [("direct", direct),
          ("wpack_in", lambda x, k: conv_wpack_in_1x1(x, k))]),
        ("out3 3x3 64->16 @/2", 64, 16, 3,
         [("direct", direct), ("wpack_out", conv_wpack_out)]),
    ]
    for label, ci, co, ks, impls in rows:
        hh, ww = (h, w) if "@/2" not in label else (h // 2, w // 2)
        x = jnp.asarray(rng.normal(size=(v, hh, ww, ci)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(ks, ks, ci, co)), jnp.float32)
        flops = 2.0 * v * hh * ww * ks * ks * ci * co
        print(f"{label} @{hh}x{ww}:")
        for name, fn in impls:
            bench(name, fn, x, k, flops)


if __name__ == "__main__":
    main()
