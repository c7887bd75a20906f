"""Predicted warp-kernel scan work for row-packed lane layouts.

The kernel's inner cost is (scan trips) x (lane-window vregs): every
output vreg scans rcnt source rows, gathering nk 128-lane windows per
row.  Packing rp output ROWS into each vreg (lanes = rp rows x D depths
x 128/(rp*D) columns) amortizes the per-scan fixed terms (depth spread,
bilinear +2) over rp rows at the cost of adding the rp-row drift to the
span; narrowing the column group also shrinks the epipolar-tilt term.
This probe computes, from the EXACT production plane-sweep coordinates
(same debug forward as probe_warp_pred.py), the total scan-trip x nk
work per layout so the kernel rework is driven by measured geometry.

Usage: python scripts/probe_row_pack.py [H W [V]]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
PADX = 128


def layout_work(x, y, h, w, rp, d):
    """Scan-work stats for lanes = (rp rows, d depths, pc cols).

    Returns (trips_per_pixel, mean_nk, feasible_fraction) where a trip is
    one 2-row-unrolled scan iteration of one output vreg and nk the
    lane-window width in vregs that vreg needs.
    """
    if 128 % (rp * d):
        return None
    pc = 128 // (rp * d)
    b, _, hh, ww = x.shape
    assert hh == h and ww >= w
    wo = -(-w // pc) * pc
    if wo != ww:
        x = np.pad(x, ((0, 0),) * 3 + ((0, wo - ww),), mode="edge")
        y = np.pad(y, ((0, 0),) * 3 + ((0, wo - ww),), mode="edge")
    nvr = h // rp          # vreg-rows
    nw = wo // pc          # column blocks
    x0 = np.floor(x)
    y0 = np.floor(y)
    rel = (x > -1) & (x < w) & (y > -1) & (y < h)
    # (B, D, NVR, RP, NW, PC) -> reduce over (D, RP, PC) = the packed lanes
    def blockify(v):
        return v.reshape(b, d, nvr, rp, nw, pc)

    inf = np.float32(np.inf)
    rel_b = blockify(rel)
    y_b = blockify(y0)
    x_b = blockify(x0)
    red = (1, 3, 5)
    ymin = np.min(np.where(rel_b, y_b, inf), axis=red)    # (B, NVR, NW)
    ymax = np.max(np.where(rel_b, y_b, -inf), axis=red)
    xmin = np.min(np.where(rel_b, x_b, inf), axis=red)
    xmax = np.max(np.where(rel_b, x_b + 1.0, -inf), axis=red)
    any_rel = rel_b.any(axis=red)
    rcnt = np.where(any_rel, ymax - ymin + 2.0, 0.0)
    xbase = np.floor((np.where(any_rel, xmin, 0.0) + PADX) / LANE) * LANE
    span = np.where(any_rel, xmax + PADX - xbase, 0.0)
    nk = np.ceil(np.maximum(span, 1.0) / LANE)
    trips = np.ceil(rcnt / 2.0)
    work = float((trips * nk).sum())
    pixels = h * w
    return (
        float(trips.sum()) / pixels * pc * 1.0,   # trips per (pc-col row)
        work / max(float(trips.sum()), 1.0),      # mean nk weighted by trips
        work / pixels,                            # work per output pixel
        float(rcnt.max()),
    )


def main(h=1152, w=1600, v=5):
    from helpers import synthetic_sample

    from mvster_tpu.core.geometry import plane_sweep_coords
    from mvster_tpu.core.hypothesis import (
        init_inverse_range,
        schedule_inverse_range,
    )
    from mvster_tpu.models import MVS4Net, MVS4NetConfig

    cfg = MVS4NetConfig.dtu_default(mono=False)
    model = MVS4Net(cfg)
    s = synthetic_sample(0, batch=1, nviews=v, h=h, w=w)
    imgs = jnp.asarray(s["imgs"])
    projs = {k: jnp.asarray(p) for k, p in s["proj_matrices"].items()}
    dvals = jnp.asarray(s["depth_values"])

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), imgs, projs, dvals,
                           train=False)
    )()
    out = jax.jit(
        lambda vs: model.apply(vs, imgs, projs, dvals, train=False,
                               return_debug=True)
    )(variables)

    prev = None
    for si in range(cfg.num_stage):
        st = out[f"stage{si + 1}"]
        feat, proj = st["debug_features"], st["debug_proj"]
        hs, ws = feat.shape[2], feat.shape[3]
        nd = cfg.stage_splits[si]
        if si == 0:
            hypo = init_inverse_range(dvals, nd, hs, ws)
        else:
            hypo = schedule_inverse_range(
                prev["inverse_min_depth"], prev["inverse_max_depth"],
                nd, hs, ws,
            )
        prev = st
        agg = {}
        for view in range(1, feat.shape[1]):
            x, y = plane_sweep_coords(proj[:, view], proj[:, 0], hypo)
            x, y = np.asarray(x), np.asarray(y)
            for rp in (1, 2, 4, 8):
                r = layout_work(x, y, hs, ws, rp, nd)
                if r is None:
                    continue
                agg.setdefault(rp, []).append(r)
        print(f"stage{si + 1} {hs}x{ws} D{nd}:")
        base = None
        for rp, rs in sorted(agg.items()):
            wpp = sum(r[2] for r in rs)
            base = base or wpp
            print(
                f"  rp={rp} pc={128 // (rp * nd):3d}: work/pixel "
                f"{wpp:7.3f} ({base / wpp:4.2f}x vs rp=1) | mean nk "
                f"{np.mean([r[1] for r in rs]):.2f} | max rcnt "
                f"{max(r[3] for r in rs):.0f}"
            )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
