"""Diagnose the pallas-warp fallback: per-stage/view window_meta feasibility.

Runs a debug forward on the bench geometry (tests/helpers.synthetic_sample),
recomputes each stage's plane-sweep coordinates from the returned debug
features/projections + hypothesis schedule, and reports window_meta's
feasibility predicate and the violated margins — so kernel-window tuning is
driven by real model geometry, not guesses.
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np


def main(h=512, w=640, v=5):
    from helpers import synthetic_sample

    from mvster_tpu.core.geometry import plane_sweep_coords
    from mvster_tpu.core.hypothesis import (
        init_inverse_range,
        schedule_inverse_range,
    )
    from mvster_tpu.kernels.pallas_warp import _coord_windows
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
                               return_debug=True),
        static_argnums=(),
    )(variables)

    prev = None
    for si in range(cfg.num_stage):
        sk = f"stage{si + 1}"
        st = out[sk]
        feat = st["debug_features"]  # (B, V, Hs, Ws, C)
        proj = st["debug_proj"]      # (B, V, 4, 4)
        hs, ws, c = feat.shape[2], feat.shape[3], feat.shape[4]
        nd = cfg.stage_splits[si]
        if si == 0:
            hypo = init_inverse_range(dvals, nd, hs, ws)
        else:
            hypo = schedule_inverse_range(
                prev["inverse_min_depth"], prev["inverse_max_depth"],
                nd, hs, ws,
            )
        prev = st

        for view in range(1, feat.shape[1]):
            x, y = plane_sweep_coords(proj[:, view], proj[:, 0], hypo)
            # the EXACT production layout + predicate (_coord_windows is
            # what _warp_impl itself calls)
            meta_row, shift, pred, L = _coord_windows(c, x, y)
            word = np.asarray(meta_row)
            rcnt = word & 0xFF
            print(
                f"{sk} view{view} {hs}x{ws} C{c} D{nd} b2={L['b2']} "
                f"winb={L['winb']} pack={L['pack']}: pred={bool(pred)} "
                f"rcnt mean {rcnt.mean():.1f} max {rcnt.max()} "
                f"(lim {L['winb'] * L['b2']})"
            )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
