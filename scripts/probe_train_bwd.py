"""Rank the train-step BACKWARD components (VERDICT r4 item 7, second half).

probe_train_step established the r5b map: full 755.4 = fwd 142.4 +
backward 615.3 + adam ~0 (DTU-mid b2, OT it10 + mono).  This probe
decomposes the 615 ms backward by stop-gradient ablation: each row jits
value_and_grad with a cut at one subsystem boundary (MVS4NetConfig.sg_cuts
— cotangents past the cut are DCE'd, so the delta vs the uncut row IS the
backward cost reachable through that boundary).  The forward is identical
in every row.

Rows (all chained protocol, same batch/params):
  R0  full value_and_grad                      — baseline (= probe_train_step C)
  R1  sg at FPN features                       — R0-R1 = FPN bwd (all paths)
  R2  sg at cost-volume output                 — R0-R2 = warp/scatter bwd + FPN-via-cv
  R3  sg at reg2d logits                       — R2-R3 = reg2d bwd
  R4  sg at mono decoder output                — R0-R4 = mono bwd + FPN-via-mono
  R5  sg on the OT loss value (monkeypatch)    — R3-R5 ~= Sinkhorn-internal bwd
  R6  full vag, ot_backend="pallas"            — candidate: fused OT fwd+bwd kernel

Overlap note: FPN receives cotangents via BOTH the cost volume and
mono_feat, so R1 >= (R2 - reg-side) + R4 double-counts nothing only in the
printed derived rows, which state exactly which paths they include.

Usage: python scripts/probe_train_bwd.py [--batch N] [--iters K]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=4)
    ns = ap.parse_args()

    from helpers import synthetic_sample

    import mvster_tpu.models.losses as losses_mod
    from mvster_tpu.models import MVS4Net, MVS4NetConfig
    from mvster_tpu.models.losses import mvs4net_loss
    from mvster_tpu.utils.cache import enable_compilation_cache
    from mvster_tpu.utils.profiling import chain_latency

    enable_compilation_cache()  # 8 vag compiles; repeat windows reuse them

    s = synthetic_sample(0, batch=ns.batch, nviews=5, h=512, w=640,
                         with_gt=True)
    batch = {
        "imgs": jnp.asarray(s["imgs"]),
        "proj_matrices": {k: jnp.asarray(p)
                          for k, p in s["proj_matrices"].items()},
        "depth_values": jnp.asarray(s["depth_values"]),
        "depth": {k: jnp.asarray(x) for k, x in s["depth"].items()},
        "mask": {k: jnp.asarray(x) for k, x in s["mask"].items()},
    }

    base_model = MVS4Net(MVS4NetConfig.dtu_default(mono=True))
    variables = jax.jit(
        lambda: base_model.init(jax.random.PRNGKey(0), batch["imgs"],
                                batch["proj_matrices"],
                                batch["depth_values"], train=True)
    )()
    jax.block_until_ready(variables)
    print("params initialized", flush=True)

    def vag_latency(cuts=(), ot_backend="xla", sg_ot=False):
        # sg_cuts does not change the param tree, so one init serves all rows
        model = MVS4Net(MVS4NetConfig.dtu_default(mono=True, sg_cuts=cuts))
        loss_kwargs = dict(inverse_depth=True, ot_iter=10, mono=True,
                           ot_backend=ot_backend)

        orig_ot = losses_mod._sinkhorn_loss
        if sg_ot:
            losses_mod._sinkhorn_loss = lambda *a, **k: jax.lax.stop_gradient(
                orig_ot(*a, **k)
            )
        try:
            def compute_loss(params, stats, imgs):
                outputs, _ = model.apply(
                    {"params": params, "batch_stats": stats},
                    imgs, batch["proj_matrices"], batch["depth_values"],
                    train=True, mutable=["batch_stats"],
                )
                loss, _ = mvs4net_loss(
                    outputs, batch["depth"], batch["mask"],
                    depth_values=batch["depth_values"], **loss_kwargs,
                )
                return loss

            def vag(carry, vs, imgs):
                loss, grads = jax.value_and_grad(compute_loss)(
                    vs["params"], vs["batch_stats"], imgs + 1e-12 * carry
                )
                probe = jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(jnp.abs(x)), grads,
                    jnp.float32(0.0),
                )
                return loss + 1e-30 * probe

            return chain_latency(vag, variables, batch["imgs"],
                                 iters=ns.iters)
        finally:
            losses_mod._sinkhorn_loss = orig_ot

    rows = [
        ("R0 full vag", dict()),
        ("R1 sg fpn", dict(cuts=("fpn",))),
        ("R2 sg cost_volume", dict(cuts=("cost_volume",))),
        ("R3 sg logits", dict(cuts=("logits",))),
        ("R4 sg mono", dict(cuts=("mono",))),
        ("R5 sg OT value", dict(sg_ot=True)),
        ("R6 ot_backend=pallas", dict(ot_backend="pallas")),
        ("R7 sg warp", dict(cuts=("warp",))),
    ]
    t = {}
    for name, kw in rows:
        t[name[:2]] = vag_latency(**kw)
        print(f"{name:24s} {t[name[:2]] * 1e3:8.1f} ms", flush=True)

    print("\nderived (ms):")
    print(f"  FPN bwd (all paths)         = R0-R1 = {(t['R0'] - t['R1']) * 1e3:7.1f}")
    print(f"  cv bwd + FPN-via-cv         = R0-R2 = {(t['R0'] - t['R2']) * 1e3:7.1f}")
    print(f"  reg2d bwd                   = R2-R3 = {(t['R2'] - t['R3']) * 1e3:7.1f}")
    print(f"  mono bwd + FPN-via-mono     = R0-R4 = {(t['R0'] - t['R4']) * 1e3:7.1f}")
    print(f"  Sinkhorn-internal bwd       = R3-R5 = {(t['R3'] - t['R5']) * 1e3:7.1f}")
    print(f"  pallas-OT full-step delta   = R0-R6 = {(t['R0'] - t['R6']) * 1e3:7.1f}")
    print(f"  scatter bwd + FPN-via-cv    = R0-R7 = {(t['R0'] - t['R7']) * 1e3:7.1f}")
    print(f"  cor/attention bwd           = R7-R2 = {(t['R7'] - t['R2']) * 1e3:7.1f}")


if __name__ == "__main__":
    main()
