"""Decompose the train step (DTU-mid batch 2, OT it10 + mono) into
forward / backward / optimizer components — the measured attack surface
VERDICT r4 weak #7 asked for (the b2 step has been ~790-890 ms for three
rounds with no component map).

Rows (all chained protocol, same batch/state):
  A  full train step (fwd + bwd + adam)        — the production number
  B  loss forward only (train=True, no grad)
  C  value_and_grad only (fwd + bwd, no update)
  D  adam update only (precomputed grads)
  E  eval forward (train=False — the val loop's step; Pallas warp routed)

C - B ~= backward cost; A - C ~= optimizer + state plumbing.

Usage: python scripts/probe_train_step.py [--batch N] [--iters K]
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

    import optax
    from helpers import synthetic_sample

    from mvster_tpu.dist.train_step import create_train_state
    from mvster_tpu.models import MVS4Net, MVS4NetConfig
    from mvster_tpu.models.losses import mvs4net_loss
    from mvster_tpu.utils.profiling import chain_latency

    model = MVS4Net(MVS4NetConfig.dtu_default(mono=True))
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
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch["imgs"],
                           batch["proj_matrices"], batch["depth_values"],
                           train=True)
    )()
    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)
    loss_kwargs = dict(inverse_depth=True, ot_iter=10, mono=True)

    def compute_loss(params, stats, imgs):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            imgs, batch["proj_matrices"], batch["depth_values"],
            train=True, mutable=["batch_stats"],
        )
        loss, aux = mvs4net_loss(
            outputs, batch["depth"], batch["mask"],
            depth_values=batch["depth_values"], **loss_kwargs,
        )
        return loss, (aux, mutated["batch_stats"])

    # --- A. full step
    def full_step(carry, st, imgs):
        im = imgs + 1e-12 * carry
        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(st.params, st.batch_stats, im)
        updates, _ = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        probe = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), new_params, jnp.float32(0.0)
        )
        return loss + 1e-30 * probe

    t_a = chain_latency(full_step, state, batch["imgs"], iters=ns.iters)
    print(f"A  full step (fwd+bwd+adam):  {t_a * 1e3:8.1f} ms")

    # --- B. loss forward only
    def fwd_only(carry, st, imgs):
        loss, _ = compute_loss(st.params, st.batch_stats,
                               imgs + 1e-12 * carry)
        return loss

    t_b = chain_latency(fwd_only, state, batch["imgs"], iters=ns.iters)
    print(f"B  loss forward (train=True): {t_b * 1e3:8.1f} ms")

    # --- C. value_and_grad only
    def vag_only(carry, st, imgs):
        (loss, _), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(st.params, st.batch_stats, imgs + 1e-12 * carry)
        probe = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), grads, jnp.float32(0.0)
        )
        return loss + 1e-30 * probe

    t_c = chain_latency(vag_only, state, batch["imgs"], iters=ns.iters)
    print(f"C  value_and_grad (no adam):  {t_c * 1e3:8.1f} ms")

    # --- D. adam update only (fixed grads)
    grads = jax.jit(
        lambda st, imgs: jax.grad(
            lambda p: compute_loss(p, st.batch_stats, imgs)[0]
        )(st.params)
    )(state, batch["imgs"])
    jax.block_until_ready(grads)

    def adam_only(carry, st, gr):
        gr = jax.tree_util.tree_map(lambda g: g + 1e-12 * carry, gr)
        updates, _ = tx.update(gr, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), new_params, jnp.float32(0.0)
        )

    t_d = chain_latency(adam_only, state, grads, iters=ns.iters)
    print(f"D  adam update only:          {t_d * 1e3:8.1f} ms")

    # --- E. eval forward (the val loop's path; Pallas warp routed)
    def eval_fwd(carry, st, imgs):
        out = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            imgs + 1e-12 * carry, batch["proj_matrices"],
            batch["depth_values"], train=False,
        )
        return jnp.mean(out["depth"])

    t_e = chain_latency(eval_fwd, state, batch["imgs"], iters=ns.iters)
    print(f"E  eval forward (train=False):{t_e * 1e3:8.1f} ms")

    print(f"\nbackward ~= C - B = {(t_c - t_b) * 1e3:.1f} ms; "
          f"adam+plumbing ~= A - C = {(t_a - t_c) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
