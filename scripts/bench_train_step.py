"""Measure training-step cost breakdown on the real TPU at DTU-mid shape.

Times: full train step, loss-only (forward+loss), forward-only — the deltas
locate where optimization effort should go (Sinkhorn iterations vs convs).

The full step is timed with dispatch_chain_latency (state-threaded
dependent dispatches + final-state scalar fetch): unlike chain_latency's
fori_loop wrapper it scales to batch >= 4 (the wrapped program exceeds
the XLA compile helper there), which is how the b1/b2/b4/b8 scaling table
in BENCHNOTES.md is produced (--batch N).  The component timings below it
keep the coarser block_until_ready timer ONLY for relative deltas between
variants of the same program at the same shape; absolute numbers quoted
anywhere come from the chained protocols (BENCHNOTES.md).
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import optax

from helpers import synthetic_sample
from mvster_tpu.dist.train_step import create_train_state, make_train_step
from mvster_tpu.models import MVS4Net, MVS4NetConfig
from mvster_tpu.models.losses import mvs4net_loss


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    b, v, h, w = args.batch, 5, 512, 640
    s = synthetic_sample(0, batch=b, nviews=v, h=h, w=w, with_gt=True)
    batch = {
        "imgs": jnp.asarray(s["imgs"]),
        "proj_matrices": {k: jnp.asarray(p) for k, p in s["proj_matrices"].items()},
        "depth_values": jnp.asarray(s["depth_values"]),
        "depth": {k: jnp.asarray(p) for k, p in s["depth"].items()},
        "mask": {k: jnp.asarray(p) for k, p in s["mask"].items()},
    }
    model = MVS4Net(MVS4NetConfig.dtu_default(mono=True, compute_dtype=args.dtype))
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
            batch["depth_values"], train=True,
        )
    )()
    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)
    loss_kwargs = dict(inverse_depth=True, ot_iter=10, mono=True)

    fwd = jax.jit(lambda vr, bt: model.apply(
        vr, bt["imgs"], bt["proj_matrices"], bt["depth_values"], train=False
    )["depth"])
    t_fwd = timeit(fwd, variables, batch)
    print(f"forward only (eval):        {t_fwd * 1e3:8.2f} ms")

    def loss_only(vr, bt):
        out, _ = model.apply(
            vr, bt["imgs"], bt["proj_matrices"], bt["depth_values"],
            train=True, mutable=["batch_stats"],
        )
        loss, _ = mvs4net_loss(out, bt["depth"], bt["mask"], **loss_kwargs)
        return loss

    t_loss = timeit(jax.jit(loss_only), variables, batch)
    print(f"train forward + loss:       {t_loss * 1e3:8.2f} ms")

    loss_k3 = dict(loss_kwargs, ot_iter=3)
    t_loss3 = timeit(
        jax.jit(lambda vr, bt: (lambda out: mvs4net_loss(
            out[0], bt["depth"], bt["mask"], **loss_k3)[0])(
            model.apply(vr, bt["imgs"], bt["proj_matrices"],
                        bt["depth_values"], train=True, mutable=["batch_stats"]))),
        variables, batch)
    print(f"train forward + loss(it3):  {t_loss3 * 1e3:8.2f} ms")

    from mvster_tpu.utils.profiling import dispatch_chain_latency

    step = make_train_step(model, tx, loss_kwargs=loss_kwargs, donate=False)
    t_step = dispatch_chain_latency(
        lambda st, bt: step(st, bt)[0], state, batch,
        probe=lambda st: jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), st.params, jnp.float32(0.0)
        ),
    )
    print(f"full train step (it10, b{b}, state-threaded chain): "
          f"{t_step * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
