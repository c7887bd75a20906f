"""Epoch-end eval covers the trailing partial batch (reference drop_last=False).

Round-1 divergence: the val loader dropped the trailing partial batch for
static jit shapes, so epoch metrics were computed on a different sample set
than the reference (train_mvs4.py:141-176 evaluates every val sample).  Now
evaluate() pads the short batch with zero-mask duplicates
(train/loop.pad_eval_batch): every masked-mean loss/metric must be bitwise
(to float tolerance) identical to evaluating the true unpadded batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tests.helpers import synthetic_sample
from mvster_tpu.data.loader import MVSLoader
from mvster_tpu.dist.train_step import create_train_state, make_eval_step
from mvster_tpu.models import MVS4Net, MVS4NetConfig
from mvster_tpu.train.loop import evaluate, pad_eval_batch
from mvster_tpu.train.metrics import DictAverageMeter, tree_to_float

CFG = MVS4NetConfig(
    group_cor=True, group_cor_dim=(4, 4, 4, 4), inverse_depth=True,
    fpn_base_channel=4, reg_channel=4,
)


def _np_batch(n, seed=0):
    s = synthetic_sample(seed, batch=n, nviews=2, h=64, w=64, with_gt=True)
    return {k: v for k, v in s.items()}


class _ListDataset:
    def __init__(self, samples):
        self.samples = samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_padded_trailing_batch_matches_unpadded_eval():
    full = _np_batch(5, seed=3)
    model = MVS4Net(CFG)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(full["imgs"][:1]),
        {k: jnp.asarray(v[:1]) for k, v in full["proj_matrices"].items()},
        jnp.asarray(full["depth_values"][:1]), train=True,
    )
    state = create_train_state(variables, optax.sgd(1e-3))
    eval_step = make_eval_step(model, loss_kwargs=dict(inverse_depth=True,
                                                       ot_iter=3))

    def take(b, sl):
        return jax.tree_util.tree_map(
            lambda x: x[sl] if isinstance(x, np.ndarray) else x, dict(b)
        )

    # ground truth: evaluate batches (0:2), (2:4), (4:5) at their TRUE sizes
    meter_ref = DictAverageMeter()
    for sl in (slice(0, 2), slice(2, 4), slice(4, 5)):
        scalars = eval_step(
            state.params, state.batch_stats,
            jax.tree_util.tree_map(jnp.asarray, take(full, sl)),
        )
        meter_ref.update(tree_to_float(scalars))
    ref = meter_ref.mean()

    # evaluate() path: 5 samples through a batch-2 drop_last=False loader,
    # trailing batch padded to 2 with a zero-mask duplicate
    samples = [take(full, slice(i, i + 1)) for i in range(5)]
    squeezed = [
        jax.tree_util.tree_map(
            lambda x: x[0] if isinstance(x, np.ndarray) else x, s
        )
        for s in samples
    ]
    loader = MVSLoader(_ListDataset(squeezed), 2, prefetch=0, drop_last=False)
    assert len(loader) == 3
    got = evaluate(state, eval_step, loader, print_fn=lambda *_: None)

    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)


def test_pad_eval_batch_shapes_and_masks():
    b = _np_batch(3)
    padded = pad_eval_batch(b, 4)
    assert padded["imgs"].shape[0] == 4
    for k, v in padded["mask"].items():
        assert v.shape[0] == 4
        assert (v[3:] == 0).all()
        np.testing.assert_array_equal(v[:3], b["mask"][k])
    # full batches pass through untouched
    assert pad_eval_batch(b, 3) is b
