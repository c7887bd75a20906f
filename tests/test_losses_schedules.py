"""Loss parity vs the torch reference + LR schedule behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import reference_on_path
from mvster_tpu.models.losses import mvs4net_loss
from mvster_tpu.train.schedules import make_lr_schedule, warmup_multistep_schedule

torch = pytest.importorskip("torch")

HAS_REF = reference_on_path()


def _fake_outputs(seed, b=1, h=16, w=16, stages=4):
    rng = np.random.default_rng(seed)
    outputs = {}
    depth_gt_ms, mask_ms = {}, {}
    for s in range(1, stages + 1):
        hs, ws = h // 2 ** (stages - s), w // 2 ** (stages - s)
        d = 8 if s <= 2 else 4
        hypo = np.sort(
            rng.uniform(400, 900, size=(b, d, hs, ws)).astype(np.float32), axis=1
        )[:, ::-1]  # descending like inverse-depth hypotheses
        hypo = np.ascontiguousarray(hypo)
        logits = rng.normal(size=(b, d, hs, ws)).astype(np.float32)
        attn = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        idx = np.argmax(attn, axis=1)
        depth = np.take_along_axis(hypo, idx[:, None], axis=1)[:, 0]
        outputs[f"stage{s}"] = {
            "depth": depth,
            "hypo_depth": hypo,
            "attn_weight": attn.astype(np.float32),
            "mono_depth": rng.uniform(400, 900, size=(b, hs, ws)).astype(np.float32),
        }
        depth_gt_ms[f"stage{s}"] = rng.uniform(420, 880, size=(b, hs, ws)).astype(
            np.float32
        )
        mask_ms[f"stage{s}"] = (rng.uniform(size=(b, hs, ws)) > 0.3).astype(
            np.float32
        )
    return outputs, depth_gt_ms, mask_ms


@pytest.mark.skipif(not HAS_REF, reason="reference repo unavailable")
@pytest.mark.parametrize("mono", [False, True])
def test_loss_matches_reference(mono):
    from models.MVS4Net import MVS4net_loss as ref_loss

    outputs, gt, mask = _fake_outputs(0)
    t_outputs = {
        k: {kk: torch.from_numpy(vv.copy()) for kk, vv in v.items()}
        for k, v in outputs.items()
    }
    t_gt = {k: torch.from_numpy(v.copy()) for k, v in gt.items()}
    t_mask = {k: torch.from_numpy(v.copy()) for k, v in mask.items()}

    ref_total, ref_l1, ref_ot, ref_range = ref_loss(
        t_outputs, t_gt, t_mask,
        stage_lw=[1, 1, 1, 1], l1ot_lw=[0.5, 1.0] if mono else [0, 1],
        inverse_depth=True, ot_iter=10, ot_eps=1, ot_continous=False, mono=mono,
    )

    total, aux = mvs4net_loss(
        {k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in outputs.items()},
        {k: jnp.asarray(v) for k, v in gt.items()},
        {k: jnp.asarray(v) for k, v in mask.items()},
        stage_lw=(1, 1, 1, 1), l1ot_lw=(0.5, 1.0) if mono else (0, 1),
        inverse_depth=True, ot_iter=10, ot_eps=1, ot_continous=False, mono=mono,
    )
    np.testing.assert_allclose(float(total), float(ref_total), rtol=3e-4)
    for i in range(4):
        np.testing.assert_allclose(
            float(aux["stage_ot_loss"][i]), float(ref_ot[i]), rtol=3e-4
        )
        np.testing.assert_allclose(
            float(aux["stage_l1_loss"][i]), float(ref_l1[i]), rtol=3e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            float(aux["range_err_ratio"][i]), float(ref_range[i]), rtol=1e-4,
            atol=1e-6,
        )


def test_warmup_multistep_matches_torch_scheduler():
    base_lr, milestones, gamma = 1e-3, [100, 200], 0.5
    sched = warmup_multistep_schedule(base_lr, milestones, gamma,
                                      warmup_factor=1 / 3, warmup_iters=50)
    # independent torch-free re-derivation
    for step in [0, 10, 49, 50, 99, 100, 150, 200, 300]:
        warm = (1 / 3) * (1 - min(step, 50) / 50) + min(step, 50) / 50
        decay = gamma ** sum(step >= m for m in milestones)
        expected = base_lr * warm * decay
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)


def test_onecycle_and_cosine_schedules_shape():
    cos = make_lr_schedule("cos", 1e-3, steps_per_epoch=10, epochs=10)
    assert float(cos(0)) == pytest.approx(1e-3)
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-9)
    oc = make_lr_schedule("onecycle", 1e-3, steps_per_epoch=10, epochs=10)
    assert float(oc(0)) == pytest.approx(1e-3 / 25, rel=1e-2)
    assert float(oc(30)) == pytest.approx(1e-3, rel=1e-2)
    assert float(oc(100)) < 1e-6
