"""View-level eval batching must not change inference artifacts.

tools/test.save_depth runs `eval_batch` reference views per compiled
forward, duplicating the last sample to pad the trailing chunk to one
static shape (tools/test.py dispatch/drain).  The batched path must write
byte-identical depth/confidence PFMs to the one-view-per-forward path —
padding rows are compute-only and must never leak into artifacts.  Mirrors
the reference's strictly batch-1 save_depth loop (test_mvs4.py save_depth)
while verifying our batching extension is an exact refactor of it.
"""

import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from mvster_tpu.data.pfm import read_pfm
from mvster_tpu.models import MVS4Net, MVS4NetConfig


def _run_save_depth(tmp, scan, variables, model, eval_batch):
    from mvster_tpu.tools.cli import build_test_parser
    from mvster_tpu.tools.test import save_depth

    outdir = os.path.join(tmp, f"out_b{eval_batch}")
    args = build_test_parser().parse_args(
        [
            "--testpath", tmp, "--testlist", scan, "--loadckpt", "unused",
            "--outdir", outdir, "--dataset", "general_eval",
            "--num_view", "3", "--max_h", "128", "--max_w", "128",
            "--group_cor", "--inverse_depth", "--attn_temp", "2",
            "--eval_batch", str(eval_batch),
        ]
    )
    save_depth(args, model, variables, [scan])
    return outdir


@pytest.mark.parametrize("eval_batch", [2, 4])
def test_eval_batching_artifacts_bitwise(eval_batch):
    """3 ref views through eval_batch 2 (chunk 2 + padded chunk 1) and 4
    (one chunk, 1 padded row) match the unbatched artifacts bitwise."""
    import jax
    import jax.numpy as jnp

    from helpers import synthetic_sample
    from smoke_test_cli import write_scan

    tmp = tempfile.mkdtemp(prefix="eval_batching_")
    scan = write_scan(tmp)  # 3 views, 128x128

    model = MVS4Net(MVS4NetConfig.dtu_default(mono=False))
    s = synthetic_sample(0, nviews=3, h=128, w=128)
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.asarray(s["imgs"]),
            {k: jnp.asarray(v) for k, v in s["proj_matrices"].items()},
            jnp.asarray(s["depth_values"]), train=False,
        )
    )()

    out1 = _run_save_depth(tmp, scan, variables, model, 1)
    outn = _run_save_depth(tmp, scan, variables, model, eval_batch)

    for vid in range(3):
        for kind in ("depth_est", "confidence"):
            a = read_pfm(os.path.join(out1, scan, kind, f"{vid:08d}.pfm"))[0]
            b = read_pfm(os.path.join(outn, scan, kind, f"{vid:08d}.pfm"))[0]
            np.testing.assert_array_equal(
                a, b, err_msg=f"{kind} view {vid} differs at "
                f"eval_batch={eval_batch}"
            )
