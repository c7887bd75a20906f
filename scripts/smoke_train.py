"""Smoke-drive the FULL training CLI on a synthetic on-disk DTU tree.

Builds a tiny DTU-format dataset (cams, pair.txt, rectified PNGs, PFM GT),
then runs tools/train.py main() for 2 epochs on an 8-device virtual CPU mesh
(batch 8, data-parallel), exercising: loaders -> sharded train step -> LR
schedule -> checkpoint save -> resume -> eval loop -> JSONL/TB logging.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env overrides

from test_data import make_dtu_tree  # noqa: E402
from mvster_tpu.data import dtu  # noqa: E402
from mvster_tpu.data.common import nearest_resize  # noqa: E402
from mvster_tpu.tools import train as train_tool  # noqa: E402


def main():
    tmp = tempfile.mkdtemp(prefix="smoke_dtu_")
    make_dtu_tree(tmp, n_views=4, h=64, w=64)
    logdir = os.path.join(tmp, "ckpt")

    # synthetic GT maps are 2x the image; the real pipeline's /2+crop matches
    orig = dtu.DTUDataset._prepare_map
    dtu.DTUDataset._prepare_map = lambda self, hr: nearest_resize(
        hr, hr.shape[0] // 2, hr.shape[1] // 2
    )
    try:
        argv = [
            "--trainpath", tmp, "--trainlist", f"{tmp}/train.txt",
            "--testlist", f"{tmp}/train.txt", "--logdir", logdir,
            "--dataset", "dtu", "--batch_size", "8", "--nviews", "3",
            "--epochs", "2", "--summary_freq", "1", "--ot_iter", "3",
            "--group_cor", "--inverse_depth", "--rt", "--mono",
            "--attn_temp", "2", "--lr", "1e-3",
        ]
        train_tool.main(argv)

        ckpts = [f for f in os.listdir(logdir) if f.endswith(".msgpack")]
        assert ckpts, "no checkpoint written"
        metrics = [
            json.loads(ln)
            for ln in open(os.path.join(logdir, "metrics.jsonl"))
        ]
        train_losses = [m["loss"] for m in metrics if m["mode"] == "train"]
        eval_rows = [m for m in metrics if m["mode"] == "fulltest"]
        print(f"checkpoints: {ckpts}")
        print(f"train losses: {[round(l, 3) for l in train_losses]}")
        print(f"eval rows: {len(eval_rows)}")
        assert all(l == l for l in train_losses), "NaN loss"
        assert eval_rows, "no eval metrics logged"

        # resume path: third epoch from the saved checkpoint
        train_tool.main(argv + ["--resume", "--epochs", "3"])
        print("resume OK")
        print("OK")
    finally:
        dtu.DTUDataset._prepare_map = orig


if __name__ == "__main__":
    main()
