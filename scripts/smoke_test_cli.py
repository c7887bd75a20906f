"""Smoke-drive the FULL inference CLI (tools/test.py) on a synthetic scene.

Builds a general_eval-format scan on disk (textured-plane views + full-res
cam files + pair.txt), saves a random-init checkpoint, runs the test driver
end-to-end: depth/confidence PFM export -> device-side filtering + fusion ->
PLY.  Verifies the on-disk artifact layout matches the reference contract.
"""

import os
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import cv2  # noqa: E402
from flax import serialization  # noqa: E402

from helpers import plane_scene_sample  # noqa: E402
from mvster_tpu.models import MVS4Net, MVS4NetConfig  # noqa: E402
from mvster_tpu.tools import test as test_tool  # noqa: E402


def write_scan(root, scan="scan1", h=128, w=128, z=600.0):
    sample = plane_scene_sample(0, h=h, w=w, z=z, baselines=(300.0, -300.0))
    imgs = sample["imgs"][0]  # (V, H, W, 3), zero-mean texture
    imgs = (imgs - imgs.min()) / (imgs.max() - imgs.min())
    os.makedirs(f"{root}/{scan}/images", exist_ok=True)
    os.makedirs(f"{root}/{scan}/cams", exist_ok=True)
    nv = imgs.shape[0]
    projs = sample["proj_matrices"]["stage4"][0]  # full-res K
    for v in range(nv):
        cv2.imwrite(
            f"{root}/{scan}/images/{v:08d}.jpg",
            cv2.cvtColor((imgs[v] * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
        extr, intr = projs[v, 0], projs[v, 1, :3, :3]
        with open(f"{root}/{scan}/cams/{v:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in extr:
                f.write(" ".join(map(str, row)) + "\n")
            f.write("\nintrinsic\n")
            for row in intr:
                f.write(" ".join(map(str, row)) + "\n")
            f.write("\n425.0 2.66\n")
    with open(f"{root}/{scan}/pair.txt", "w") as f:
        f.write(f"{nv}\n")
        for v in range(nv):
            srcs = [s for s in range(nv) if s != v]
            f.write(f"{v}\n{len(srcs)} ")
            f.write(" ".join(f"{s} {10}" for s in srcs) + "\n")
    return scan


def main():
    tmp = tempfile.mkdtemp(prefix="smoke_eval_")
    scan = write_scan(tmp)
    outdir = os.path.join(tmp, "out")

    # random-init checkpoint in our msgpack format
    model = MVS4Net(MVS4NetConfig.dtu_default(mono=False))
    from helpers import synthetic_sample

    s = synthetic_sample(0, nviews=3, h=128, w=128)
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(s["imgs"]),
        {k: jnp.asarray(v) for k, v in s["proj_matrices"].items()},
        jnp.asarray(s["depth_values"]), train=False,
    )
    ckpt = os.path.join(tmp, "weights.msgpack")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))

    test_tool.main([
        "--testpath", tmp, "--testlist", scan, "--loadckpt", ckpt,
        "--outdir", outdir, "--dataset", "general_eval", "--num_view", "3",
        "--max_h", "128", "--max_w", "128", "--conf", "0.0",
        "--thres_view", "1", "--group_cor", "--inverse_depth",
        "--attn_temp", "2", "--save_jpg",
    ])

    expected = [
        f"{scan}/depth_est/00000000.pfm",
        f"{scan}/confidence/00000000.pfm",
        f"{scan}/cams/00000000_cam.txt",
        f"{scan}/images/00000000.jpg",
        f"{scan}/mask/00000000_final.png",
        f"{scan}/depth_est/00000000stage_4.jpg",
        "mvsnet001_l3.ply",
    ]
    for rel in expected:
        path = os.path.join(outdir, rel)
        assert os.path.exists(path), f"missing artifact {rel}"
    from mvster_tpu.infer.ply import read_ply

    xyz, rgb = read_ply(os.path.join(outdir, "mvsnet001_l3.ply"))
    print(f"fused cloud: {len(xyz)} points")
    print("artifact layout OK")
    print("OK")


if __name__ == "__main__":
    main()
