"""Torch-checkpoint -> flax pytree converter.

Maps the reference MVSTER state dict (torch layouts: conv OIHW / OIDHW,
transposed-conv IODHW, linear (out, in)) onto this framework's channels-last
flax tree (conv HWIO / DHWIO, transposed kernels pre-flipped, dense (in, out)).

Key-name grammar of the reference model (/root/reference/models/MVS4Net.py,
mvs4net_utils.py):

  feature.conv{0..3}.{i}.conv.weight|bn.*      encoder blocks
  feature.inner{1..3}.weight|bias              lateral 1x1 convs
  feature.out{1..4}.weight                     output heads
  reg.{s}.conv{n}.conv.weight|bn.*             U-Net conv blocks
  reg.{s}.conv{n}.linear_agg.{0|2}.*           CAM/DCAM attention MLPs
  reg.{s}.conv{n}.pixel_conv|spatial_conv.*    PAM/PDAM gates
  reg.{s}.conv{7|9|11}.0.weight + .1.*         deconv + BN sequentials
  reg.{s}.prob.weight|bias                     logit head
  mono_depth_decoder.convblocks.{i}.*          mono decoder conv blocks
  mono_depth_decoder.conv3x3.{i}.*             mono disparity heads
  asff.{l}.<name>.conv.weight|bn.* / expand / weight_levels

Usage:
  variables = convert_state_dict(torch_state_dict)
  model.apply(variables, ...)

Also importable without torch: operates on {key: np.ndarray}.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _conv2d(w):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):  # (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3d(w):  # (I, O, kd, kh, kw) -> flipped (kd, kh, kw, I, O)
    w = np.transpose(w, (2, 3, 4, 0, 1))
    return w[::-1, ::-1, ::-1].copy()


def _linear(w):  # (O, I) -> (I, O)
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = np.asarray(value)


_BN_MAP = {
    "weight": "scale",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def _route_norm(parts, leaf, prefix):
    """BN/GN/LN leaves -> (collection, path, transform)."""
    name = _BN_MAP.get(leaf)
    if name is None:
        return None  # num_batches_tracked etc.
    collection = "batch_stats" if leaf.startswith("running") else "params"
    return collection, prefix + (name,), lambda w: w


def convert_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """Convert a torch MVSTER state dict into {"params": ..., "batch_stats": ...}."""
    params: dict = {}
    batch_stats: dict = {}
    unmapped: list[str] = []

    for key, value in state_dict.items():
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        routed = _route(key, value)
        if routed is None:
            unmapped.append(key)
            continue
        collection, path, transformed = routed
        target = params if collection == "params" else batch_stats
        _set(target, path, transformed)

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    if unmapped:
        skippable = [k for k in unmapped if "num_batches_tracked" not in k]
        if skippable:
            raise ValueError(f"unmapped checkpoint keys: {skippable[:20]}")
    return out


def _route(key: str, value: np.ndarray):
    """Return (collection, flax path, transformed value) for one torch key."""
    parts = key.split(".")

    if "num_batches_tracked" in key:
        return None

    # ---- feature extractor -------------------------------------------------
    if parts[0] == "feature":
        m = re.fullmatch(r"conv(\d)", parts[1])
        if m and parts[2].isdigit():  # feature.conv0.0.conv.weight / .bn.*
            block = f"conv{m.group(1)}_{parts[2]}"
            return _conv_block(("feature", block), parts[3:], value)
        if m:  # convnext: feature.conv1.dwconv.weight etc (no index)
            return _convnext_block(("feature", parts[1]), parts[2:], value)
        if re.fullmatch(r"inner\d", parts[1]) or re.fullmatch(r"out\d", parts[1]):
            leaf = "kernel" if parts[2] == "weight" else "bias"
            val = _conv2d(value) if parts[2] == "weight" else value
            return "params", ("feature", parts[1], leaf), val
        if re.fullmatch(r"conv0_\d", parts[1]):  # convnext stems already split
            return _conv_block(("feature", parts[1]), parts[2:], value)
        if re.fullmatch(r"dcn\d", parts[1]):
            return _na_dcn(("feature", parts[1]), parts[2:], value)

    # ---- cost regularizers -------------------------------------------------
    if parts[0] == "reg" and parts[1].isdigit():
        prefix = (f"reg_{parts[1]}",)
        rest = parts[2:]
        if rest[0] == "prob":
            leaf = "kernel" if rest[1] == "weight" else "bias"
            val = _conv3d(value) if rest[1] == "weight" else value
            return "params", prefix + ("prob", leaf), val
        conv_name = rest[0]  # conv0..conv11
        body = rest[1:]
        if body[0] == "0" and body[1] == "weight":  # deconv sequential
            return "params", prefix + (conv_name, "kernel"), _deconv3d(value)
        if body[0] == "1":  # deconv sequential BN
            routed = _route_norm(body, body[1], prefix + (conv_name, "bn"))
            return (*routed[:2], routed[2](value)) if routed else None
        if body[0] == "conv" and body[1] == "weight":
            return "params", prefix + (conv_name, "conv", "kernel"), _conv3d(value)
        if body[0] == "bn":
            routed = _route_norm(body, body[1], prefix + (conv_name, "bn"))
            return (*routed[:2], routed[2](value)) if routed else None
        if body[0] == "linear_agg":
            fc = {"0": "fc0", "2": "fc1"}[body[1]]
            leaf = "kernel" if body[2] == "weight" else "bias"
            val = _linear(value) if body[2] == "weight" else value
            return "params", prefix + (conv_name, "linear_agg", fc, leaf), val
        if body[0] == "pixel_conv":
            leaf = "kernel" if body[1] == "weight" else "bias"
            val = _conv2d(value) if body[1] == "weight" else value
            return "params", prefix + (conv_name, "pixel_conv", leaf), val
        if body[0] == "spatial_conv":
            leaf = "kernel" if body[1] == "weight" else "bias"
            val = _conv3d(value) if body[1] == "weight" else value
            return "params", prefix + (conv_name, "spatial_conv", leaf), val

    # ---- mono decoder ------------------------------------------------------
    if parts[0] == "mono_depth_decoder":
        if parts[1] == "convblocks":
            block = f"convblock{parts[2]}"
            return _conv_block(("mono_depth_decoder", block), parts[3:], value)
        if parts[1] == "conv3x3":
            name = f"conv3x3_{parts[2]}"
            leaf = "kernel" if parts[3] == "weight" else "bias"
            val = _conv2d(value) if parts[3] == "weight" else value
            return "params", ("mono_depth_decoder", name, leaf), val

    # ---- ASFF --------------------------------------------------------------
    if parts[0] == "asff" and parts[1].isdigit():
        prefix = (f"asff_{parts[1]}",)
        rest = parts[2:]
        if rest[0] == "weight_levels":
            leaf = "kernel" if rest[1] == "weight" else "bias"
            val = _conv2d(value) if rest[1] == "weight" else value
            return "params", prefix + ("weight_levels", leaf), val
        return _conv_block(prefix + (rest[0],), rest[1:], value)

    # ---- positional encodings ---------------------------------------------
    if parts[0] == "pos_enc_func":
        # learned depth embedding: torch (C, D) -> ours (D, C)
        stage = parts[1]
        return (
            "params",
            (f"pos_enc_{stage}", "depth_embed"),
            _linear(value),
        )

    return None


def _conv_block(prefix, body, value):
    """Conv2d-wrapper blocks: .conv.weight(+bias) / .bn.* / .gn.*"""
    if body[0] == "conv":
        leaf = "kernel" if body[1] == "weight" else "bias"
        val = _conv2d(value) if body[1] == "weight" else value
        return "params", prefix + ("conv", leaf), val
    if body[0] in ("bn", "gn"):
        routed = _route_norm(body, body[1], prefix + (body[0],))
        return (*routed[:2], routed[2](value)) if routed else None
    # convnext inner pieces routed here too
    return _convnext_block(prefix, body, value)


def _convnext_block(prefix, body, value):
    name = body[0]
    if name in ("dwconv", "sconv"):
        leaf = "kernel" if body[1] == "weight" else "bias"
        val = _conv2d(value) if body[1] == "weight" else value
        return "params", prefix + (name, leaf), val
    if name == "norm":
        leaf = "scale" if body[1] == "weight" else "bias"
        return "params", prefix + ("norm", leaf), value
    if name in ("pwconv1", "pwconv2"):
        leaf = "kernel" if body[1] == "weight" else "bias"
        val = _linear(value) if body[1] == "weight" else value
        return "params", prefix + (name, leaf), val
    if name == "gamma":
        return "params", prefix + ("gamma",), value
    return None


def _na_dcn(prefix, body, value):
    """feature.dcn{n}: Sequential(norm, relu, DeformConvPack).

    The external CUDA DeformConvPack's weights have no JAX twin; only the norm
    is mapped (our DeformConvBlock re-learns offsets).  `.2.*` keys (the conv)
    map onto our dense tap kernel when shapes agree.
    """
    if body[0] == "0":
        routed = _route_norm(body, body[1], prefix + ("norm",))
        return (*routed[:2], routed[2](value)) if routed else None
    if body[0] == "2" and body[1] == "weight":
        # DeformConvPack conv weight (O, I, kh, kw) -> (n, I, O) tap kernel
        o, i, kh, kw = value.shape
        w = np.transpose(value.reshape(o, i, kh * kw), (2, 1, 0))
        return "params", prefix + ("dcn", "kernel"), w
    return None




# ---------------------------------------------------------------------------
# Reverse direction: flax pytree -> torch state dict (train here, deploy with
# the reference's tooling).  Inverse transforms of the forward mapping.
# ---------------------------------------------------------------------------

def _inv_conv2d(w):  # (kh, kw, I, O) -> (O, I, kh, kw)
    return np.transpose(w, (3, 2, 0, 1))


def _inv_conv3d(w):  # (kd, kh, kw, I, O) -> (O, I, kd, kh, kw)
    return np.transpose(w, (4, 3, 0, 1, 2))


def _inv_deconv3d(w):  # flipped (kd, kh, kw, I, O) -> (I, O, kd, kh, kw)
    return np.transpose(w[::-1, ::-1, ::-1], (3, 4, 0, 1, 2)).copy()


_INV_BN = {"scale": "weight", "bias": "bias", "mean": "running_mean",
           "var": "running_var"}


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def export_state_dict(variables: Mapping[str, Any]) -> dict:
    """flax {"params", "batch_stats"} -> torch-layout state dict (numpy).

    Inverse of convert_state_dict; round-trip tested in
    tests/test_converter_roundtrip.py.  BatchNorm num_batches_tracked leaves
    are synthesized (zeros) so torch load_state_dict(strict=True) accepts it.
    """
    out: dict[str, np.ndarray] = {}
    bn_seen: set[str] = set()

    def put_norm(tkey_prefix, leaf, value):
        out[f"{tkey_prefix}.{_INV_BN[leaf]}"] = value
        bn_seen.add(tkey_prefix)

    for collection in ("params", "batch_stats"):
        for path, value in _walk(variables.get(collection, {})):
            head = path[0]
            # ---- feature extractor ----
            if head == "feature":
                name = path[1]
                m = re.fullmatch(r"conv(\d)_(\d)", name)
                if m:
                    tprefix = f"feature.conv{m.group(1)}.{m.group(2)}"
                    if path[2] == "conv":
                        leaf = "weight" if path[3] == "kernel" else "bias"
                        val = _inv_conv2d(value) if path[3] == "kernel" else value
                        out[f"{tprefix}.conv.{leaf}"] = val
                    else:  # bn / gn
                        put_norm(f"{tprefix}.{path[2]}", path[3], value)
                    continue
                if re.fullmatch(r"(inner|out)\d", name):
                    leaf = "weight" if path[2] == "kernel" else "bias"
                    val = _inv_conv2d(value) if path[2] == "kernel" else value
                    out[f"feature.{name}.{leaf}"] = val
                    continue
                raise KeyError(f"unhandled feature path {path}")
            # ---- regularizers ----
            if head.startswith("reg_"):
                stage = head[4:]
                name = path[1]
                if name == "prob":
                    leaf = "weight" if path[2] == "kernel" else "bias"
                    val = _inv_conv3d(value) if path[2] == "kernel" else value
                    out[f"reg.{stage}.prob.{leaf}"] = val
                elif path[2] == "kernel":  # deconv sequential
                    out[f"reg.{stage}.{name}.0.weight"] = _inv_deconv3d(value)
                elif path[2] == "bn" and name in ("conv7", "conv9", "conv11"):
                    put_norm(f"reg.{stage}.{name}.1", path[3], value)
                elif path[2] == "conv":
                    out[f"reg.{stage}.{name}.conv.weight"] = _inv_conv3d(value)
                elif path[2] == "bn":
                    put_norm(f"reg.{stage}.{name}.bn", path[3], value)
                elif path[2] == "linear_agg":
                    idx = {"fc0": "0", "fc1": "2"}[path[3]]
                    leaf = "weight" if path[4] == "kernel" else "bias"
                    val = _linear(value) if path[4] == "kernel" else value
                    out[f"reg.{stage}.{name}.linear_agg.{idx}.{leaf}"] = val
                elif path[2] in ("pixel_conv", "spatial_conv"):
                    leaf = "weight" if path[3] == "kernel" else "bias"
                    inv = _inv_conv2d if path[2] == "pixel_conv" else _inv_conv3d
                    val = inv(value) if path[3] == "kernel" else value
                    out[f"reg.{stage}.{name}.{path[2]}.{leaf}"] = val
                else:
                    raise KeyError(f"unhandled reg path {path}")
                continue
            # ---- mono decoder ----
            if head == "mono_depth_decoder":
                name = path[1]
                m = re.fullmatch(r"convblock(\d)", name)
                if m:
                    tprefix = f"mono_depth_decoder.convblocks.{m.group(1)}"
                    if path[2] == "conv":
                        out[f"{tprefix}.conv.weight"] = _inv_conv2d(value)
                    else:
                        put_norm(f"{tprefix}.bn", path[3], value)
                    continue
                m = re.fullmatch(r"conv3x3_(\d)", name)
                if m:
                    leaf = "weight" if path[2] == "kernel" else "bias"
                    val = _inv_conv2d(value) if path[2] == "kernel" else value
                    out[f"mono_depth_decoder.conv3x3.{m.group(1)}.{leaf}"] = val
                    continue
                raise KeyError(f"unhandled mono path {path}")
            # ---- ASFF ----
            if head.startswith("asff_"):
                level = head[5:]
                name = path[1]
                if name == "weight_levels":
                    leaf = "weight" if path[2] == "kernel" else "bias"
                    val = _inv_conv2d(value) if path[2] == "kernel" else value
                    out[f"asff.{level}.weight_levels.{leaf}"] = val
                elif path[2] == "conv":
                    leaf = "weight" if path[3] == "kernel" else "bias"
                    val = _inv_conv2d(value) if path[3] == "kernel" else value
                    out[f"asff.{level}.{name}.conv.{leaf}"] = val
                else:
                    put_norm(f"asff.{level}.{name}.{path[2]}", path[3], value)
                continue
            raise KeyError(f"unhandled path {path}")

    for tprefix in bn_seen:
        if f"{tprefix}.running_mean" in out:
            out[f"{tprefix}.num_batches_tracked"] = np.zeros((), np.int64)
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .ckpt file and convert its model weights."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state.get("model", state)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return convert_state_dict(sd)


def main(argv=None):
    """CLI: convert a reference torch .ckpt into our msgpack weight file.

    python -m mvster_tpu.tools.convert_torch_ckpt in.ckpt out.msgpack
    """
    import argparse

    ap = argparse.ArgumentParser(description="torch ckpt -> flax msgpack")
    ap.add_argument("input", help="reference .ckpt (torch.save dict with 'model')")
    ap.add_argument("output", help="output .msgpack path")
    args = ap.parse_args(argv)

    variables = load_torch_checkpoint(args.input)
    from flax import serialization

    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(variables))
    n = sum(v.size for v in _iter_leaves(variables))
    print(f"wrote {args.output}: {n} parameters")


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
