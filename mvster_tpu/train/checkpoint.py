"""Checkpoint manager: pytree state <-> msgpack files, step-indexed + resume.

Replaces the torch.save/{resume,loadckpt} flow (train_mvs4.py:130-137,
364-379) with a flax-serialization manager.  Unlike the reference (which only
writes the final epoch yet scans for epoch-indexed files on resume — a
mismatch noted in SURVEY.md section 3.4), this manager writes every save_freq
epochs AND tracks the latest checkpoint explicitly, so preemption-resume on
TPU pods works.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
from flax import serialization


class CheckpointManager:
    PATTERN = re.compile(r"model_(\d+)\.msgpack$")

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"model_{step:08d}.msgpack")

    def all_steps(self) -> list[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = self.PATTERN.search(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def save(self, step: int, state) -> str:
        """state: any pytree (e.g. {params, batch_stats, opt_state, epoch})."""
        state = jax.device_get(state)
        path = self._path(step)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(state))
        os.replace(tmp, path)
        for old in self.all_steps()[: -self.keep]:
            os.remove(self._path(old))
        return path

    def restore(self, target, step: int | None = None):
        """Restore into the structure of `target`; latest step if unspecified.

        Returns (state, step) or (None, None) when no checkpoint exists.
        """
        steps = self.all_steps()
        if not steps:
            return None, None
        step = steps[-1] if step is None else step
        with open(self._path(step), "rb") as f:
            data = f.read()
        return serialization.from_bytes(target, data), step

    def load_weights(self, target_params, path: str):
        """Weights-only load (the reference's --loadckpt fine-tune path).

        Accepts either a full train-state msgpack (uses its "params" and
        "batch_stats") or a torch .ckpt (routed through the converter).
        """
        if path.endswith(".ckpt"):
            from mvster_tpu.tools.convert_torch_ckpt import load_torch_checkpoint

            return load_torch_checkpoint(path)
        with open(path, "rb") as f:
            data = f.read()
        state = serialization.msgpack_restore(data)
        if "state" in state:  # full train-state checkpoint from tools/train.py
            state = state["state"]
        out = {"params": state["params"]}
        if state.get("batch_stats"):
            out["batch_stats"] = state["batch_stats"]
        return jax.tree_util.tree_map(np.asarray, out)
