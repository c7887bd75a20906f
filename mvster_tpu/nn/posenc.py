"""Depth positional encodings for the cost volume.

Declared-but-dormant in the reference (flag exists, never invoked —
mvs4net_utils.py:967-1001, MVS4Net.py:42-43); provided here as working,
wireable modules for capability parity.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class PosEncSine(nn.Module):
    """Sinusoidal encoding of the hypothesis depth values.

    x: (B, D, H, W, C) cost volume; depth: (B, D, H, W) hypotheses.
    Adds [sin(i*pi*d/T) for i<C/2] ++ [cos(i*pi*d/T) for i<C/2] per channel.
    """

    temperature: float = 1000.0

    @nn.compact
    def __call__(self, x, depth):
        c = x.shape[-1]
        d = depth / self.temperature  # (B, D, H, W)
        freqs = jnp.arange(c // 2, dtype=x.dtype) * math.pi
        angles = d[..., None] * freqs  # (B, D, H, W, C//2)
        pos = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
        return x + jax.lax.stop_gradient(pos)


class PosEncLearned(nn.Module):
    """Learned absolute depth-bin embedding, broadcast over space."""

    num_depths: int

    @nn.compact
    def __call__(self, x, depth=None):
        c = x.shape[-1]
        emb = self.param(
            "depth_embed", nn.initializers.uniform(scale=1.0),
            (self.num_depths, c),
        )
        return x + emb[None, :, None, None, :]
