"""Post-conv normalization modules (channels-last).

Reference counterpart: academicodec/modules/norm.py + conv.py's
``get_norm_module`` (conv.py:38-55). The reference's ``ConvLayerNorm`` has a
bare ``return`` and yields None (SURVEY §2.9); this one works. In
channels-last layout no permutes are needed at all — the reference's
rearrange dance (norm.py:25-28) disappears.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvLayerNorm(nn.Module):
    """LayerNorm over the channel axis of ``[B, T, C]`` conv activations."""

    channels: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype, name="ln")(x)


class TimeGroupNorm(nn.Module):
    """torch ``GroupNorm(1, C)`` equivalent: normalize over (T, C) per item.

    Not causal-safe (statistics span the whole utterance), matching the
    reference's refusal to combine it with causal mode (conv.py:49-53).
    """

    channels: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), self.dtype)
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.var(x, axis=(-2, -1), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
