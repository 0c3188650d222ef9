"""Chunk-streamable transformer encoder (the Encodec LM hook).

Behavioral parity target: academicodec/modules/transformer.py:14-141 —
sinusoidal positions with a running ``offset``, per-layer cached past
states trimmed to ``past_context``, and the causal band mask
``0 <= q_pos - k_pos <= past_context``. Exported by the reference but
unwired in-tree (SURVEY §2.1); provided here for API parity and as the
backbone for entropy-coding LMs.

TPU notes: attention over ``[B, T, C]`` with one fused QKV projection; the
band mask is additive (-inf) so XLA fuses it into the softmax. For long
sequences, stream chunks through ``__call__`` carrying ``states`` — that is
the sequence-scaling story for this O(T) codec stack (SURVEY §5).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def create_sin_embedding(
    positions: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """positions ``[B, T, 1]`` -> embeddings ``[B, T, dim]``
    (reference transformer.py:14-28: cos first, then sin)."""
    assert dim % 2 == 0
    half = dim // 2
    adim = jnp.arange(half).reshape(1, 1, -1)
    phase = positions / (max_period ** (adim / (half - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def _torch_linear_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _MHA(nn.Module):
    """Multi-head attention with torch MultiheadAttention param layout
    (packed ``in_proj`` [3E, E], ``out_proj``) for checkpoint import."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, q, k, v, mask):
        E, H = self.dim, self.num_heads
        hd = E // H
        w_in = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * E, E), self.dtype
        )
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,), self.dtype)
        w_out = self.param("out_proj_kernel", _torch_linear_init(E), (E, E), self.dtype)
        b_out = self.param("out_proj_bias", nn.initializers.zeros, (E,), self.dtype)

        def proj(x, w, b):
            return jnp.einsum("btc,oc->bto", x, w, precision=self.precision) + b

        qh = proj(q, w_in[:E], b_in[:E])
        kh = proj(k, w_in[E : 2 * E], b_in[E : 2 * E])
        vh = proj(v, w_in[2 * E :], b_in[2 * E :])

        def split(x):
            B, T, _ = x.shape
            return x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # [B,H,T,hd]

        qh, kh, vh = split(qh), split(kh), split(vh)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, precision=self.precision) / math.sqrt(hd)
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh, precision=self.precision)
        B, _, T, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)
        return jnp.einsum("btc,oc->bto", out, w_out, precision=self.precision) + b_out


class StreamingTransformerEncoderLayer(nn.Module):
    """Post-norm (torch default) encoder layer with past-state attention."""

    dim: int
    num_heads: int
    hidden_dim: int
    gelu: bool = True
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_past: jnp.ndarray,
        past_context: int,
        offset: Any = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, C = x.shape
        H = x_past.shape[1]
        keys = jnp.concatenate([x_past, x], axis=1)
        q_pos = jnp.arange(H, T + H).reshape(-1, 1)
        k_pos = jnp.arange(T + H).reshape(1, -1)
        delta = q_pos - k_pos
        valid = (delta >= 0) & (delta <= past_context)
        if offset is not None:
            # fixed-size rolling state: slots before the stream start are
            # zero-padding, not history — mask them (absolute k position
            # of buffer slot i is offset - H + i)
            k_abs = offset - H + jnp.arange(T + H).reshape(1, -1)
            valid = valid & (k_abs >= 0)

        sa_input = x
        attn = _MHA(
            dim=self.dim,
            num_heads=self.num_heads,
            dtype=self.dtype,
            precision=self.precision,
            name="self_attn",
        )(x, keys, keys, valid)
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x + attn)

        h = nn.Dense(
            self.hidden_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            precision=self.precision,
            name="linear1",
        )(x)
        h = jax.nn.gelu(h, approximate=False) if self.gelu else jax.nn.relu(h)
        h = nn.Dense(
            self.dim,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            precision=self.precision,
            name="linear2",
        )(h)
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x + h)
        return x, sa_input


class StreamingTransformerEncoder(nn.Module):
    """Transformer encoder with chunk streaming (carried per-layer states).

    ``__call__(x [B,T,C], states, offset) -> (y, new_states, new_offset)``.
    """

    dim: int
    hidden_scale: float = 4.0
    num_heads: int = 8
    num_layers: int = 5
    max_period: float = 10000.0
    past_context: int = 1000
    gelu: bool = True
    norm_in: bool = True
    dtype: Any = jnp.float32
    precision: Any = None

    def init_states(self, batch: int) -> List[jnp.ndarray]:
        """Fixed-size rolling states (``[B, past_context, C]`` zeros per
        layer): state shapes never change between chunks, so step-by-step
        decoding compiles ONCE (growing states recompile every step)."""
        return [
            jnp.zeros((batch, self.past_context, self.dim), self.dtype)
            for _ in range(self.num_layers)
        ]

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        states: Optional[List[jnp.ndarray]] = None,
        offset: Any = 0,
        fixed_state: bool = False,
    ):
        B, T, C = x.shape
        if states is None:
            if fixed_state:
                states = self.init_states(B)
            else:
                states = [jnp.zeros_like(x[:, :1]) for _ in range(self.num_layers)]
        positions = jnp.arange(T).reshape(1, -1, 1) + offset
        pos_emb = create_sin_embedding(positions, C, max_period=self.max_period)

        if self.norm_in:
            x = nn.LayerNorm(dtype=self.dtype, name="norm_in")(x)
        x = x + pos_emb

        new_states: List[jnp.ndarray] = []
        hidden = int(C * self.hidden_scale)
        for i, layer_state in enumerate(states):
            x, new_layer_state = StreamingTransformerEncoderLayer(
                dim=self.dim,
                num_heads=self.num_heads,
                hidden_dim=hidden,
                gelu=self.gelu,
                dtype=self.dtype,
                precision=self.precision,
                name=f"layers_{i}",
            )(x, layer_state, self.past_context, offset=offset if fixed_state else None)
            new_layer_state = jnp.concatenate([layer_state, new_layer_state], axis=1)
            new_states.append(new_layer_state[:, -self.past_context :, :])
        return x, new_states, offset + T
