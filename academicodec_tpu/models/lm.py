"""Token language model over RVQ code streams (the Encodec-paper LM).

The reference exports the two halves of Encodec's entropy-coding path —
the chunk-streamable transformer (modules/transformer.py) and the
arithmetic coder (quantization/ac.py) — but never wires them (SURVEY
§2.1/§2.2: both orphaned). This module is the missing piece: an
autoregressive LM over the ``n_q`` parallel token streams, usable both
teacher-forced (one pass at compression time) and step-by-step with carried
transformer state (decompression).

Architecture (Encodec-style): per-stream input embeddings summed, a
streaming transformer trunk, per-stream softmax heads. BOS is an extra
embedding row (index ``bins``).
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from academicodec_tpu.nn.transformer import StreamingTransformerEncoder


class RVQTokenLM(nn.Module):
    n_q: int
    bins: int = 1024
    dim: int = 128
    num_heads: int = 8
    num_layers: int = 4
    hidden_scale: float = 4.0
    past_context: int = 1000
    dtype: Any = jnp.float32

    def setup(self):
        self.embeddings = self.param(
            "embeddings",
            nn.initializers.normal(0.02),
            (self.n_q, self.bins + 1, self.dim),
            self.dtype,
        )
        self.transformer = StreamingTransformerEncoder(
            dim=self.dim,
            hidden_scale=self.hidden_scale,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            past_context=self.past_context,
            dtype=self.dtype,
        )
        self.heads = [
            nn.Dense(self.bins, dtype=self.dtype, name=f"head_{q}")
            for q in range(self.n_q)
        ]

    def init_states(self, batch: int) -> List[jnp.ndarray]:
        """Fixed-size rolling transformer states (one compile for all steps)."""
        return [
            jnp.zeros((batch, self.past_context, self.dim), self.dtype)
            for _ in range(self.num_layers)
        ]

    def __call__(
        self,
        prev_codes: jnp.ndarray,
        states: Optional[List[jnp.ndarray]] = None,
        offset: Any = 0,
        fixed_state: bool = False,
    ):
        """``prev_codes [B, T, n_q]`` (use ``bins`` as BOS at t=0) ->
        ``(logits [B, T, n_q, bins], new_states, new_offset)``.

        Teacher-forced compression: feed the full shifted sequence once.
        Decompression: feed one step at a time, carrying ``states``/``offset``.
        """
        B, T, n_q = prev_codes.shape
        # sum of per-stream embeddings (Encodec LM input convention)
        emb = 0.0
        for q in range(self.n_q):
            emb = emb + self.embeddings[q][prev_codes[..., q]]
        y, new_states, new_offset = self.transformer(
            emb, states=states, offset=offset, fixed_state=fixed_state
        )
        logits = jnp.stack([head(y) for head in self.heads], axis=2)  # [B,T,n_q,bins]
        return logits, new_states, new_offset

    def probabilities(
        self, prev_codes, states=None, offset: Any = 0, fixed_state: bool = False
    ):
        logits, new_states, new_offset = self(prev_codes, states, offset, fixed_state)
        return jax.nn.softmax(logits, axis=-1), new_states, new_offset
