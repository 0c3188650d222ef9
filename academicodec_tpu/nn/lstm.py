"""Scan-based LSTM bottleneck in channels-last layout.

TPU design: the input projection ``x @ W_ih^T`` for *all* timesteps is
hoisted out of the recurrence into one large batched matmul (MXU work);
``lax.scan`` then carries only the ``h @ W_hh`` recurrence. Gate order and
parameter shapes follow the torch convention (``i, f, g, o``; ``W_ih [4H, C]``,
``W_hh [4H, H]``) so reference checkpoints import as pure reshapes.

``use_pallas=True`` (2-layer stacks) routes through the fused Pallas kernel
(``ops/pallas/lstm.py``) that keeps weights in VMEM and advances both layers
in lockstep — the serving fast path. The scan path is the f32
parity/training reference.

Behavioral parity target: academicodec/modules/lstm.py:10-27 (SLSTM: stacked
LSTM with a skip connection, hidden size == input size).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _torch_lstm_init(hidden: int):
    bound = 1.0 / math.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTMLayer(nn.Module):
    """Single LSTM layer over ``[B, T, C]`` -> ``[B, T, H]``."""

    in_features: int
    hidden: int
    dtype: Any = jnp.float32
    precision: Any = None

    def setup(self):
        h4 = 4 * self.hidden
        init = _torch_lstm_init(self.hidden)
        self.weight_ih = self.param("weight_ih", init, (h4, self.in_features), self.dtype)
        self.weight_hh = self.param("weight_hh", init, (h4, self.hidden), self.dtype)
        self.bias_ih = self.param("bias_ih", init, (h4,), self.dtype)
        self.bias_hh = self.param("bias_hh", init, (h4,), self.dtype)

    def __call__(self, x: jnp.ndarray, carry=None):
        """Returns ``(y, (h, c))``; pass ``carry`` to continue a stream."""
        # One big [B*T, C] x [C, 4H] matmul up front (MXU), scan carries the rest.
        x_proj = (
            jnp.einsum("btc,hc->bth", x, self.weight_ih, precision=self.precision)
            + self.bias_ih
            + self.bias_hh
        )

        B = x.shape[0]
        if carry is None:
            carry = (
                jnp.zeros((B, self.hidden), self.dtype),
                jnp.zeros((B, self.hidden), self.dtype),
            )
        h0, c0 = carry
        w_hh = self.weight_hh

        def step(carry, xt):
            h, c = carry
            gates = xt + jnp.einsum("bh,gh->bg", h, w_hh, precision=self.precision)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        final, ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(ys, 0, 1), final


class SLSTM(nn.Module):
    """Stacked LSTM with skip connection, conv layout agnostic (``[B, T, C]``)."""

    dimension: int
    num_layers: int = 2
    skip: bool = True
    use_pallas: bool = False
    dtype: Any = jnp.float32
    precision: Any = None

    def setup(self):
        self.layers = [
            LSTMLayer(
                in_features=self.dimension,
                hidden=self.dimension,
                dtype=self.dtype,
                precision=self.precision,
                name=f"l{i}",
            )
            for i in range(self.num_layers)
        ]

    def init_carry(self, batch: int):
        z = lambda: (
            jnp.zeros((batch, self.dimension), self.dtype),
            jnp.zeros((batch, self.dimension), self.dtype),
        )
        return tuple(z() for _ in range(self.num_layers))

    def __call__(self, x: jnp.ndarray, carry=None, return_carry: bool = False):
        """``carry`` (from :meth:`init_carry`) continues a stream; with
        ``return_carry`` the final states are returned for the caller to
        store (the caller owns the cache — SLSTM is setup-style and cannot
        declare flax variables itself)."""
        if carry is not None:
            y = x
            finals = []
            for layer, hc in zip(self.layers, carry):
                y, final = layer(y, carry=hc)
                finals.append(final)
            if self.skip:
                y = y + x
            return (y, tuple(finals)) if return_carry else y
        if self.use_pallas and self.num_layers == 2:
            from academicodec_tpu.ops.pallas.lstm import lstm2_fused

            l0, l1 = self.layers
            y = lstm2_fused(
                x,
                l0.weight_ih,
                l0.weight_hh,
                l0.bias_ih + l0.bias_hh,
                l1.weight_ih,
                l1.weight_hh,
                l1.bias_ih + l1.bias_hh,
            )
        else:
            y = x
            for layer in self.layers:
                y, _ = layer(y)
        if self.skip:
            y = y + x
        return (y, None) if return_carry else y
