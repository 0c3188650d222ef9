"""Bandwidth-driven residual vector quantizer wrapper.

Behavioral parity target: academicodec/quantization/vq.py:27-122 — the
``n_q = floor(bandwidth / (log2(bins) * frame_rate / 1000))`` selection and
the ``(quantized, codes, bandwidth, mean_commit_loss)`` forward contract.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from academicodec_tpu.quant.core_vq import ResidualVQ


@dataclass
class QuantizedResult:
    quantized: jnp.ndarray
    codes: jnp.ndarray
    bandwidth: jnp.ndarray  # kb/s used, per batch item
    penalty: Optional[jnp.ndarray] = None
    metrics: dict = field(default_factory=dict)


class ResidualVectorQuantizer(nn.Module):
    """RVQ with bandwidth -> n_q selection (reference vq.py:27-122)."""

    dimension: int = 256
    n_q: int = 8
    bins: int = 1024
    decay: float = 0.99
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: float = 2.0
    dtype: Any = jnp.float32

    def setup(self):
        self.vq = ResidualVQ(
            num_quantizers=self.n_q,
            dim=self.dimension,
            codebook_size=self.bins,
            decay=self.decay,
            kmeans_init=self.kmeans_init,
            kmeans_iters=self.kmeans_iters,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
            dtype=self.dtype,
        )

    def get_bandwidth_per_quantizer(self, frame_rate: int) -> float:
        """kb/s added by each quantizer (reference vq.py:98-101; note the
        reference passes the frame rate in as ``sample_rate``)."""
        return math.log2(self.bins) * frame_rate / 1000

    def get_num_quantizers_for_bandwidth(
        self, frame_rate: int, bandwidth: Optional[float] = None
    ) -> int:
        bw_per_q = self.get_bandwidth_per_quantizer(frame_rate)
        n_q = self.n_q
        if bandwidth and bandwidth > 0.0:
            # min(self.n_q, ...): the stacked codebook has n_q layers, so
            # encode can never emit more streams than that — the reference's
            # ``self.layers[:n_q]`` (core_vq.py) clamps the same way via
            # Python slicing
            n_q = int(min(self.n_q, max(1, math.floor(bandwidth / bw_per_q))))
        return n_q

    def __call__(
        self,
        x: jnp.ndarray,
        frame_rate: int,
        bandwidth: Optional[Any] = None,
        n_q: Optional[jnp.ndarray] = None,
        training: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Forward on ``[B, T, D]``.

        ``bandwidth`` may be a static float (reference behavior) or ``n_q``
        may be passed directly as a traced int so a per-step random bandwidth
        draw does not trigger recompiles. Returns
        ``(quantized, codes [n_q_max,B,T], bw, mean_commit_loss)``.
        """
        bw_per_q = self.get_bandwidth_per_quantizer(frame_rate)
        if n_q is None:
            n_q = self.get_num_quantizers_for_bandwidth(frame_rate, bandwidth)
        quantized, codes, losses = self.vq(x, n_q=n_q, training=training)
        n_q_arr = jnp.asarray(n_q, jnp.float32)
        bw = n_q_arr * bw_per_q
        # Mean over the *active* layers (reference stacks n_q losses and
        # means them, vq.py:83-85; masked layers contribute zeros here).
        commit_loss = jnp.sum(losses) / jnp.maximum(n_q_arr, 1.0)
        return quantized, codes, bw, commit_loss

    def encode(
        self,
        x: jnp.ndarray,
        frame_rate: int,
        bandwidth: Optional[float] = None,
        st: int = 0,
    ) -> jnp.ndarray:
        """``[B,T,D]`` -> codes ``[n_q-st, B, T]`` (static n_q/st)."""
        n_q = self.get_num_quantizers_for_bandwidth(frame_rate, bandwidth)
        return self.vq.encode(x, n_q=n_q, st=st)

    def decode(self, codes: jnp.ndarray, st: int = 0) -> jnp.ndarray:
        """codes ``[n, B, T]`` -> ``[B, T, D]``."""
        return self.vq.decode(codes, st=st)
