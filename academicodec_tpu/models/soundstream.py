"""SoundStream / Encodec generator: SEANet encoder -> RVQ -> SEANet decoder.

This is the shared generator for both the Encodec and SoundStream recipe
families (they differ only in discriminators/losses wired by the trainer).
Behavioral parity target: models/encodec/net3.py:12-61, including the
``n_q = 1000 * bw_max // (ceil(sr/hop) * 10)`` codebook-count derivation.

Public waveform layout: ``[B, T]`` float32 in [-1, 1]. Internally everything
is channels-last ``[B, T, C]``.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.nn.seanet import SEANetDecoder, SEANetEncoder
from academicodec_tpu.quant.vq import ResidualVectorQuantizer


class SoundStream(nn.Module):
    n_filters: int = 32
    dimension: int = 512
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    sample_rate: int = 24000
    target_bandwidths: Tuple[float, ...] = (7.5, 15.0)
    bins: int = 1024
    causal: bool = False
    pad_mode: str = "reflect"
    norm: str = "weight_norm"
    lstm_use_pallas: bool = False
    rvq_use_pallas: bool = False  # fused serving kernel (ops/pallas/rvq.py)
    packed_conv: bool = False  # lanes-packed small-channel convs (ops/packed.py)
    dtype: Any = jnp.float32
    precision: Any = None

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @property
    def frame_rate(self) -> int:
        return math.ceil(self.sample_rate / self.hop_length)

    @property
    def n_q(self) -> int:
        # reference: net3.py:25-26
        return int(
            1000 * self.target_bandwidths[-1] // (math.ceil(self.sample_rate / self.hop_length) * 10)
        )

    @property
    def bits_per_codebook(self) -> int:
        return int(math.log2(self.bins))

    def n_q_for_bandwidth(self, bw: Optional[float]) -> int:
        # clamped to the quantizer's actual layer count: when bins != 1024
        # the bandwidth floor can exceed n_q (whose reference formula,
        # net3.py:25-26, hard-codes 10-bit codebooks) and the reference's
        # ``layers[:n_q]`` slice clamps implicitly — encode emits at most
        # n_q streams, so this helper must agree with it
        bw_per_q = math.log2(self.bins) * self.frame_rate / 1000
        if bw and bw > 0:
            return int(min(self.n_q, max(1, math.floor(bw / bw_per_q))))
        return self.n_q

    def sample_n_q(self, rng: jax.Array) -> jnp.ndarray:
        """Draw the per-step random bandwidth as a *traced* n_q (one compiled
        graph for all bandwidths; reference draws Python-side, net3.py:40-41)."""
        choices = jnp.asarray(
            [self.n_q_for_bandwidth(bw) for bw in self.target_bandwidths], jnp.int32
        )
        idx = jax.random.randint(rng, (), 0, len(self.target_bandwidths))
        return choices[idx]

    def setup(self):
        common = dict(
            n_filters=self.n_filters,
            dimension=self.dimension,
            ratios=tuple(self.ratios),
            causal=self.causal,
            pad_mode=self.pad_mode,
            norm=self.norm,
            lstm_use_pallas=self.lstm_use_pallas,
            dtype=self.dtype,
            precision=self.precision,
        )
        self.encoder = SEANetEncoder(packed_head=self.packed_conv, **common)
        self.decoder = SEANetDecoder(packed_tail=self.packed_conv, **common)
        self.quantizer = ResidualVectorQuantizer(
            dimension=self.dimension, n_q=self.n_q, bins=self.bins, dtype=self.dtype
        )

    def __call__(
        self,
        x: jnp.ndarray,
        n_q: Optional[jnp.ndarray] = None,
        training: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Training/eval forward. ``x: [B, T]`` -> ``(recon [B, T],
        commit_loss, codes [n_q_max, B, frames])``."""
        e = self.encoder(x[..., None])
        quantized, codes, _bw, commit_loss = self.quantizer(
            e, self.frame_rate, n_q=n_q if n_q is not None else self.n_q, training=training
        )
        o = self.decoder(quantized)
        return o[..., 0], commit_loss, codes

    def encode(
        self, x: jnp.ndarray, target_bw: Optional[float] = None, st: int = 0
    ) -> jnp.ndarray:
        """``x: [B, T]`` -> codes ``[n_q, B, frames]`` (reference net3.py:47-56)."""
        e = self.encoder(x[..., None])
        bw = target_bw if target_bw is not None else self.target_bandwidths[-1]
        if self.rvq_use_pallas and st == 0:
            from academicodec_tpu.ops.pallas.rvq import rvq_encode_fused_btd

            n_q = self.n_q_for_bandwidth(bw)
            embed = self.quantizer.vq.embed_v.value[:n_q]
            return rvq_encode_fused_btd(e, embed)
        return self.quantizer.encode(e, self.frame_rate, bw, st=st)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes ``[n, B, frames]`` -> wav ``[B, T]`` (reference net3.py:58-61)."""
        quantized = self.quantizer.decode(codes)
        return self.decoder(quantized)[..., 0]

    # ------------------------------------------------------------------
    # chunked streaming inference (causal models; see streaming.py for the
    # session wrapper). The reference ships the causal architecture but no
    # streaming runtime (SURVEY §5).
    def encode_stream(
        self, x: jnp.ndarray, target_bw: Optional[float] = None, st: int = 0
    ) -> jnp.ndarray:
        """One stream chunk ``[B, chunk]`` (chunk % hop_length == 0) ->
        codes ``[n_q, B, chunk/hop]``. Apply with ``mutable=['cache']``."""
        e = self.encoder(x[..., None], streaming=True)
        bw = target_bw if target_bw is not None else self.target_bandwidths[-1]
        return self.quantizer.encode(e, self.frame_rate, bw, st=st)

    def decode_stream(self, codes: jnp.ndarray) -> jnp.ndarray:
        """One chunk of codes ``[n, B, frames]`` -> wav ``[B, frames*hop]``.
        Apply with ``mutable=['cache']``."""
        quantized = self.quantizer.decode(codes)
        return self.decoder(quantized, streaming=True)[..., 0]
