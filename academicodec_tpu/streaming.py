"""Streaming codec sessions: stateful chunked encode/decode for causal models.

The reference ships a fully-causal architecture (``causal`` flag through
every conv, ``trim_right_ratio``; SURVEY §5) but no runtime that exploits
it. These sessions carry the per-layer conv/LSTM state across fixed-size
chunks — one compiled executable per direction, exact equality with
full-utterance causal inference (``tests/test_streaming.py``,
``tests/test_hificodec_causal.py``).

Chunk sizes must be a multiple of the model hop length so every strided
conv consumes whole windows and the carried buffers stay static-shaped
(token-domain sessions take any chunk size — their convs are stride-1).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from academicodec_tpu.models.soundstream import SoundStream


class _StreamingSession:
    """Shared cold/warm-jit plumbing: ``apply_fn(variables, chunk)`` must
    return ``(out, mutated)`` from a ``model.apply(..., mutable=["cache"])``
    call; the cache pytree is threaded across ``process`` calls."""

    def __init__(self, variables: Any, apply_fn):
        self.weights = {k: v for k, v in variables.items() if k != "cache"}
        self.cache = None

        def step(weights, cache, chunk):
            vs = dict(weights)
            if cache is not None:
                vs["cache"] = cache
            out, mutated = apply_fn(vs, chunk)
            return out, mutated["cache"]

        self._step_cold = jax.jit(lambda w, c: step(w, None, c))
        self._step_warm = jax.jit(lambda w, cache, c: step(w, cache, c))

    def reset(self):
        self.cache = None

    def process(self, chunk: jnp.ndarray) -> jnp.ndarray:
        if self.cache is None:
            out, self.cache = self._step_cold(self.weights, chunk)
        else:
            out, self.cache = self._step_warm(self.weights, self.cache, chunk)
        return out


class StreamingEncoder(_StreamingSession):
    """Feed ``[B, chunk]`` waveform chunks, get ``[n_q, B, chunk/hop]`` codes."""

    def __init__(
        self,
        model: SoundStream,
        variables: Any,
        target_bw: Optional[float] = None,
        st: int = 0,
    ):
        assert model.causal, "streaming requires a causal model"
        self.model = model
        bw = target_bw if target_bw is not None else model.target_bandwidths[-1]
        super().__init__(
            variables,
            lambda vs, chunk: model.apply(
                vs, chunk, target_bw=bw, st=st,
                method=SoundStream.encode_stream, mutable=["cache"],
            ),
        )


class StreamingDecoder(_StreamingSession):
    """Feed ``[n, B, frames]`` code chunks, get ``[B, frames*hop]`` waveform."""

    def __init__(self, model: SoundStream, variables: Any):
        assert model.causal, "streaming requires a causal model"
        self.model = model
        super().__init__(
            variables,
            lambda vs, codes: model.apply(
                vs, codes, method=SoundStream.decode_stream, mutable=["cache"]
            ),
        )


class StreamingVQVAEDecoder(_StreamingSession):
    """Chunked HiFi-Codec decode for causal configs (``HiFiCodecConfig
    (causal=True)``): feed ``[B, frames, 4]`` acoustic-token chunks, get
    ``[B, frames*hop]`` waveform — the incremental-synthesis serving mode
    for VALL-E/SoundStorm-style token generators (beyond the reference,
    which has no streaming runtime at all)."""

    def __init__(self, model, variables: Any):
        from academicodec_tpu.models.hificodec import VQVAE

        assert model.config.causal, "streaming decode requires a causal config"
        self.model = model
        super().__init__(
            variables,
            lambda vs, codes: model.apply(
                vs, codes, method=VQVAE.decode_stream, mutable=["cache"]
            ),
        )
