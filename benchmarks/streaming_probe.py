"""Streaming-session latency: causal Encodec chunked encode+decode on-chip.

Real-time serving metric: per-chunk wall latency of the streaming sessions
(`streaming.py`) for a causal Encodec_24k_240d-sized model at several chunk
sizes, batch 1 (the interactive case). A chunk of H frames = H*240 samples
= H*10 ms of audio at 24 kHz; real-time streaming needs per-chunk latency
below the chunk duration.

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/streaming_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.streaming import StreamingDecoder, StreamingEncoder


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    model = SoundStream(
        n_filters=32, dimension=512, ratios=(6, 5, 4, 2), sample_rate=24000,
        target_bandwidths=(1, 2, 4, 8, 12), causal=True, dtype=jnp.bfloat16,
    )
    hop = model.hop_length  # 240
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "rvq": rng}, jnp.zeros((1, 2400), jnp.bfloat16),
        n_q=model.n_q, training=False,
    )

    results = {}
    for frames in (1, 4, 16):
        chunk_samples = frames * hop
        enc = StreamingEncoder(model, variables, target_bw=12)
        dec = StreamingDecoder(model, variables)
        wav = (jax.random.normal(rng, (1, chunk_samples)) * 0.1).astype(jnp.bfloat16)
        # warm both executables (cold + warm cache paths)
        codes = enc.process(wav)
        out = dec.process(codes)
        codes = enc.process(wav)
        out = dec.process(codes)
        np.asarray(out[0, :4], np.float32)
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            codes = enc.process(wav)
            out = dec.process(codes)
        np.asarray(out[0, :4], np.float32)
        dt_ms = (time.perf_counter() - t0) / iters * 1e3
        audio_ms = 1000 * chunk_samples / model.sample_rate
        results[f"chunk{frames}f_ms"] = round(dt_ms, 2)
        results[f"chunk{frames}f_rtf"] = round(audio_ms / dt_ms, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
