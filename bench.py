"""Headline benchmark: 24 kHz encode+decode realtime factor per chip.

Runs the flagship Encodec_24k_240d-sized SoundStream (n_filters=32, D=512,
ratios (6,5,4,2), 12 codebooks) end to end — SEANet encode, full-stack RVQ
tokenization, RVQ decode, SEANet decode — on the default JAX backend (the
real TPU chip under the driver) and prints ONE JSON line:

    {"metric": "encode_decode_rt_factor_24k", "value": N, "unit": "x_realtime",
     "vs_baseline": N/200}

``vs_baseline`` is against the 200x-realtime-per-chip north star
(BASELINE.md; the reference repo publishes no in-tree numbers).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.models.soundstream import SoundStream


def main():
    # persistent compile cache (harmless if the backend ignores it)
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    batch = 8
    seconds = 10
    sr = 24000

    # bf16 serving configuration (params + activations bf16; the codebook
    # distance matmuls accumulate in f32). Token-parity configs are f32 and
    # covered by tests/test_model_parity.py.
    model = SoundStream(
        n_filters=32,
        dimension=512,
        ratios=(6, 5, 4, 2),
        sample_rate=sr,
        target_bandwidths=(1, 2, 4, 8, 12),
        dtype=jnp.bfloat16,
        packed_conv=True,  # lanes-packed small-channel convs (ops/packed.py)
    )

    rng = jax.random.PRNGKey(0)
    wav = (jax.random.normal(rng, (batch, seconds * sr), jnp.float32) * 0.1).astype(
        jnp.bfloat16
    )
    # init on a short input: params are length-independent and the big-shape
    # init compile would waste minutes on relayed-compile backends
    init_wav = jnp.zeros((1, sr), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "rvq": rng}, init_wav, n_q=model.n_q, training=False
    )
    # make codebooks non-degenerate so argmin work is realistic
    cb = variables["codebook"]["quantizer"]["vq"]
    emb = jax.random.normal(rng, cb["embed"].shape, cb["embed"].dtype)
    variables = dict(variables)
    variables["codebook"] = {
        "quantizer": {
            "vq": {
                "embed": emb,
                "embed_avg": emb,
                "cluster_size": jnp.ones_like(cb["cluster_size"]),
                "inited": jnp.ones_like(cb["inited"]),
            }
        }
    }

    @jax.jit
    def roundtrip(variables, wav):
        codes = model.apply(variables, wav, method=SoundStream.encode)
        out = model.apply(variables, codes, method=SoundStream.decode)
        return codes, out

    # warmup / compile. NOTE: sync via host fetch — block_until_ready can
    # return early on relayed TPU backends.
    codes, out = roundtrip(variables, wav)
    np.asarray(out)

    # median of 5 windows: the relay adds high-variance overhead (CLAUDE.md,
    # ±20% between runs) that only ever inflates time — the median window is
    # a stabler estimate of steady-state chip throughput than one long run.
    # Sync each window via a TINY output slice: fetching the full [8, 240k]
    # wav over the relay costs tens of ms and would be billed to the chip.
    iters, windows = 8, 5
    per_window = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            codes, out = roundtrip(variables, wav)
        np.asarray(out[:, :8])  # depends on the full decode; transfers 128 B
        per_window.append(time.perf_counter() - t0)
    dt = sorted(per_window)[len(per_window) // 2]

    audio_seconds = batch * seconds * iters
    rt = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "encode_decode_rt_factor_24k",
                "value": round(rt, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rt / 200.0, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:
        # A process killed while holding the TPU wedges the relay for ~1 min
        # (CLAUDE.md): the next process fails backend init with "Backend
        # 'axon' is not in the list of known backends". JAX caches the failed
        # backend state in-process, so retry by re-exec'ing this script
        # (bounded; the counter rides an env var).
        import os
        import sys

        attempt = int(os.environ.get("ACADEMICODEC_BENCH_ATTEMPT", "0"))
        msg = str(e).lower()
        if attempt < 2 and ("backend" in msg or "axon" in msg):
            print(f"bench: backend init failed ({e}); retrying in 75 s "
                  f"(attempt {attempt + 1}/2)", file=sys.stderr, flush=True)
            time.sleep(75)
            os.environ["ACADEMICODEC_BENCH_ATTEMPT"] = str(attempt + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
