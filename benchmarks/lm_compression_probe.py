"""LM entropy-coding win: measured kbps vs raw bit-packed ECDC.

Completes the two-stage Encodec compression pipeline end to end on real
(synthetic-corpus) token statistics and reports the measured file sizes —
the number BENCHMARKS.md's "LM compression" row cites. Pipeline:

1. load the generator checkpoint saved by
   ``benchmarks/train_validation.py --save_path`` (a codec actually trained
   on the synthetic speech corpus, so its token streams carry the temporal
   structure the LM can exploit; a random codec's near-uniform tokens
   would show no win),
2. train ``RVQTokenLM`` (reference-paper scale: dim 200, 5 layers) teacher
   forced on that codec's token streams — at crops AT LEAST as long as the
   streams to be compressed (sinusoidal positions / attention context seen
   in training bound the in-distribution stream length),
3. compress held-out streams both ways — raw bit packing
   (``codec/compress.compress_codes``, 10 bits/code) and LM + arithmetic
   coding (``codec/lm_compress``) — and verify the LM files decode back
   bit-exactly.

Reference surface: the unwired ac.py/transformer.py pair (SURVEY §2.2);
Encodec paper Table 4 reports ~25-40% entropy-coding savings at these
bitrates.

Usage:
    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/train_validation.py \
        --steps 4000 --save_path /tmp/val_ckpt
    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/lm_compression_probe.py \
        --codec_ckpt /tmp/val_ckpt/val_encodec_00004000
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.codec.compress import compress_codes
from academicodec_tpu.codec.lm_compress import (
    compress_tokens_with_lm,
    decompress_tokens_with_lm,
)
from academicodec_tpu.train.encodec import EncodecTrainConfig, EncodecTrainer
from academicodec_tpu.train.lm import LMTrainConfig, LMTrainer
from academicodec_tpu.utils.checkpoint import load_checkpoint
from benchmarks.train_validation import speechlike_batch


def main():
    p = argparse.ArgumentParser("lm_compression_probe")
    p.add_argument("--codec_ckpt", type=str, required=True)
    p.add_argument("--target_bw", type=float, default=3.0,
                   help="3 kbps raw = 3 codebooks at 100 Hz frame rate")
    p.add_argument("--lm_steps", type=int, default=3000)
    p.add_argument("--lm_batch", type=int, default=8)
    p.add_argument("--cache_batches", type=int, default=100,
                   help="token batches pre-encoded once and cycled during LM "
                   "training; host synthesis+encode per step would otherwise "
                   "dominate wall time on a 1-core host (held-out streams "
                   "below always use fresh draws)")
    p.add_argument("--streams", type=int, default=3)
    p.add_argument("--stream_seconds", type=float, default=5.0)
    p.add_argument("--train_seconds", type=float, default=None,
                   help="LM training crop length; default = stream_seconds. "
                   "MUST cover the compressed stream length: the trunk's "
                   "sinusoidal positions and attention context are only "
                   "in-distribution up to the trained length (a 1 s-crop LM "
                   "coded 5 s held-out streams at 11.0 bits/token vs 5.4 "
                   "train — worse than the 10-bit raw packing)")
    args = p.parse_args()

    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    sr = 24000
    cfg = EncodecTrainConfig(
        sr=sr, ratios=(6, 5, 4, 2), target_bandwidths=(1, 2, 4, 8, 12)
    )
    model = EncodecTrainer(cfg).model
    payload = load_checkpoint(args.codec_ckpt)
    variables = {"params": payload["g_params"], **payload["g_extra"]}
    n_q = model.n_q_for_bandwidth(args.target_bw)

    encode = jax.jit(
        lambda v, w: model.apply(
            v, w, target_bw=args.target_bw, method=type(model).encode
        )
    )

    # ---- LM training on the frozen codec's token streams ----------------
    lm_trainer = LMTrainer(
        LMTrainConfig(n_q=n_q, bins=model.bins, decay_steps=args.lm_steps)
    )
    rng = np.random.default_rng(7)
    seg = int((args.train_seconds or args.stream_seconds) * sr)
    cache = []
    for _ in range(args.cache_batches):
        wav = jnp.asarray(speechlike_batch(rng, args.lm_batch, seg, sr))
        cache.append(
            jnp.transpose(encode(variables, wav), (1, 2, 0)).astype(jnp.int32)
        )
    state = lm_trainer.init_state(jax.random.PRNGKey(0), cache[0])
    order = np.random.default_rng(11)

    t0 = time.perf_counter()
    bpt = None
    for step in range(1, args.lm_steps + 1):
        codes = cache[order.integers(len(cache))]
        state, metrics = lm_trainer.train_step(state, codes)
        if step % 200 == 0 or step == args.lm_steps:
            bpt = float(np.asarray(metrics["bits_per_token"]))
            print(json.dumps({"lm_step": step, "bits_per_token": round(bpt, 3)}),
                  flush=True)
    t_train = time.perf_counter() - t0

    # ---- held-out compression ------------------------------------------
    lm = lm_trainer.model
    lm_vars = {"params": jax.device_get(state.params)}
    held_rng = np.random.default_rng(4242)
    seconds = args.stream_seconds
    raw_bits = lm_bits = 0
    total_tokens = 0
    for s in range(args.streams):
        wav = jnp.asarray(speechlike_batch(held_rng, 1, int(seconds * sr), sr))
        codes = np.asarray(encode(variables, wav))[:, 0, :]  # [n_q, T]
        meta = dict(sr=sr, target_bw=float(args.target_bw))
        raw = compress_codes(
            codes, bits_per_codebook=model.bits_per_codebook, metadata=meta
        )
        enc = compress_tokens_with_lm(lm, lm_vars, codes, metadata=meta)
        if s == 0:  # decode-side verification: bit-exact roundtrip
            back, _ = decompress_tokens_with_lm(lm, lm_vars, enc)
            assert np.array_equal(back, codes), "LM roundtrip mismatch"
        raw_bits += len(raw) * 8
        lm_bits += len(enc) * 8
        total_tokens += codes.size

    dur = args.streams * seconds
    out = {
        "metric": "lm_compression_kbps",
        "raw_kbps": round(raw_bits / dur / 1000, 3),
        "lm_kbps": round(lm_bits / dur / 1000, 3),
        "saving_pct": round(100 * (1 - lm_bits / raw_bits), 1),
        "lm_bits_per_token": round(lm_bits / total_tokens, 3),
        "train_bits_per_token": round(bpt, 3),
        "n_q": n_q,
        "lm_steps": args.lm_steps,
        "train_seconds": args.train_seconds or args.stream_seconds,
        "lm_train_min": round(t_train / 60, 1),
        "roundtrip_exact": True,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
