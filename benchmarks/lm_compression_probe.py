"""LM entropy-coding win: measured kbps vs raw bit-packed ECDC, per length.

Completes the two-stage Encodec compression pipeline end to end on real
(synthetic-corpus) token statistics and reports the measured file sizes —
the numbers BENCHMARKS.md's "LM entropy coding" section cites. Pipeline:

1. load the generator checkpoint saved by
   ``benchmarks/train_validation.py --save_path`` (a codec actually trained
   on the synthetic speech corpus, so its token streams carry the temporal
   structure the LM can exploit; a random codec's near-uniform tokens
   would show no win). ``--family hificodec`` probes the GRVQ 4-stream
   tokens instead (cli/train_lm.py --family hificodec path).
2. train ``RVQTokenLM`` (reference-paper scale: dim 200, 5 layers) teacher
   forced on that codec's token streams at LENGTH-MIXED crops
   (``--train_lengths``, default 1/5/10 s) so positions and context are
   in-distribution across the whole span,
3. compress held-out streams at each ``--lengths`` entry three ways — raw
   bit packing (``codec/compress.compress_codes``), pure LM + arithmetic
   coding (``codec/lm_compress``), and the GUARDED production path
   (``compress_tokens_guarded``: LM coding only when actually smaller) —
   and verify LM-coded streams decode back bit-exactly.

The guarded column is the shipping behavior: it can never exceed raw, even
at lengths far outside the LM's training span (30/60 s probes).

Reference surface: the unwired ac.py/transformer.py pair (SURVEY §2.2);
Encodec paper Table 4 reports ~25-40% entropy-coding savings at these
bitrates.

Usage:
    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/lm_compression_probe.py \
        --codec_ckpt benchmarks/ckpts/val_encodec_00008000 \
        --lengths 1 5 30 60
"""

from __future__ import annotations

import argparse
import json
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.codec.compress import (
    compress_codes,
    compress_tokens_guarded,
)
from academicodec_tpu.codec.lm_compress import (
    compress_tokens_with_lm,
    decompress_tokens_with_lm,
)
from academicodec_tpu.train.lm import LMTrainConfig, LMTrainer
from academicodec_tpu.utils.checkpoint import load_checkpoint
from benchmarks.train_validation import speechlike_batch, speechlike_batch_rich


def main():
    p = argparse.ArgumentParser("lm_compression_probe")
    p.add_argument("--codec_ckpt", type=str, required=True)
    p.add_argument("--family", choices=("encodec", "hificodec"),
                   default="encodec")
    p.add_argument("--target_bw", type=float, default=3.0,
                   help="encodec only: 3 kbps raw = 3 codebooks at 100 Hz")
    p.add_argument("--lm_steps", type=int, default=3000)
    p.add_argument("--lm_batch", type=int, default=8)
    p.add_argument("--cache_batches", type=int, default=99,
                   help="token batches pre-encoded once and cycled during LM "
                   "training (split evenly over --train_lengths); host "
                   "synthesis+encode per step would otherwise dominate wall "
                   "time on a 1-core host (held-out streams always use "
                   "fresh draws)")
    p.add_argument("--streams", type=int, default=3)
    p.add_argument("--lengths", type=float, nargs="+", default=[1.0, 5.0],
                   help="held-out stream lengths (s) to compress; lengths "
                   "beyond the trained span show the guard's raw fallback")
    p.add_argument("--train_lengths", type=float, nargs="+",
                   default=[1.0, 5.0, 10.0],
                   help="LENGTH-MIXED LM training crop lengths (s): positions "
                   "and attention context train across the whole span, so "
                   "every prefix length is in-distribution (a single-length "
                   "1 s LM coded 5 s streams at 11.0 bits/token — worse "
                   "than raw)")
    p.add_argument("--corpus", choices=("legacy", "rich"), default="rich",
                   help="synthetic corpus for LM training AND held-out "
                   "streams — must match the corpus the codec checkpoint "
                   "was trained on (token statistics differ)")
    args = p.parse_args()
    gen = speechlike_batch if args.corpus == "legacy" else speechlike_batch_rich

    import os

    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    # ACADEMICODEC_CACHE_BASE: give a concurrent CPU-side probe its own
    # cache dir so it never shares write traffic with a running suite
    enable_persistent_cache(
        os.environ.get("ACADEMICODEC_CACHE_BASE", "/tmp/academicodec_tpu_xla_cache")
    )

    sr = 24000
    if args.family == "encodec":
        from academicodec_tpu.train.encodec import EncodecTrainConfig, EncodecTrainer

        cfg = EncodecTrainConfig(
            sr=sr, ratios=(6, 5, 4, 2), target_bandwidths=(1, 2, 4, 8, 12)
        )
        model = EncodecTrainer(cfg).model
        payload = load_checkpoint(args.codec_ckpt)
        variables = {"params": payload["g_params"], **payload["g_extra"]}
        n_q, bins = model.n_q_for_bandwidth(args.target_bw), model.bins
        bits = max(1, math.ceil(math.log2(bins)))
        hop = 240

        _enc = jax.jit(
            lambda v, w: model.apply(
                v, w, target_bw=args.target_bw, method=type(model).encode
            )
        )
        encode_bt = lambda v, w: jnp.transpose(_enc(v, w), (1, 2, 0))  # [B,T,nq]
    else:
        from academicodec_tpu.train.hificodec import (
            HiFiCodecTrainConfig,
            HiFiCodecTrainer,
        )

        trainer = HiFiCodecTrainer(HiFiCodecTrainConfig())
        model = trainer.model
        payload = load_checkpoint(args.codec_ckpt)
        variables = {"params": payload["g_params"], **payload["g_extra"]}
        hcfg = model.config
        n_q, bins = 2 * hcfg.n_code_groups, hcfg.n_codes
        bits = max(1, math.ceil(math.log2(bins)))
        hop = int(np.prod(hcfg.upsample_rates))
        encode_bt = jax.jit(
            lambda v, w: model.apply(v, w, method=type(model).encode)
        )

    # ---- length-mixed LM training on the frozen codec's token streams ----
    lm_trainer = LMTrainer(
        LMTrainConfig(n_q=n_q, bins=bins, decay_steps=args.lm_steps)
    )
    rng = np.random.default_rng(7)
    cache = []
    per_len = max(1, args.cache_batches // len(args.train_lengths))
    for secs in args.train_lengths:
        seg = (int(secs * sr) // hop) * hop
        for _ in range(per_len):
            wav = jnp.asarray(gen(rng, args.lm_batch, seg, sr))
            cache.append(
                jnp.asarray(encode_bt(variables, wav)).astype(jnp.int32)
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

    # ---- held-out compression per stream length ---------------------------
    lm = lm_trainer.model
    lm_vars = {"params": jax.device_get(state.params)}
    held_rng = np.random.default_rng(4242)
    rows = []
    for seconds in args.lengths:
        seg = (int(seconds * sr) // hop) * hop
        raw_bits = lm_bits = guard_bits = 0
        total_tokens = 0
        lm_won = 0
        for s in range(args.streams):
            wav = jnp.asarray(gen(held_rng, 1, seg, sr))
            codes = np.asarray(encode_bt(variables, wav))[0].T.astype(np.int32)
            meta = dict(sr=sr, family=args.family)
            raw = compress_codes(codes, bits_per_codebook=bits, metadata=meta)
            enc = compress_tokens_with_lm(lm, lm_vars, codes, metadata=meta)
            guarded = compress_tokens_guarded(
                codes, bits_per_codebook=bits, metadata=meta,
                lm=lm, lm_variables=lm_vars,
            )
            assert len(guarded) <= len(raw)  # the shipping invariant
            if s == 0:  # decode-side verification: bit-exact roundtrip
                back, _ = decompress_tokens_with_lm(lm, lm_vars, enc)
                assert np.array_equal(back, codes), "LM roundtrip mismatch"
            raw_bits += len(raw) * 8
            lm_bits += len(enc) * 8
            guard_bits += len(guarded) * 8
            lm_won += int(len(enc) < len(raw))
            total_tokens += codes.size
        dur = args.streams * (seg / sr)
        row = {
            "length_s": seconds,
            "raw_kbps": round(raw_bits / dur / 1000, 3),
            "lm_kbps": round(lm_bits / dur / 1000, 3),
            "guarded_kbps": round(guard_bits / dur / 1000, 3),
            "saving_pct": round(100 * (1 - guard_bits / raw_bits), 1),
            "lm_bits_per_token": round(lm_bits / total_tokens, 3),
            "lm_won": f"{lm_won}/{args.streams}",
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "metric": "lm_compression_guarded_saving_pct",
        "value": min(r["saving_pct"] for r in rows),
        "unit": "%",
        "family": args.family,
        "n_q": n_q,
        "lm_steps": args.lm_steps,
        "train_bits_per_token": round(bpt, 3),
        "train_lengths": args.train_lengths,
        "lm_train_min": round(t_train / 60, 1),
        "rows": rows,
        "roundtrip_exact": True,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
