"""Corpus serving throughput: sequential vs batched bucketed compression.

The reference CLI serves files one by one (test.py:102-123); at batch 1 a
TPU chip sits at its per-dispatch floor and the MXU is lane-starved. This
probe measures the end-to-end `cli.compress` corpus path — file reads
(prefetched), device encode, ECDC packing, device decode, wav writes — on a
synthetic variable-length corpus, comparing ``--batch_files 1`` against
``--batch_files 8`` at the same bucketing.

Usage:
    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/corpus_serving_probe.py \
        [--files 32] [--batch 8] [--bucket_seconds 6]

Each mode runs the corpus twice: pass 1 warms the jit caches (compiles are
30 s-5 min each on the relay), pass 2 is timed. Prints one JSON line per
mode and a summary speedup line.
"""

from __future__ import annotations

import argparse
import contextlib
import glob
import io
import json
import os
import shutil
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser("corpus_serving_probe")
    p.add_argument("--files", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--bucket_seconds", type=float, default=6.0)
    p.add_argument("--min_seconds", type=float, default=3.0)
    p.add_argument("--max_seconds", type=float, default=12.0)
    p.add_argument("--workdir", type=str, default="/tmp/corpus_probe")
    args = p.parse_args()

    from academicodec_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from academicodec_tpu.cli import compress as compress_cli
    from academicodec_tpu.data.wavio import write_wav
    from academicodec_tpu.models.soundstream import SoundStream
    from academicodec_tpu.utils.checkpoint import save_checkpoint

    sr = 24000
    shutil.rmtree(args.workdir, ignore_errors=True)
    in_dir = os.path.join(args.workdir, "in")
    os.makedirs(in_dir)

    # flagship Encodec_24k_240d, random init (timing is weight-independent)
    model = SoundStream(
        n_filters=32, dimension=512, ratios=(6, 5, 4, 2), sample_rate=sr,
        target_bandwidths=(1, 2, 4, 8, 12),
    )
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "rvq": rng}, jnp.zeros((1, sr), jnp.float32),
        n_q=model.n_q, training=False,
    )
    ckpt_dir = os.path.join(args.workdir, "ckpt")
    save_checkpoint(ckpt_dir, "best", 1, jax.device_get(variables))
    ckpt = glob.glob(os.path.join(ckpt_dir, "best_*"))[0]

    rng_np = np.random.default_rng(0)
    total_audio_s = 0.0
    for i in range(args.files):
        secs = rng_np.uniform(args.min_seconds, args.max_seconds)
        total_audio_s += secs
        wav = (rng_np.standard_normal(int(secs * sr)) * 0.1).astype(np.float32)
        write_wav(os.path.join(in_dir, f"f{i:03d}.wav"), wav, sr)

    def run(batch_files: int, out_dir: str) -> float:
        argv = [
            "compress", "--input", in_dir, "--output", out_dir,
            "--resume_path", ckpt, "--sr", str(sr),
            "--ratios", "6", "5", "4", "2",
            "--target_bandwidths", "1", "2", "4", "8", "12",
            "--target_bw", "12", "--ecdc", "--dtype", "bf16",
            "--packed_conv",
            "--bucket_seconds", str(args.bucket_seconds),
            "--batch_files", str(batch_files),
        ]
        old_argv = sys.argv
        sys.argv = argv
        try:
            # pass 1: compiles; pass 2: timed steady state
            with contextlib.redirect_stdout(io.StringIO()):
                compress_cli.main()
                t0 = time.perf_counter()
                compress_cli.main()
                return time.perf_counter() - t0
        finally:
            sys.argv = old_argv

    results = {}
    for bf in (1, args.batch):
        wall = run(bf, os.path.join(args.workdir, f"out_b{bf}"))
        row = {
            "mode": f"batch_files={bf}",
            "wall_s": round(wall, 2),
            "files_per_s": round(args.files / wall, 2),
            "audio_s_per_s": round(total_audio_s / wall, 1),
            "x_realtime": round(total_audio_s / wall, 1),
        }
        results[bf] = wall
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": "corpus_serving_batched_speedup",
        "value": round(results[1] / results[args.batch], 2),
        "unit": "x",
        "files": args.files,
        "total_audio_s": round(total_audio_s, 1),
        "bucket_seconds": args.bucket_seconds,
    }), flush=True)


if __name__ == "__main__":
    main()
