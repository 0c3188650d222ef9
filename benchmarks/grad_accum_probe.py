"""Gradient accumulation on the real chip: time + memory at effective batch 128.

The reference reaches its Encodec effective batch of 128 by spreading 16 x 8
GPUs (main_launch.py:199 + start.sh nproc_per_node=8); `accum_steps=k` scans
k microbatches and applies ONE averaged update, so a single chip reproduces
the same effective batch at ~B/k peak activation memory.

This probe times the flagship-width Encodec trainer at global batch 128 x 1 s
@ 24 kHz for accum_steps in {1, 2, 8} and reports ms/step plus (where the
backend exposes it) device peak memory. Expected shape of the result: accum
trades a little step time (scan overhead, k small dispatches) for a ~k-fold
cut in activation memory — the win is fitting reference-scale batches, not
speed.

Usage:
    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/grad_accum_probe.py \
        [--batch 128] [--accum 1 2 8] [--steps 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def device_peak_bytes():
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return int(stats.get("peak_bytes_in_use", 0))
    except Exception:
        pass
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--accum", type=int, nargs="+", default=[1, 2, 8])
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--seconds", type=float, default=1.0)
    p.add_argument("--mixed_precision", action="store_true",
                   help="bf16 forwards/backwards (train/encodec.py "
                        "mixed_precision) — A/B the step time vs f32")
    p.add_argument("--family", choices=("encodec", "hificodec"),
                   default="encodec",
                   help="hificodec = full-size 24k_320d LS-GAN trainer "
                        "(batch x --seconds crops; reference segment is "
                        "16000 samples = 2/3 s)")
    args = p.parse_args()

    if args.family == "hificodec":
        from academicodec_tpu.train.hificodec import (
            HiFiCodecTrainConfig, HiFiCodecTrainer as Trainer,
        )
        base = HiFiCodecTrainConfig(mixed_precision=args.mixed_precision)
        sr = base.model.sampling_rate
    else:
        from academicodec_tpu.train.encodec import (
            EncodecTrainConfig, EncodecTrainer as Trainer,
        )
        base = EncodecTrainConfig(
            sr=24000, ratios=(6, 5, 4, 2), target_bandwidths=(1, 2, 4, 8, 12),
            mixed_precision=args.mixed_precision,
        )
        sr = 24000
    rng = jax.random.PRNGKey(0)
    T = int(args.seconds * sr)
    x = jax.random.normal(rng, (args.batch, T), jnp.float32) * 0.1

    out = {"backend": jax.default_backend(), "batch": args.batch, "rows": []}
    for k in args.accum:
        cfg = dataclasses.replace(base, accum_steps=k)
        trainer = Trainer(cfg)
        loss_key = "loss_g" if args.family == "encodec" else "loss_gen_all"
        row = {"accum_steps": k}
        try:
            state = trainer.init_state(jax.random.PRNGKey(0), x)
            np.asarray(jax.tree_util.tree_leaves(state.g_params)[0])
            t0 = time.perf_counter()
            state, m = trainer.train_step(state, x)
            loss = float(m[loss_key])  # sync
            row["compile_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, m = trainer.train_step(state, x)
            loss = float(m[loss_key])
            row["ms_per_step"] = round((time.perf_counter() - t0) / args.steps * 1000, 1)
            row["loss_g"] = round(loss, 3)
            peak = device_peak_bytes()
            if peak:
                row["peak_gib"] = round(peak / 2**30, 2)
        except Exception as e:  # OOM at low k is itself the measurement
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        out["rows"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
        # free the previous state before the next config compiles
        del trainer
        try:
            del state
        except UnboundLocalError:
            pass
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
