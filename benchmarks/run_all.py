"""Reproduce every number in BENCHMARKS.md on the current backend.

Usage (on a TPU host; see CLAUDE.md for the relay quirks):
    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/run_all.py \
        [--skip-training]

All timings sync via host fetch (np.asarray) — block_until_ready can return
early on relayed backends. Expect one-time compiles of seconds (serving) to
~15 minutes (full GAN training steps) before the steady-state loops.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# serving benches use full-size models: scale down iteration counts off-TPU
N_ITERS = 20 if jax.default_backend() != "cpu" else 2


def _timeit(fn, *args, n=N_ITERS):
    r = fn(*args)
    jax.tree_util.tree_map(np.asarray, r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.tree_util.tree_map(np.asarray, r)
    return (time.perf_counter() - t0) / n


def bench_serving(results):
    from academicodec_tpu.models.soundstream import SoundStream

    rng = jax.random.PRNGKey(0)
    model = SoundStream(
        n_filters=32, dimension=512, ratios=(6, 5, 4, 2), sample_rate=24000,
        target_bandwidths=(1, 2, 4, 8, 12), dtype=jnp.bfloat16,
        packed_conv=True,  # the headline serving config (bench.py)
    )
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "rvq": rng}, jnp.zeros((1, 24000), jnp.bfloat16),
        n_q=model.n_q, training=False,
    )
    np.asarray(jax.tree_util.tree_leaves(variables)[0])
    wav = (jax.random.normal(rng, (8, 240000), jnp.float32) * 0.1).astype(jnp.bfloat16)

    @jax.jit
    def roundtrip(v, w):
        codes = model.apply(v, w, method=SoundStream.encode)
        return model.apply(v, codes, method=SoundStream.decode)

    dt = _timeit(roundtrip, variables, wav)
    results["roundtrip_bf16_ms"] = round(dt * 1000, 2)
    results["roundtrip_rt_factor"] = round(80 / dt, 1)


def bench_tokenization(results):
    from academicodec_tpu.models import presets
    from academicodec_tpu.models.soundstream import SoundStream

    rng = jax.random.PRNGKey(0)
    model = presets.build("encodec_16k_320d", dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "rvq": rng}, jnp.zeros((1, 16000), jnp.bfloat16),
        n_q=model.n_q, training=False,
    )
    np.asarray(jax.tree_util.tree_leaves(variables)[0])
    wav = (jax.random.normal(rng, (8, 160000), jnp.float32) * 0.1).astype(jnp.bfloat16)
    enc = jax.jit(lambda v, w: model.apply(v, w, target_bw=4, method=SoundStream.encode))
    dt = _timeit(enc, variables, wav)
    results["tokenize_16k_8q_ms"] = round(dt * 1000, 2)
    results["tokenize_mtokens_per_s"] = round(8 * 500 * 8 / dt / 1e6, 2)


def bench_training(results):
    from academicodec_tpu.train.encodec import EncodecTrainConfig, EncodecTrainer

    cfg = EncodecTrainConfig(sr=24000, ratios=(6, 5, 4, 2), target_bandwidths=(1, 2, 4, 8, 12))
    trainer = EncodecTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 24000), jnp.float32) * 0.1
    state = trainer.init_state(rng, x)
    np.asarray(jax.tree_util.tree_leaves(state.g_params)[0])
    state, m = trainer.train_step(state, x)
    float(m["loss_g"])  # force compile+run
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = trainer.train_step(state, x)
    float(m["loss_g"])
    dt = (time.perf_counter() - t0) / 10
    results["encodec_train_ms_per_step"] = round(dt * 1000, 1)
    results["encodec_train_audio_sec_per_s"] = round(16 / dt, 1)


def bench_loader(results):
    import tempfile

    from academicodec_tpu.data.dataset import WavCropDataset, batch_iterator
    from academicodec_tpu.data.native_loader import (
        native_batch_iterator,
        native_loader_available,
    )
    from academicodec_tpu.data.wavio import write_wav

    rng = np.random.default_rng(0)
    sr = 24000
    with tempfile.TemporaryDirectory() as d:
        for i in range(32):
            write_wav(os.path.join(d, f"f{i}.wav"),
                      (rng.standard_normal(30 * sr) * 0.1).astype(np.float32), sr)
        ds = WavCropDataset(d, sr, sample_rate=sr)

        def drain(it, n=20):
            # close the generator when done: the native loader's worker
            # threads keep prefetching until finalization otherwise,
            # contending CPU with the benches that follow
            from contextlib import closing

            with closing(it):
                t0 = time.perf_counter()
                for k, _ in enumerate(it):
                    if k + 1 >= n:
                        break
                return (time.perf_counter() - t0) / n

        results["loader_python_ms_per_batch"] = round(
            drain(batch_iterator(ds, 16, num_workers=8)) * 1000, 2)
        if native_loader_available():
            results["loader_native_ms_per_batch"] = round(
                drain(native_batch_iterator(ds.files, sr, 16, num_workers=8)) * 1000, 2)


def bench_hificodec(results):
    from academicodec_tpu.models.hificodec import VQVAE
    from academicodec_tpu.nn.hifigan import HiFiCodecConfig

    rng = jax.random.PRNGKey(0)
    # serving headline config: lanes-packed encode + fused Pallas resblock
    # towers on decode + folded weight norm (matches benchmarks/hificodec_probe.py
    # "fused_folded" and the BENCHMARKS.md row)
    model = VQVAE(
        config=HiFiCodecConfig(), dtype=jnp.bfloat16, packed_conv=True,
        fused_resblock=True,
    )
    wav = (jax.random.normal(rng, (8, 240000)) * 0.1).astype(jnp.bfloat16)
    variables = jax.jit(model.init)({"params": rng}, wav[:1, :24000])
    from academicodec_tpu.utils.fold import fold_vqvae

    model, variables = fold_vqvae(model, variables)
    encode = jax.jit(lambda v, w: model.apply(v, w, method=VQVAE.encode))
    decode = jax.jit(lambda v, c: model.apply(v, c, method=VQVAE.decode))
    codes = encode(variables, wav)
    t_enc = _timeit(encode, variables, wav)
    t_dec = _timeit(decode, variables, codes)
    results["hificodec_encode_ms"] = round(t_enc * 1000, 2)
    results["hificodec_decode_ms"] = round(t_dec * 1000, 2)
    results["hificodec_encode_rt_factor"] = round(80 / t_enc, 1)


def bench_bitpack(results):
    from academicodec_tpu.codec.binary import pack_array
    from academicodec_tpu.native.build import get_bitpack_lib

    vals = np.random.default_rng(0).integers(0, 1024, size=96000).astype(np.int32)
    has_native = get_bitpack_lib() is not None
    t0 = time.perf_counter()
    for _ in range(10):
        pack_array(vals, 10)
    results["bitpack_ms_96k_tokens"] = round((time.perf_counter() - t0) / 10 * 1000, 2)
    results["bitpack_native"] = has_native


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-training", action="store_true",
                   help="skip the ~15-min training-step compile")
    args = p.parse_args()

    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — numbers are not meaningful, smoke only",
              file=sys.stderr)
    results = {"backend": jax.default_backend(), "devices": str(jax.devices())}
    bench_bitpack(results)
    bench_loader(results)
    bench_serving(results)
    bench_tokenization(results)
    bench_hificodec(results)
    if not args.skip_training:
        bench_training(results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
