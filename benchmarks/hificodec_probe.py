"""HiFi-Codec serving benchmark: token extraction + decode, packed vs plain.

Graded config 4 (BASELINE.md): HiFi-Codec-24k-320d GRVQ 4-codebook token
extraction. Measures encode (wav -> [B, frames, 4] tokens), decode
(tokens -> wav), and the full roundtrip at bf16 serving precision, with and
without lanes-packed waveform-rate convs (ops/packed.py), on the default
backend (the real TPU chip under the driver).

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/hificodec_probe.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.models.hificodec import VQVAE
from academicodec_tpu.nn.hifigan import HiFiCodecConfig


def _sync(out):
    """Completion sync via a TINY host fetch: block_until_ready returns
    early on the relay, and fetching the full output (3.7 MB of wav for
    decode) would bill relay transfer time to the chip measurement —
    same methodology as bench.py."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][..., :1])


def bench(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


CONFIGS = {
    "plain": (False, False, False, False, 0),
    "packed": (True, False, False, False, 0),
    # serving configuration: lanes-packed + weight-norm folded to plain
    # kernels (--fold_weight_norm in the CLIs; remove_weight_norm parity)
    "packed_folded": (True, True, False, False, 0),
    # fused Pallas towers on the decode side + folded weight norm
    "fused_folded": (True, True, True, False, 0),
    # + the moments-based GN-fused encoder bundle (resblock_tower_gn)
    "fused_enc_folded": (True, True, True, True, 0),
    # + W8A8 int8 resblocks on the MXU compute-bound wide stages
    # (ops/int8.py; calibrated on a 1 s batch before timing)
    "int8_fused_folded": (True, True, True, False, 128),
    "int8_packed_folded": (True, True, False, False, 128),
}


def main():
    p = argparse.ArgumentParser("hificodec_probe")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=int, default=10)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--configs", type=str, default=",".join(CONFIGS),
                   help="comma-separated subset of: " + ",".join(CONFIGS))
    args = p.parse_args()
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    batch, seconds, sr = args.batch, args.seconds, 24000
    cfg = HiFiCodecConfig()  # 24k_320d
    wav = (jax.random.normal(jax.random.PRNGKey(0), (batch, seconds * sr)) * 0.1).astype(
        jnp.bfloat16
    )

    results = {"batch": batch, "seconds": seconds}
    for key in args.configs.split(","):
        packed, fold, fused, fused_enc, int8_ch = CONFIGS[key]
        model = VQVAE(
            config=cfg, packed_conv=packed, fused_resblock=fused,
            fused_encoder=fused_enc, int8_min_channels=int8_ch,
            dtype=jnp.bfloat16,
        )
        variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, wav[:1, :sr])
        if fold:
            from academicodec_tpu.utils.fold import fold_vqvae

            model, variables = fold_vqvae(model, variables)
        if int8_ch:
            from academicodec_tpu.models.hificodec import calibrate_quant

            variables = calibrate_quant(model, variables, wav[:2, :sr])

        encode = jax.jit(lambda v, w: model.apply(v, w, method=VQVAE.encode))
        decode = jax.jit(lambda v, c: model.apply(v, c, method=VQVAE.decode))

        codes = encode(variables, wav)
        t_enc = bench(encode, variables, wav, iters=args.iters)
        t_dec = bench(decode, variables, codes, iters=args.iters)
        results[f"{key}_encode_ms"] = round(t_enc * 1e3, 2)
        results[f"{key}_decode_ms"] = round(t_dec * 1e3, 2)
        results[f"{key}_roundtrip_rt"] = round(
            batch * seconds / (t_enc + t_dec), 1
        )
        results[f"{key}_encode_rt"] = round(batch * seconds / t_enc, 1)

    if "plain_encode_ms" in results and "packed_encode_ms" in results:
        results["speedup_encode"] = round(
            results["plain_encode_ms"] / results["packed_encode_ms"], 2
        )
        results["speedup_decode"] = round(
            results["plain_decode_ms"] / results["packed_decode_ms"], 2
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
