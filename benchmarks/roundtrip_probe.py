"""Component split of the headline bench (Encodec_24k_240d bf16, packed).

Times encode / RVQ / decode / LSTM-standalone separately so perf work aims
at the current biggest term. Run on the chip:
    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/roundtrip_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.nn.lstm import SLSTM


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    batch, seconds, sr = 8, 10, 24000
    model = SoundStream(
        n_filters=32, dimension=512, ratios=(6, 5, 4, 2), sample_rate=sr,
        target_bandwidths=(1, 2, 4, 8, 12), dtype=jnp.bfloat16, packed_conv=True,
    )
    rng = jax.random.PRNGKey(0)
    wav = (jax.random.normal(rng, (batch, seconds * sr)) * 0.1).astype(jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "rvq": rng}, jnp.zeros((1, sr), jnp.bfloat16),
        n_q=model.n_q, training=False,
    )
    cb = variables["codebook"]["quantizer"]["vq"]
    emb = jax.random.normal(rng, cb["embed"].shape, cb["embed"].dtype)
    variables = dict(variables)
    variables["codebook"] = {"quantizer": {"vq": {
        "embed": emb, "embed_avg": emb,
        "cluster_size": jnp.ones_like(cb["cluster_size"]),
        "inited": jnp.ones_like(cb["inited"]),
    }}}

    encode = jax.jit(lambda v, w: model.apply(v, w, method=SoundStream.encode))
    decode = jax.jit(lambda v, c: model.apply(v, c, method=SoundStream.decode))

    @jax.jit
    def roundtrip(v, w):
        return decode(v, encode(v, w))

    codes = encode(variables, wav)
    res = {
        "roundtrip_ms": round(bench(roundtrip, variables, wav) * 1e3, 2),
        "encode_ms": round(bench(encode, variables, wav) * 1e3, 2),
        "decode_ms": round(bench(decode, variables, codes) * 1e3, 2),
    }

    # standalone 2-layer LSTM at the bottleneck shape (T = 100 Hz x 10 s)
    lstm = SLSTM(dimension=512, num_layers=2, dtype=jnp.bfloat16)
    xl = jax.random.normal(rng, (batch, 1000, 512), jnp.bfloat16)
    lv = lstm.init(jax.random.PRNGKey(1), xl)
    lstm_fn = jax.jit(lambda v, x: lstm.apply(v, x))
    res["lstm2_ms"] = round(bench(lstm_fn, lv, xl) * 1e3, 2)

    res["rt_factor"] = round(batch * seconds / (res["roundtrip_ms"] / 1e3), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
