"""SEANet encoder packed-head probe: deferred-halo vs plain vs zero floor.

Counterpart of seanet_padmode_probe.py for the encode direction (flagship
Encodec_24k_240d encoder, bf16, batch 8 x 10 s). 'packed_zero' is a timing
floor only (different numerics at the edges).

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/encoder_padmode_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.nn.seanet import SEANetEncoder


def bench(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    B = 8
    wav = jax.random.normal(jax.random.PRNGKey(0), (B, 240000, 1), jnp.bfloat16) * 0.1

    results = {}
    for name, kw in [
        ("plain_reflect", dict(packed_head=False)),
        ("packed_reflect", dict(packed_head=True)),
        ("packed_zero", dict(packed_head=True, pad_mode="zero")),
    ]:
        enc = SEANetEncoder(
            dimension=128, n_filters=32, ratios=(6, 5, 4, 2), dtype=jnp.bfloat16, **kw
        )
        variables = jax.jit(enc.init)(jax.random.PRNGKey(0), wav[:1, :2400])
        f = jax.jit(lambda v, x: enc.apply(v, x))
        results[f"{name}_ms"] = round(bench(f, variables, wav) * 1e3, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
