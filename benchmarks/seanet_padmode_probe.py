"""Cost of reflect-mode splice corrections in the packed SEANet decoder.

The Encodec flagship decoder reflect-pads its resblock convs, so the packed
tail recomputes boundary rows unpacked and concatenates them in (two full-
tensor splices per conv). This probe times the flagship decoder tail with
pad_mode='reflect' (status quo) vs 'zero' (correction-free path; numerics
differ at the edges only — this is a TIMING probe, not a parity check) to
size the remaining win from cheaper reflect corrections.

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/seanet_padmode_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.nn.seanet import SEANetDecoder


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

    B, frames = 8, 1000  # 10 s @ 24 kHz / 240 hop
    z = jax.random.normal(jax.random.PRNGKey(0), (B, frames, 128), jnp.bfloat16) * 0.3

    results = {}
    for name, kw in [
        ("plain_reflect", dict(packed_tail=False)),
        ("packed_reflect", dict(packed_tail=True)),
        ("packed_zero", dict(packed_tail=True, pad_mode="zero")),
    ]:
        dec = SEANetDecoder(
            dimension=128, n_filters=32, ratios=(6, 5, 4, 2), dtype=jnp.bfloat16, **kw
        )
        variables = jax.jit(dec.init)(jax.random.PRNGKey(0), z[:1, :10])
        f = jax.jit(lambda v, z: dec.apply(v, z))
        results[f"{name}_ms"] = round(bench(f, variables, z) * 1e3, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
