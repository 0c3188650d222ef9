"""Decoder breakdown on the real chip: where do the ~33 ms actually go?

Times the full flagship SEANetDecoder (batch 8 x 10 s @ 24 kHz, bf16) and
each architectural piece standalone, with scalar-only fetches (relay-safe).

    PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/decoder_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

from academicodec_tpu.nn.seanet import SEANetDecoder, SEANetResnetBlock
from academicodec_tpu.nn.lstm import SLSTM
from academicodec_tpu.nn.conv import SConv1d

DTYPE = jnp.bfloat16


def bench(fn, args, iters=20):
    r = fn(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters * 1e3


def time_module(mod, shape, rng, **apply_kw):
    x = jax.random.normal(rng, shape, DTYPE) * 0.1
    variables = mod.init({"params": rng}, x, **apply_kw)
    f = jax.jit(lambda v, x: jnp.sum(mod.apply(v, x, **apply_kw)))
    return bench(f, (variables, x))


def main():
    print("backend:", jax.default_backend())
    rng = jax.random.PRNGKey(0)

    dec = SEANetDecoder(
        channels=1, dimension=512, n_filters=32, ratios=(6, 5, 4, 2), dtype=DTYPE
    )
    z = jax.random.normal(rng, (8, 1000, 512), DTYPE) * 0.1
    dv = dec.init({"params": rng}, z)
    f_full = jax.jit(lambda v, z: jnp.sum(dec.apply(v, z)))
    print(f"full decoder: {bench(f_full, (dv, z)):.2f} ms")

    # pieces
    print(f"SLSTM 512 @1000: {time_module(SLSTM(dimension=512, num_layers=2, dtype=DTYPE), (8, 1000, 512), rng):.2f} ms")
    print(f"stem conv7 512->512 @1000: {time_module(SConv1d(in_channels=512, out_channels=512, kernel_size=7, dtype=DTYPE), (8, 1000, 512), rng):.2f} ms")
    for (C, T) in [(256, 6000), (128, 30000), (64, 120000), (32, 240000)]:
        ms = time_module(
            SEANetResnetBlock(dim=C, kernel_sizes=(3, 1), dilations=(1, 1), dtype=DTYPE),
            (8, T, C), rng,
        )
        print(f"resblock C={C} T={T}: {ms:.2f} ms")
    print(f"final conv7 32->1 @240000: {time_module(SConv1d(in_channels=32, out_channels=1, kernel_size=7, dtype=DTYPE), (8, 240000, 32), rng):.2f} ms")


if __name__ == "__main__":
    main()
