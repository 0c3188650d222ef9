"""HiFi-GAN generator decode: packed vs fused-tower variants (round 3).

Variants: auto lanes-packed (round-2 default), fused towers at
fused_max_channels=64 (stages 2-3) and 128 (also stage 1), each with the
sub-pixel convT lowering. Generator-only wall time per 8x10 s batch, bf16,
tiny-slice sync (bench.py methodology).

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/hifigen_fused_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.nn.hifigan import HiFiCodecConfig, HiFiGANGenerator


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

    B, frames = 8, 750  # 10 s @ 24 kHz / 320 hop
    cfg = HiFiCodecConfig()
    z = jax.random.normal(jax.random.PRNGKey(0), (B, frames, 512), jnp.bfloat16) * 0.1

    variants = [
        ("packed_auto", dict(packed_conv=True)),
        ("fused64", dict(fused_resblock=True)),
        ("fused128", dict(fused_resblock=True, fused_max_channels=128)),
    ]
    results = {}
    ref = None
    for name, kw in variants:
        gen = HiFiGANGenerator(config=cfg, dtype=jnp.bfloat16, **kw)
        variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z[:1, :10])
        f = jax.jit(lambda v, z: gen.apply(v, z))
        y = np.asarray(f(variables, z), np.float32)
        if ref is None:
            ref = y
        else:
            results[f"{name}_maxdiff"] = float(np.abs(y - ref).max())
        t = bench(f, variables, z)
        results[f"{name}_ms"] = round(t * 1e3, 2)
        print(json.dumps({k: v for k, v in results.items() if k.startswith(name)}),
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
