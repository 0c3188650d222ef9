"""HiFi-GAN generator lanes-packing entry-policy sweep (decode hot path).

Variants: plain; entry=2/p0=1 (stage-2 resblocks p=4, stage-3 p=8 — the auto
policy); entry=3/p0=2 (stage-3 only at p=4, stage 2 plain); entry=3/p0=4
(stage-3 at p=8); entry=2/p0=2 (stage-2 p=8, stage-3 p=16). Generator wall
time per 8x10 s batch, bf16. Measured (round 2): plain 62.3 ms, entry2_p1
40.5, entry3_p2 39.9, entry3_p4 41.6, entry2_p2 55.7 — auto kept.

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/hifigen_entry_probe.py
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
        ("plain", dict(packed_conv=False)),
        ("entry2_p1", dict(packed_conv=True, packed_entry=2, packed_p0=1)),
        ("entry3_p2", dict(packed_conv=True, packed_entry=3, packed_p0=2)),
        ("entry3_p4", dict(packed_conv=True, packed_entry=3, packed_p0=4)),
        ("entry2_p2", dict(packed_conv=True, packed_entry=2, packed_p0=2)),
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
    print(json.dumps(results))


if __name__ == "__main__":
    main()
