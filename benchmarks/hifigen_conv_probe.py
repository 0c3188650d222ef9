"""Per-conv microbenchmark of the HiFi-GAN generator tower (decode path).

HiFi-Codec decode (71 ms/batch, BENCHMARKS.md) is FLOP-heavy: the resblock
towers at waveform rate are ~3.3 TFLOP per 8x10 s batch. The axon relay has
a ~2.6 ms per-dispatch floor, so each conv is chained N times inside ONE jit
(serial data dependency) and the floor is divided away. Reports achieved
fraction of v5e bf16 peak per conv shape — the data for deciding which
lowering (plain / lanes-packed / phase-major) each stage should use.

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/hifigen_conv_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from academicodec_tpu.ops.conv import DN_1D

PEAK_BF16 = 197e12  # v5e MXU peak FLOP/s
N = 32  # chained copies per measurement


def bench_chain(step, y0, w, iters=5):
    """Time N serially-dependent applications of ``step`` inside one jit."""

    @jax.jit
    def run(y, w):
        return lax.fori_loop(0, N, lambda i, y: step(y, w), y)

    out = run(y0, w)
    np.asarray(out[0, 0])  # host-fetch sync (relay-safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(y0, w)
    np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / iters / N


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    B = 8
    T0 = 750  # 10 s @ 24 kHz / 320 hop
    key = jax.random.PRNGKey(0)
    # (stage, C, T_out): resblock tower shapes after each upsample
    stage_shapes = [(0, 256, T0 * 8), (1, 128, T0 * 40), (2, 64, T0 * 160), (3, 32, T0 * 320)]
    rks = [3, 7, 11]
    rds = [1, 3, 5]

    rows = []
    tower_ms = 0.0
    for si, co, to in stage_shapes:
        y = jax.random.normal(key, (B, to, co), jnp.bfloat16) * 0.1
        for k in rks:
            for d in rds:
                wd = jax.random.normal(key, (k, co, co), jnp.bfloat16) * 0.05
                p = (k * d - d) // 2

                def step(v, w, d=d, p=p):
                    return lax.conv_general_dilated(
                        v, w, window_strides=(1,), padding=((p, p),),
                        rhs_dilation=(d,), dimension_numbers=DN_1D,
                    )

                t_ms = bench_chain(step, y, wd) * 1e3
                gflop = 2 * k * co * co * to * B / 1e9
                # model runs (k,d) once in convs1; (k,1) three more times in convs2
                mult = 4 if d == 1 else 1
                tower_ms += mult * t_ms
                rows.append(
                    {
                        "conv": f"s{si} k{k} d{d} C{co} T{to}",
                        "us": round(t_ms * 1e3, 1),
                        "gflop": round(gflop, 1),
                        "pct_peak": round(100 * gflop * 1e9 / (t_ms * 1e-3) / PEAK_BF16, 1),
                        "count_in_model": mult,
                    }
                )

    for r in rows:
        print(json.dumps(r))
    print(json.dumps({"resblock_tower_total_ms": round(tower_ms, 2)}))


if __name__ == "__main__":
    main()
