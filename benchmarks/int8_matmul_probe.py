"""Does int8 buy MXU throughput on this chip? (decision probe for W8A8 serving)

The HiFi-Codec generator's wide stages (s0: C=256/T=6k, s1: C=128/T=30k)
run at 63-74% of bf16 MXU peak through plain XLA (BENCHMARKS.md "Where the
remaining decode time is") — compute-bound, so the only remaining lever is
a higher-throughput multiply. v5e lists 394 TOPS int8 vs 197 TFLOP/s bf16
(2x), but that only materializes if XLA actually emits int8 MXU ops for
``lax.dot_general(int8, int8, preferred_element_type=int32)``.

This probe times three tiers and prints the measured int8:bf16 speedup:
  1. square dot_general (clean peak ratio, no layout excuses),
  2. the im2col matmul shapes of the s0/s1 resblock convs,
  3. ``conv_general_dilated`` with int8 operands at those conv shapes.

Decision rule (TODO.md): build the quantized serving path only if tier 2
shows >=1.3x — below that, dequant/requant overhead and the PESQ risk of
activation quantization aren't worth it.

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/int8_matmul_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from academicodec_tpu.ops.conv import DN_1D

N_CHAIN = 32


def bench_chain(step, y0, w, iters=5):
    """Time N_CHAIN serially-dependent applications of ``step`` in one jit."""

    @jax.jit
    def run(y, w):
        return lax.fori_loop(0, N_CHAIN, lambda i, y: step(y, w), y)

    out = run(y0, w)
    np.asarray(jax.tree_util.tree_leaves(out)[0][(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(y0, w)
    np.asarray(jax.tree_util.tree_leaves(out)[0][(0,) * out.ndim])
    return (time.perf_counter() - t0) / iters / N_CHAIN


def time_dot(m, k, n, dtype, acc):
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        w = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    else:
        x = (jax.random.normal(key, (m, k)) * 0.1).astype(dtype)
        w = (jax.random.normal(key, (k, n)) * 0.1).astype(dtype)

    def step(v, w):
        o = lax.dot_general(
            v, w, (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        # keep the chain same-shape/dtype: cheap elementwise cast back
        return o.astype(v.dtype)[:, :k] if n != k else o.astype(v.dtype)

    # for non-square, pad w so output K matches input K (chainable)
    if n != k:
        return None
    return bench_chain(step, x, w)


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    rows = []

    # --- tier 1: square dots, clean ratio ---------------------------------
    for dim in (1024, 2048):
        t_bf = time_dot(dim * 8, dim, dim, jnp.bfloat16, jnp.float32)
        t_i8 = time_dot(dim * 8, dim, dim, jnp.int8, jnp.int32)
        flop = 2 * (dim * 8) * dim * dim
        rows.append(
            {
                "tier": "square_dot",
                "shape": f"{dim * 8}x{dim}x{dim}",
                "bf16_us": round(t_bf * 1e6, 1),
                "int8_us": round(t_i8 * 1e6, 1),
                "bf16_tflops": round(flop / t_bf / 1e12, 1),
                "int8_tops": round(flop / t_i8 / 1e12, 1),
                "speedup": round(t_bf / t_i8, 2),
            }
        )

    # --- tier 2: im2col shapes of the wide-stage resblock convs ----------
    # s0: C=256 T=6000, s1: C=128 T=30000; k=3/7/11 -> M=B*T, K=k*C, N=C
    B = 8
    for (C, T) in ((256, 6000), (128, 30000)):
        for k in (3, 7, 11):
            M, K, Nc = B * T, k * C, C
            key = jax.random.PRNGKey(1)
            xb = (jax.random.normal(key, (M, K)) * 0.1).astype(jnp.bfloat16)
            wb = (jax.random.normal(key, (K, Nc)) * 0.1).astype(jnp.bfloat16)
            xi = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
            wi = jax.random.randint(key, (K, Nc), -127, 127, jnp.int8)

            def step_bf(v, w, K=K):
                o = lax.dot_general(v, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                return jnp.tile(o.astype(v.dtype), (1, K // o.shape[1]))

            def step_i8(v, w, K=K):
                o = lax.dot_general(v, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                return jnp.tile((o >> 8).astype(jnp.int8), (1, K // o.shape[1]))

            t_bf = bench_chain(step_bf, xb, wb)
            t_i8 = bench_chain(step_i8, xi, wi)
            flop = 2 * M * K * Nc
            rows.append(
                {
                    "tier": "im2col",
                    "shape": f"C{C} T{T} k{k} (M{M} K{K} N{Nc})",
                    "bf16_us": round(t_bf * 1e6, 1),
                    "int8_us": round(t_i8 * 1e6, 1),
                    "bf16_tflops": round(flop / t_bf / 1e12, 1),
                    "int8_tops": round(flop / t_i8 / 1e12, 1),
                    "speedup": round(t_bf / t_i8, 2),
                }
            )

    # --- tier 3: int8 conv_general_dilated at the model's conv shapes ----
    for (C, T) in ((256, 6000), (128, 30000)):
        for k in (3, 7, 11):
            key = jax.random.PRNGKey(2)
            p = (k - 1) // 2
            yb = (jax.random.normal(key, (B, T, C)) * 0.1).astype(jnp.bfloat16)
            wbf = (jax.random.normal(key, (k, C, C)) * 0.05).astype(jnp.bfloat16)
            yi = jax.random.randint(key, (B, T, C), -127, 127, jnp.int8)
            wi8 = jax.random.randint(key, (k, C, C), -127, 127, jnp.int8)

            def conv_bf(v, w, p=p):
                return lax.conv_general_dilated(
                    v, w, (1,), ((p, p),), dimension_numbers=DN_1D,
                    preferred_element_type=jnp.float32,
                ).astype(v.dtype)

            def conv_i8(v, w, p=p):
                o = lax.conv_general_dilated(
                    v, w, (1,), ((p, p),), dimension_numbers=DN_1D,
                    preferred_element_type=jnp.int32,
                )
                return (o >> 8).astype(jnp.int8)

            t_bf = bench_chain(conv_bf, yb, wbf)
            try:
                t_i8 = bench_chain(conv_i8, yi, wi8)
            except Exception as e:  # backend may not lower int8 convs
                rows.append({"tier": "conv", "shape": f"C{C} T{T} k{k}",
                             "int8_error": type(e).__name__})
                continue
            flop = 2 * k * C * C * T * B
            rows.append(
                {
                    "tier": "conv",
                    "shape": f"C{C} T{T} k{k}",
                    "bf16_us": round(t_bf * 1e6, 1),
                    "int8_us": round(t_i8 * 1e6, 1),
                    "bf16_tflops": round(flop / t_bf / 1e12, 1),
                    "int8_tops": round(flop / t_i8 / 1e12, 1),
                    "speedup": round(t_bf / t_i8, 2),
                }
            )

    for r in rows:
        print(json.dumps(r))
    im2col = [r["speedup"] for r in rows if r["tier"] == "im2col" and "speedup" in r]
    print(json.dumps({
        "decision": "build W8A8 path" if im2col and min(im2col) >= 1.3
        else "int8 not worth it at these shapes",
        "im2col_speedups": im2col,
    }))


if __name__ == "__main__":
    main()
