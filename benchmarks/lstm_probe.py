"""SLSTM serving-cost probe: scan variants for the 2-layer 512-wide LSTM.

The encoder LSTM is ~11 ms of the flagship encode (750 sequential steps at
B=8 — latency-bound, 6% MXU occupancy). Variants:
  scan      — current: two chained lax.scan's (layer 1 after layer 0)
  unroll8   — same, scan unroll=8 (amortize loop overhead)
  lockstep  — ONE scan advancing both layers with a 1-step delay: per step a
              single [2,B,1024]x[2,1024,2048] bmm replaces two chained
              matmuls (halves the serial dependency chain)
  lockstep8 — lockstep + unroll=8

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/lstm_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, H = 8, 1000, 512
DT = jnp.bfloat16


def bench(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / iters


def make_params(key):
    ks = jax.random.split(key, 8)
    s = 1.0 / np.sqrt(H)
    p = {}
    for i in (0, 1):
        p[f"wih{i}"] = jax.random.uniform(ks[4 * i], (4 * H, H), DT, -s, s)
        p[f"whh{i}"] = jax.random.uniform(ks[4 * i + 1], (4 * H, H), DT, -s, s)
        p[f"b{i}"] = jax.random.uniform(ks[4 * i + 2], (4 * H,), DT, -s, s)
    return p


def cell(gates, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    return jax.nn.sigmoid(o) * jnp.tanh(c), c


def layer_scan(x, wih, whh, b, unroll=1):
    xp = jnp.einsum("btc,hc->bth", x, wih) + b
    z = jnp.zeros((B, H), DT)

    def step(carry, xt):
        h, c = carry
        h, c = cell(xt + h @ whh.T, c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (z, z), jnp.swapaxes(xp, 0, 1), unroll=unroll)
    return jnp.swapaxes(ys, 0, 1)


def two_layer_scan(p, x, unroll=1):
    y0 = layer_scan(x, p["wih0"], p["whh0"], p["b0"], unroll)
    y1 = layer_scan(y0, p["wih1"], p["whh1"], p["b1"], unroll)
    return y1 + x


def two_layer_lockstep(p, x, unroll=1):
    """Layer 1 runs one step behind layer 0; per step one bmm:
    lhs [2,B,2H]: row0=(h0|x_t already in xp), row1=(h1|y0_prev)
    rhs [2,2H,4H]: rhs0=(Whh0|0), rhs1=(Whh1|Wih1)."""
    xp = jnp.einsum("btc,hc->bth", x, p["wih0"]) + p["b0"]
    z = jnp.zeros((B, H), DT)
    rhs = jnp.stack(
        [
            jnp.concatenate([p["whh0"].T, jnp.zeros((H, 4 * H), DT)], axis=0),
            jnp.concatenate([p["whh1"].T, p["wih1"].T], axis=0),
        ]
    )  # [2, 2H, 4H]

    def step(carry, xt):
        h0, c0, h1, c1, y0_prev = carry
        lhs = jnp.stack(
            [
                jnp.concatenate([h0, jnp.zeros((B, H), DT)], axis=-1),
                jnp.concatenate([h1, y0_prev], axis=-1),
            ]
        )  # [2, B, 2H]
        gg = jnp.einsum("nbk,nkh->nbh", lhs, rhs)
        h0n, c0n = cell(xt + gg[0], c0)
        h1n, c1n = cell(gg[1] + p["b1"], c1)
        return (h0n, c0n, h1n, c1n, h0n), h1n

    T_ = xp.shape[1]
    xs = jnp.swapaxes(xp, 0, 1)
    # feed one extra dummy step so layer 1 consumes y0[T-1]
    xs = jnp.concatenate([xs, jnp.zeros((1, B, 4 * H), DT)], axis=0)
    _, ys = jax.lax.scan(step, (z, z, z, z, z), xs, unroll=unroll)
    return jnp.swapaxes(ys[1:], 0, 1) + x  # drop warmup output, skip-add


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    key = jax.random.PRNGKey(0)
    p = make_params(key)
    x = jax.random.normal(key, (B, T, H), DT) * 0.3

    ref = np.asarray(jax.jit(lambda p, x: two_layer_scan(p, x))(p, x), np.float32)
    results = {}
    for name, fn in [
        ("scan", jax.jit(lambda p, x: two_layer_scan(p, x))),
        ("unroll8", jax.jit(lambda p, x: two_layer_scan(p, x, unroll=8))),
        ("lockstep", jax.jit(lambda p, x: two_layer_lockstep(p, x))),
        ("lockstep8", jax.jit(lambda p, x: two_layer_lockstep(p, x, unroll=8))),
    ]:
        got = np.asarray(fn(p, x), np.float32)
        results[f"{name}_maxdiff"] = float(np.abs(got - ref).max())
        results[f"{name}_ms"] = round(bench(fn, p, x) * 1e3, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
