"""Can Mosaic lower int8 MXU matmuls at the fused-tower shapes? (decision probe)

The fused Pallas resblock towers (ops/pallas/resblock.py) hold the narrow
waveform-rate stages' 18-conv bundles VMEM-resident; their matmuls are
``W[C, k*C] @ col[k*C, TT]`` with C=32/64 — M-underutilized on the 128-row
MXU, so the remaining lever is int8 (2x MXU issue rate, and int8 cols halve
the VMEM read traffic of the im2col concats). That only works if Mosaic can
lower, on THIS target:

  1. ``lax.dot_general(int8, int8, preferred_element_type=int32)``,
  2. the VPU quantize (f32 round/clip -> int8 cast) and int8 lane shifts
     (``_shift_cols`` on an int8 operand),

inside a ``pallas_call``. This probe builds both a bf16 and a W8A8 variant
of one synthetic 6-conv chain tile kernel, checks numerics against the XLA
reference, and times them back-to-back. Decision rule: wire int8 towers
only if the kernel ratio is >=1.25x at the s2/s3 shapes.

Usage: PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/pallas_int8_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_cols(a, k, d):
    C, W = a.shape
    c = (k - 1) // 2
    parts = []
    for j in range(k):
        o = (j - c) * d
        if o == 0:
            parts.append(a)
        elif o > 0:
            parts.append(jnp.pad(jax.lax.slice_in_dim(a, o, W, axis=1), ((0, 0), (0, o))))
        else:
            parts.append(jnp.pad(jax.lax.slice_in_dim(a, 0, W + o, axis=1), ((0, 0), (-o, 0))))
    return jnp.concatenate(parts, axis=0)


def _chain_kernel_bf16(n_convs, k, x_ref, w_ref, b_ref, o_ref):
    cur = x_ref[:]
    for p in range(n_convs):
        col = _shift_cols(cur, k, 1)
        y = jax.lax.dot_general(
            w_ref[p], col, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[p]
        f = y
        cur = jnp.where(f >= 0, f, 0.1 * f).astype(cur.dtype)
    o_ref[:] = cur


def _chain_kernel_i8(n_convs, k, x_ref, w_ref, ws_ref, b_ref, s_ref, o_ref):
    # x bf16; per conv: quantize w/ static scale -> int8 dot -> dequant+lrelu
    cur = x_ref[:]
    for p in range(n_convs):
        s_in = s_ref[p]  # SMEM scalar
        xi = jnp.clip(jnp.round(cur.astype(jnp.float32) / s_in), -127, 127)
        xi = xi.astype(jnp.int8)
        col = _shift_cols(xi, k, 1)
        yi = jax.lax.dot_general(
            w_ref[p], col, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = yi.astype(jnp.float32) * (s_in * ws_ref[p]) + b_ref[p]
        cur = jnp.where(y >= 0, y, 0.1 * y).astype(cur.dtype)
    o_ref[:] = cur


def run_case(C, TT, n_convs=6, k=7, iters=20):
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (C, TT)) * 0.5).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (n_convs, C, k * C)) * (
        1.0 / np.sqrt(k * C)
    )
    b = jax.random.normal(jax.random.PRNGKey(2), (n_convs, C, 1)) * 0.01

    # static per-conv act scales from a dry run (amax of the bf16 chain)
    def ref_chain(x, w, b):
        cur = x
        scales = []
        for p in range(n_convs):
            scales.append(jnp.max(jnp.abs(cur.astype(jnp.float32))))
            col = _shift_cols(cur.astype(jnp.float32), k, 1)
            y = w[p] @ col + b[p]
            cur = jnp.where(y >= 0, y, 0.1 * y).astype(x.dtype)
        return cur, jnp.stack(scales)

    ref, amax = jax.jit(ref_chain)(x, w, b)
    s_act = np.maximum(np.asarray(amax), 1e-6) / 127.0

    wq = np.zeros((n_convs, C, k * C), np.int8)
    ws = np.zeros((n_convs, C, 1), np.float32)
    wf = np.asarray(w, np.float32)
    for p in range(n_convs):
        sc = np.maximum(np.abs(wf[p]).max(axis=1), 1e-12) / 127.0
        wq[p] = np.clip(np.round(wf[p] / sc[:, None]), -127, 127).astype(np.int8)
        ws[p] = sc[:, None].astype(np.float32)

    f_bf16 = pl.pallas_call(
        functools.partial(_chain_kernel_bf16, n_convs, k),
        out_shape=jax.ShapeDtypeStruct((C, TT), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f_i8 = pl.pallas_call(
        functools.partial(_chain_kernel_i8, n_convs, k),
        out_shape=jax.ShapeDtypeStruct((C, TT), jnp.bfloat16),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wq int8
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ws
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
            pl.BlockSpec(memory_space=pltpu.SMEM),  # s_act scalars
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    # amortize the ~1.2 ms dispatch floor: run the tile kernel N_REP times
    # serially in one jit (like the real tower's (B, nT) grid does)
    N_REP = 16

    def rep(f, *fixed):
        def run(x):
            return jax.lax.fori_loop(0, N_REP, lambda i, v: f(v, *fixed), x)

        return jax.jit(run)

    jf16 = rep(f_bf16, w.astype(jnp.bfloat16), b.astype(jnp.float32))
    ji8 = rep(f_i8, jnp.asarray(wq), jnp.asarray(ws), b.astype(jnp.float32), jnp.asarray(s_act))

    # numerics: one direct (unrepeated) application vs the f32 reference
    out16 = np.asarray(
        jax.jit(f_bf16)(x, w.astype(jnp.bfloat16), b.astype(jnp.float32)),
        np.float32,
    )
    err16 = np.abs(out16 - np.asarray(ref, np.float32)).max()
    out8 = np.asarray(
        jax.jit(f_i8)(
            x, jnp.asarray(wq), jnp.asarray(ws), b.astype(jnp.float32),
            jnp.asarray(s_act),
        ),
        np.float32,
    )
    # int8 output differs from bf16 by quant noise — sanity-bound only
    err8 = np.abs(out8 - np.asarray(ref, np.float32)).max()

    def tme(f, *a):
        np.asarray(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        np.asarray(o)
        return (time.perf_counter() - t0) / iters / 16 * 1e3  # per tile

    t16 = tme(jf16, x)
    t8 = tme(ji8, x)
    return dict(
        C=C, TT=TT, bf16_ms=round(t16, 3), i8_ms=round(t8, 3),
        ratio=round(t16 / t8, 3), err_bf16=float(err16), err_i8=float(err8),
    )


def main():
    from academicodec_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for C, TT in ((32, 8192), (64, 8192), (32, 4096), (64, 4096)):
        try:
            print(json.dumps(run_case(C, TT)), flush=True)
        except Exception as e:  # noqa: BLE001 — a lowering gap IS the answer
            print(json.dumps({"C": C, "TT": TT, "error": str(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()
