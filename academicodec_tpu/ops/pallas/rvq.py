"""Fused residual-VQ codebook search (Pallas TPU kernel).

The RVQ encode hot loop (SURVEY §3.5) is ``n_q`` sequential rounds of
"L2-argmin against a [bins, dim] codebook, subtract the chosen row".
Done layer-by-layer at the XLA level, the residual round-trips to HBM
``n_q`` times. This kernel keeps the residual tile **in VMEM across all
layers** and double-buffers the per-layer codebook DMA from HBM, so HBM
traffic is ``x`` once + each codebook once — the bandwidth lower bound.

Compute per (tile, layer): one ``[TILE, D] x [D, K]`` MXU matmul for the
distances, a VPU argmin, and one ``[TILE, K] x [K, D]`` one-hot MXU matmul
for the gather/subtract (gathers are scatter-shaped on TPU; the one-hot
matmul IS the fast path).

Numerics: same distance formula and tie-breaking as the reference
(``|x|^2 - 2 x.e + |e|^2``, argmin to lowest index —
academicodec/quantization/core_vq.py:175-180). Measured on a v5e chip at
the flagship shape ([8000, 512] x 12 codebooks of 1024): 2.6 ms vs 5.2 ms
for the XLA scan path. The kernel runs DEFAULT MXU precision, so ~1e-4 of
tokens near distance ties may differ from the f32 parity path; in
interpret mode (tests) it is bit-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rvq_kernel(n_q: int, tile: int, x_ref, embed_hbm, codes_ref, resid, ebuf, sems):
    """One grid step handles ``tile`` vectors through all ``n_q`` layers."""
    resid[:] = x_ref[:]
    K = ebuf.shape[1]

    def layer_dma(slot, q):
        return pltpu.make_async_copy(embed_hbm.at[q], ebuf.at[slot], sems.at[slot])

    layer_dma(0, 0).start()
    for q in range(n_q):  # static unroll: n_q <= 24
        slot = q % 2
        if q + 1 < n_q:
            layer_dma((q + 1) % 2, q + 1).start()
        layer_dma(slot, q).wait()
        e = ebuf[slot]  # [K, D]

        r = resid[:]
        # reference distance formula. DEFAULT matmul precision (bf16x3 MXU
        # passes): ~2x faster than the XLA scan path; near-tie argmins can
        # flip vs the f32-HIGHEST parity path (~1e-4 of tokens) — this is
        # the serving kernel, parity configs use quant/core_vq.
        dots = jnp.dot(r, e.T, preferred_element_type=jnp.float32)
        d = (
            jnp.sum(jnp.square(r), axis=1, keepdims=True)
            - 2.0 * dots
            + jnp.sum(jnp.square(e), axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=-1).astype(jnp.int32)  # [tile]
        codes_ref[q, :] = idx

        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, K), 1) == idx[:, None]
        ).astype(jnp.float32)
        chosen = jnp.dot(onehot, e, preferred_element_type=jnp.float32)
        resid[:] = r - chosen


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def rvq_encode_fused(
    x: jnp.ndarray, embed: jnp.ndarray, *, tile: int = 256, interpret: bool = False
) -> jnp.ndarray:
    """Residual-VQ encode: ``x [N, D]``, ``embed [n_q, K, D]`` -> codes
    ``[n_q, N]`` int32. ``N`` is padded to a tile multiple internally."""
    n, d = x.shape
    n_q, k, _ = embed.shape
    x = x.astype(jnp.float32)
    embed = embed.astype(jnp.float32)

    n_pad = (-n) % tile
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    n_total = x.shape[0]

    kernel = functools.partial(_rvq_kernel, n_q, tile)
    codes = pl.pallas_call(
        kernel,
        grid=(n_total // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # codebooks stay in HBM
        ],
        out_specs=pl.BlockSpec((n_q, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_q, n_total), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile, d), jnp.float32),  # residual carried across layers
            pltpu.VMEM((2, k, d), jnp.float32),  # double-buffered codebook
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, embed)
    return codes[:, :n]


def rvq_encode_fused_btd(
    x: jnp.ndarray, embed: jnp.ndarray, *, tile: int = 256, interpret: bool = False
) -> jnp.ndarray:
    """Convenience wrapper: ``x [B, T, D]`` -> codes ``[n_q, B, T]``.

    Auto-falls back to interpret mode on CPU (pallas CPU lowering is
    interpret-only), so the ``rvq_use_pallas`` model flag works everywhere.
    """
    b, t, d = x.shape
    interpret = interpret or jax.default_backend() == "cpu"
    codes = rvq_encode_fused(x.reshape(b * t, d), embed, tile=tile, interpret=interpret)
    return codes.reshape(embed.shape[0], b, t)
