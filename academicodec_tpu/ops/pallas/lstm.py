"""Fused 2-layer LSTM recurrence (Pallas TPU kernel) — the SLSTM hot path.

Why: the SEANet bottleneck runs a 2-layer LSTM over ~1000 frames. As an XLA
``lax.scan`` each of the 2000 sequential steps pays dynamic-slice +
dispatch overhead around a tiny ``[B, H] x [H, 4H]`` matmul (~11 ms for the
encoder LSTM at B=8, H=512 — over half the serving roundtrip). This kernel:

  * pins all three weight matrices (``W_hh`` x2, layer-2's ``W_ih``) in VMEM
    for the entire sequence,
  * advances BOTH layers in lockstep per timestep (layer 2 consumes layer
    1's fresh ``h1_t`` immediately — no intermediate sequence in HBM),
  * grids over time chunks with the carries (``h/c`` per layer) living in
    VMEM scratch, which persists across sequential TPU grid steps,
  * streams the precomputed layer-1 input projection in and the layer-2
    hidden states out through double-buffered block DMA (automatic via
    BlockSpec).

The layer-1 input projection ``x @ W_ih1^T`` stays OUTSIDE the kernel as one
large batched MXU matmul.

Numerics: carries are f32; the per-step hidden matmuls run bf16xbf16->f32
on the MXU (serving precision — the f32 scan path in ``nn/lstm.py`` remains
the parity/training reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm2_kernel(
    chunk: int,
    x_ref,  # [chunk, B, 4H] f32 — layer-1 input projection (+ biases)
    whh1_ref,  # [4H, H] bf16
    wih2_ref,  # [4H, H] bf16
    whh2_ref,  # [4H, H] bf16
    b2_ref,  # [1, 4H] f32 — layer-2 combined bias
    y_ref,  # [chunk, B, H] out (x dtype)
    h1, c1, h2, c2,  # [B, H] f32 scratch, carried across grid steps
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        h1[:] = jnp.zeros_like(h1)
        c1[:] = jnp.zeros_like(c1)
        h2[:] = jnp.zeros_like(h2)
        c2[:] = jnp.zeros_like(c2)

    whh1 = whh1_ref[:]
    wih2 = wih2_ref[:]
    whh2 = whh2_ref[:]
    b2 = b2_ref[:]

    def cell(gates, c):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new

    def step(t, _):
        xt = x_ref[t]  # [B, 4H] f32
        g1 = xt + jax.lax.dot_general(
            h1[:].astype(jnp.bfloat16),
            whh1,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h1_new, c1_new = cell(g1, c1[:])
        h1[:] = h1_new
        c1[:] = c1_new

        g2 = (
            jax.lax.dot_general(
                h1_new.astype(jnp.bfloat16),
                wih2,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                h2[:].astype(jnp.bfloat16),
                whh2,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2
        )
        h2_new, c2_new = cell(g2, c2[:])
        h2[:] = h2_new
        c2[:] = c2_new
        y_ref[t] = h2_new.astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def lstm2_fused(
    x: jnp.ndarray,
    w_ih1: jnp.ndarray,
    w_hh1: jnp.ndarray,
    b1: jnp.ndarray,
    w_ih2: jnp.ndarray,
    w_hh2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    chunk: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Two stacked LSTM layers over ``x [B, T, C]`` -> ``[B, T, H]``.

    ``w_ih* [4H, C]``, ``w_hh* [4H, H]``, ``b* [4H]`` (torch layout; pass
    ``bias_ih + bias_hh`` combined).
    """
    B, T, C = x.shape
    H = w_hh1.shape[1]
    # pallas CPU lowering is interpret-only; auto-fallback keeps the
    # use_pallas flag usable everywhere
    interpret = interpret or jax.default_backend() == "cpu"

    # layer-1 input projection: one big MXU matmul over all timesteps
    x_proj = (
        jnp.einsum("btc,hc->bth", x, w_ih1.astype(x.dtype)).astype(jnp.float32)
        + b1.astype(jnp.float32)
    )
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]

    t_pad = (-T) % chunk
    if t_pad:
        x_proj = jnp.pad(x_proj, ((0, t_pad), (0, 0), (0, 0)))
    t_total = x_proj.shape[0]

    kernel = functools.partial(_lstm2_kernel, chunk)
    ys = pl.pallas_call(
        kernel,
        grid=(t_total // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, B, 4 * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_total, B, H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        x_proj,
        w_hh1.astype(jnp.bfloat16),
        w_ih2.astype(jnp.bfloat16),
        w_hh2.astype(jnp.bfloat16),
        (b2.astype(jnp.float32)).reshape(1, -1),
    )
    ys = jnp.swapaxes(ys[:T], 0, 1)  # [B, T, H]
    return ys
