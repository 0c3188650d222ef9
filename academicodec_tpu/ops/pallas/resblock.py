"""Fused HiFi-GAN resblock tower (Pallas TPU kernel) — the decode hot path.

Why: a HiFi-GAN stage runs THREE parallel residual chains (kernel sizes
3/7/11, reference models/hificodec/models.py:18-125) of 6 convs each over
waveform-rate activations with C=32..64 channels, then averages them. As
XLA convs that is 18 HBM round trips per stage over a [B, 240k, 32] tensor,
and the narrow channel count wastes 3/4 of every MXU tile; the lanes-packed
lowering (ops/packed.py) fixes lane occupancy but pays a ~5x block-Toeplitz
FLOP blowup. This kernel removes both costs at once:

  * activations live in VMEM for the entire 18-conv tower — one HBM read of
    the input tile, one write of the stage output (36 passes -> 2),
  * time goes on the LANE axis (``[C, T_tile]`` layout) and every conv is an
    im2col matmul ``W[C, k*C] @ col[k*C, T_tile]``: the contraction axis is
    ``k*C`` (96..704 — full MXU tiles), the output axis is the time tile
    (full lanes), and no redundant FLOPs are computed,
  * grid steps tile (batch, time); each tile carries ``halo`` extra samples
    per side so the chained convs stay exact in the tile center, and conv
    outputs are masked to the true sequence bounds so the biased convs match
    XLA's zero-"same" padding exactly (a conv bias would otherwise bleed
    past the sequence edge into the next conv).

Numerics: bf16 storage, every matmul accumulates f32 on the MXU, outputs
cast back to bf16 between convs — the same contract as the XLA bf16 path
(equal up to reduction order). The f32 parity path stays in nn/hifigan.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1

# one chain entry: (kernel_size, (d0, d1, ...)) -> convs in call order are
# [(k, d0), (k, 1), (k, d1), (k, 1), ...] (ResBlock1 convs1_i/convs2_i pairs)
# or [(k, d0), (k, d1)] for ResBlock2.


def chain_conv_dilations(dilations: Sequence[int], resblock: str) -> Tuple[int, ...]:
    """Dilation of each conv in one chain, in call order."""
    if resblock == "1":
        out = []
        for d in dilations:
            out.extend((d, 1))
        return tuple(out)
    return tuple(dilations)


def tower_halo(
    kernel_sizes: Sequence[int],
    dilation_sizes: Sequence[Sequence[int]],
    resblock: str = "1",
) -> int:
    """Per-side halo consumed by the deepest chain of the tower."""
    halos = []
    for k, ds in zip(kernel_sizes, dilation_sizes):
        halos.append(sum((k - 1) // 2 * d for d in chain_conv_dilations(ds, resblock)))
    return max(halos)


def _shift_cols(a: jnp.ndarray, k: int, d: int) -> jnp.ndarray:
    """``a [C, W]`` -> im2col ``[k*C, W]`` for a centered dilated conv.

    Row block j holds ``a`` shifted by ``(j - (k-1)//2) * d`` with zero fill
    (reads past the tile edge are halo garbage; callers mask by sequence
    bounds and size the halo so garbage never reaches the tile center).
    """
    C, W = a.shape
    c = (k - 1) // 2
    parts = []
    for j in range(k):
        o = (j - c) * d
        if o == 0:
            parts.append(a)
        elif o > 0:
            parts.append(
                jnp.pad(jax.lax.slice_in_dim(a, o, W, axis=1), ((0, 0), (0, o)))
            )
        else:
            parts.append(
                jnp.pad(jax.lax.slice_in_dim(a, 0, W + o, axis=1), ((0, 0), (-o, 0)))
            )
    return jnp.concatenate(parts, axis=0)


def _tower_kernel(
    # static
    chains,  # tuple of (k, conv dilations tuple)
    resblock: str,
    C: int,
    TT: int,
    H: int,
    T_real: int,
    # refs
    x_hbm,  # [B, C, H + nT*TT + H] bf16 (zero-padded)
    *rest,
):
    n_chains = len(chains)
    w_refs = rest[:n_chains]  # each [n_convs, C, k*C] bf16
    b_refs = rest[n_chains : 2 * n_chains]  # each [n_convs, C, 1] f32
    o_ref = rest[2 * n_chains]  # [1, C, TT]
    xt = rest[2 * n_chains + 1]  # VMEM [C, TW] bf16 scratch
    sem = rest[2 * n_chains + 2]

    i = pl.program_id(0)
    j = pl.program_id(1)
    TW = TT + 2 * H

    dma = pltpu.make_async_copy(x_hbm.at[i, :, pl.ds(j * TT, TW)], xt, sem)
    dma.start()
    dma.wait()

    # mask of in-sequence positions for this tile (global t of lane 0 is
    # j*TT - H); conv outputs outside [0, T_real) must be exactly 0, or the
    # conv BIAS would bleed past the sequence edge into the next conv
    # (XLA's zero-"same" padding re-zeroes between convs)
    t0 = j * TT - H
    tpos = t0 + jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
    valid = (tpos >= 0) & (tpos < T_real)

    def lrelu(v):
        return jnp.where(v >= 0, v, jnp.asarray(LRELU_SLOPE, v.dtype) * v)

    def conv(w, b, a, k, d):
        col = _shift_cols(a, k, d)
        y = (
            jax.lax.dot_general(
                w, col, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b
        )
        return jnp.where(valid, y, 0.0)

    cdtype = xt.dtype
    x0 = xt[:]
    acc = jnp.zeros((C, TW), jnp.float32)
    for g, (k, conv_ds) in enumerate(chains):
        w = w_refs[g]
        b = b_refs[g]
        cur = x0
        if resblock == "1":
            # pairs (dilated conv, unit conv) with a residual add per pair
            for p in range(0, len(conv_ds), 2):
                a = lrelu(cur)
                y1 = conv(w[p], b[p], a, k, conv_ds[p]).astype(cdtype)
                y2 = conv(w[p + 1], b[p + 1], lrelu(y1), k, conv_ds[p + 1])
                cur = (cur.astype(jnp.float32) + y2).astype(cdtype)
        else:
            # ResBlock2: one dilated conv per residual add
            for p in range(len(conv_ds)):
                y = conv(w[p], b[p], lrelu(cur), k, conv_ds[p])
                cur = (cur.astype(jnp.float32) + y).astype(cdtype)
        acc = acc + cur.astype(jnp.float32)

    out = (acc / float(n_chains))[:, H : H + TT]
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_tile(C: int, H: int) -> int:
    """Time-tile size targeting ~8 MB of VMEM live data."""
    # dominant buffers: col [k_max*C, TW] bf16 + a few [C, TW] f32
    budget = 8 * 1024 * 1024
    for tt in (8192, 6144, 4096, 3072, 2048, 1024, 512, 256, 128):
        tw = tt + 2 * H
        live = 11 * C * tw * 2 + 5 * C * tw * 4
        if live <= budget:
            return tt
    return 128


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilation_sizes", "resblock", "interpret"),
)
def resblock_tower(
    x: jnp.ndarray,
    weights: Tuple[Tuple[jnp.ndarray, ...], ...],
    biases: Tuple[Tuple[jnp.ndarray, ...], ...],
    *,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    resblock: str = "1",
    interpret: bool = False,
) -> jnp.ndarray:
    """Mean of all resblock chains over ``x [B, T, C]`` -> ``[B, T, C]``.

    ``weights[g][i]`` is conv ``i`` of chain ``g`` as ``[k, C_in, C_out]``
    (flax layout); ``biases[g][i]`` is ``[C]``. Chain call order follows
    ResBlock1 (convs1_0, convs2_0, convs1_1, ...) / ResBlock2 (convs_0, ...).
    """
    B, T, C = x.shape
    H = tower_halo(kernel_sizes, dilation_sizes, resblock)
    TT = _pick_tile(C, H)
    nT = -(-T // TT)
    interpret = interpret or jax.default_backend() == "cpu"

    xT = jnp.swapaxes(x, 1, 2)  # [B, C, T]; storage/compute in x.dtype
    xT = jnp.pad(xT, ((0, 0), (0, 0), (H, nT * TT - T + H)))

    chains = tuple(
        (k, chain_conv_dilations(ds, resblock))
        for k, ds in zip(kernel_sizes, dilation_sizes)
    )
    w_ins, b_ins = [], []
    for g, (k, conv_ds) in enumerate(chains):
        wg = []
        bg = []
        for i in range(len(conv_ds)):
            kern = weights[g][i]  # [k, C, C]
            # W[o, j*C + ci] = kern[j, ci, o]
            wg.append(jnp.transpose(kern, (2, 0, 1)).reshape(C, k * C))
            bg.append(biases[g][i].reshape(C, 1))
        w_ins.append(jnp.stack(wg).astype(x.dtype))
        b_ins.append(jnp.stack(bg).astype(jnp.float32))

    TW = TT + 2 * H
    kernel = functools.partial(_tower_kernel, chains, resblock, C, TT, H, T)
    out = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * len(chains)),
        out_specs=pl.BlockSpec(
            (1, C, TT), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, nT * TT), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((C, TW), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xT, *w_ins, *b_ins)
    return jnp.swapaxes(out[:, :, :T], 1, 2)
