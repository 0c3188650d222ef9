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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# static tap placement for the phase-major transposed conv — shared with
# the XLA subpixel lowering (single source of truth for the derivation)
from academicodec_tpu.ops.conv import convt_phase_taps as _convt_phase_taps

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
    pre,  # None | (u, m_max, phase_taps) — fused upsample-convT prologue
    post,  # None | (kp, C_post, tanh) — fused conv_post epilogue
    # refs
    x_hbm,  # tower in [B, C, H+nT*TT+H] | convT in [B, C_in, padded q-coords]
    *rest,
):
    n_chains = len(chains)
    w_refs = rest[:n_chains]  # each [n_convs, C, k*C] bf16
    b_refs = rest[n_chains : 2 * n_chains]  # each [n_convs, C, 1] f32
    rest = rest[2 * n_chains :]
    if pre is not None:
        wpre_ref, bpre_ref = rest[0], rest[1]  # [u, C, taps*C_in], [C, 1]
        rest = rest[2:]
    if post is not None:
        wpost_ref, bpost_ref = rest[0], rest[1]  # [C_post, kp*C], [C_post, 1]
        rest = rest[2:]
    o_ref = rest[0]  # [1, C or C_post, TT]
    xt = rest[1]  # VMEM DMA scratch
    sem = rest[2]

    i = pl.program_id(0)
    j = pl.program_id(1)
    TW = TT + 2 * H

    if pre is None:
        dma = pltpu.make_async_copy(x_hbm.at[i, :, pl.ds(j * TT, TW)], xt, sem)
    else:
        u, m_max, phase_taps = pre
        TqW0 = TW // u
        m_span = xt.shape[1] - TqW0
        dma = pltpu.make_async_copy(
            x_hbm.at[i, :, pl.ds(j * (TT // u), TqW0 + m_span)], xt, sem
        )
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
        # compare in f32: Mosaic has no bf16 vector cmpf on this target
        f = v.astype(jnp.float32)
        return jnp.where(f >= 0, f, LRELU_SLOPE * f).astype(v.dtype)

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
    if pre is None:
        x0 = xt[:]
    else:
        # fused transposed-conv prologue, phase-major: phase r of the output
        # reads input taps z[q - m] with static per-phase (m, j) placement;
        # each phase is one MXU matmul, then phases interleave onto lanes
        z = lrelu(xt[:])
        ys = []
        for r in range(u):
            taps = phase_taps[r]
            parts = [
                jax.lax.slice_in_dim(z, m_max - m, m_max - m + TqW0, axis=1)
                for (m, _) in taps
            ]
            col = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            yr = jax.lax.dot_general(
                wpre_ref[r, :, : col.shape[0]], col,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ys.append(yr)
        y = jnp.stack(ys, axis=0)  # [u, C, TqW0]
        y = jnp.transpose(y, (1, 2, 0)).reshape(C, TW) + bpre_ref[:]
        x0 = jnp.where(valid, y, 0.0).astype(cdtype)
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

    mean = acc / float(n_chains)
    if post is None:
        o_ref[0] = mean[:, H : H + TT].astype(o_ref.dtype)
    else:
        # fused conv_post epilogue: lrelu -> k=kp conv -> (tanh). The final
        # C_post=1 output would waste 99% of an XLA conv's lanes; here it is
        # one [C_post, kp*C] matmul on the already-resident tower output.
        kp, _c_post, tanh_flag = post
        a = lrelu(mean).astype(cdtype)
        col = _shift_cols(a, kp, 1)
        y = (
            jax.lax.dot_general(
                wpost_ref[:], col, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bpost_ref[:]
        )
        if tanh_flag:
            y = jnp.tanh(y)
        o_ref[0] = y[:, H : H + TT].astype(o_ref.dtype)


def _gn_tower_kernel(
    # static
    chains,
    resblock: str,
    C: int,
    TT: int,
    H: int,
    T_real: int,
    # refs
    x_hbm,
    *rest,
):
    """Encoder-bundle pass 1: all chains of the tower + per-channel moments.

    Like ``_tower_kernel`` but emits each chain's output separately (the
    encoder normalizes the ACCUMULATED sum between chains, reference
    models.py:405-416, so the mean cannot be taken in-kernel) plus the
    per-channel moment sums ``m_g = sum_t r_g`` and ``q_gh = sum_t r_g r_h``
    the GroupNorm affines are derived from (see ``resblock_tower_gn``).
    """
    n_chains = len(chains)
    w_refs = rest[:n_chains]
    b_refs = rest[n_chains : 2 * n_chains]
    rest = rest[2 * n_chains :]
    o_refs = rest[:n_chains]  # each [1, C, TT]
    mom_ref = rest[n_chains]  # [1, C, 128] f32, accumulated over time tiles
    xt = rest[n_chains + 1]  # VMEM DMA scratch
    sem = rest[n_chains + 2]

    i = pl.program_id(0)
    j = pl.program_id(1)
    TW = TT + 2 * H

    dma = pltpu.make_async_copy(x_hbm.at[i, :, pl.ds(j * TT, TW)], xt, sem)
    dma.start()
    dma.wait()

    t0 = j * TT - H
    tpos = t0 + jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
    valid = (tpos >= 0) & (tpos < T_real)

    def lrelu(v):
        f = v.astype(jnp.float32)
        return jnp.where(f >= 0, f, LRELU_SLOPE * f).astype(v.dtype)

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
    centers = []
    for g, (k, conv_ds) in enumerate(chains):
        w = w_refs[g]
        b = b_refs[g]
        cur = x0
        if resblock == "1":
            for p in range(0, len(conv_ds), 2):
                a = lrelu(cur)
                y1 = conv(w[p], b[p], a, k, conv_ds[p]).astype(cdtype)
                y2 = conv(w[p + 1], b[p + 1], lrelu(y1), k, conv_ds[p + 1])
                cur = (cur.astype(jnp.float32) + y2).astype(cdtype)
        else:
            for p in range(len(conv_ds)):
                y = conv(w[p], b[p], lrelu(cur), k, conv_ds[p])
                cur = (cur.astype(jnp.float32) + y).astype(cdtype)
        o_refs[g][0] = cur[:, H : H + TT]
        # moments from the SAME (storage-dtype) values that are written out,
        # so pass 2's affine recombination sees consistent statistics
        centers.append(cur[:, H : H + TT].astype(jnp.float32))

    cols = [jnp.sum(c, axis=1, keepdims=True) for c in centers]  # m_g [C,1]
    for g in range(n_chains):
        for h in range(g, n_chains):
            cols.append(
                jnp.sum(centers[g] * centers[h], axis=1, keepdims=True)
            )  # q_gh, order (0,0),(0,1),...,(1,1),...
    tile_mom = jnp.concatenate(cols, axis=1)  # [C, n_mom]
    n_mom = tile_mom.shape[1]
    tile_mom = jnp.pad(tile_mom, ((0, 0), (0, 128 - n_mom)))

    @pl.when(j == 0)
    def _init():
        mom_ref[0] = tile_mom

    @pl.when(j > 0)
    def _acc():
        mom_ref[0] += tile_mom


def _pick_tile(C: int, H: int, u: int = 1) -> int:
    """Time-tile size targeting ~8 MB of VMEM live data (multiple of the
    prologue's upsample factor so tiles stay phase-aligned)."""
    # dominant buffers: col [k_max*C, TW] bf16 + a few [C, TW] f32
    budget = 8 * 1024 * 1024
    # TT must divide into 128-lane-aligned tiles AND keep TT//u a multiple
    # of 128 (the prologue's DMA start is j*(TT//u) in input q-coords)
    step = 128 * u
    for tt0 in (8192, 6144, 4096, 3072, 2048, 1024, 512, 256, 128):
        tt = (tt0 // step) * step
        if tt == 0:
            continue
        tw = tt + 2 * H
        live = 11 * C * tw * 2 + 5 * C * tw * 4
        if live <= budget:
            return tt
    return step




@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_sizes", "dilation_sizes", "resblock", "pre_stride", "pre_pad",
        "post_tanh", "interpret",
    ),
)
def resblock_tower(
    x: jnp.ndarray,
    weights: Tuple[Tuple[jnp.ndarray, ...], ...],
    biases: Tuple[Tuple[jnp.ndarray, ...], ...],
    *,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    resblock: str = "1",
    pre_kernel: jnp.ndarray = None,  # [k, C_in, C] convT into the tower
    pre_bias: jnp.ndarray = None,
    pre_stride: int = 1,
    pre_pad: int = 0,
    post_kernel: jnp.ndarray = None,  # [kp, C, C_post] conv after the tower
    post_bias: jnp.ndarray = None,
    post_tanh: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mean of all resblock chains over ``x [B, T, C]`` -> ``[B, T, C]``.

    ``weights[g][i]`` is conv ``i`` of chain ``g`` as ``[k, C_in, C_out]``
    (flax layout); ``biases[g][i]`` is ``[C]``. Chain call order follows
    ResBlock1 (convs1_0, convs2_0, convs1_1, ...) / ResBlock2 (convs_0, ...).

    With ``pre_kernel``: ``x [B, T_in, C_in]`` first passes through
    lrelu -> ConvTranspose1d(stride=pre_stride, torch-crop pre_pad each
    side) INSIDE the kernel (phase-major matmuls) — the generator's
    upsample entering its resblock stage without an HBM round trip. With
    ``post_kernel``: lrelu -> conv -> (tanh) epilogue, fusing conv_post.
    """
    u = pre_stride if pre_kernel is not None else 1
    if pre_kernel is not None:
        B, T_in, C_in = x.shape
        C = pre_kernel.shape[2]
        T = T_in * u  # (k - u) even with pad = (k-u)//2 -> exact upsample
    else:
        B, T, C = x.shape
    H = tower_halo(kernel_sizes, dilation_sizes, resblock)
    if post_kernel is not None:
        H += (post_kernel.shape[0] - 1) // 2
    # Mosaic HBM slices must be 128-aligned on the lane dim: round the halo
    # so TW = TT + 2H stays a multiple of 128 (and of the upsample factor u
    # for phase alignment). Extra halo positions are just more masked
    # garbage — correctness only needs H >= the tower's receptive halo.
    import math as _math

    align = 64 * u // _math.gcd(64, u)
    H = -(-H // align) * align
    TT = _pick_tile(C, H, u)
    nT = -(-T // TT)
    interpret = interpret or jax.default_backend() == "cpu"

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
    extra_ins = []
    pre = post = None
    if pre_kernel is not None:
        kpre = pre_kernel.shape[0]
        m_lo, m_hi, phase_taps = _convt_phase_taps(kpre, u, pre_pad)
        TqW0 = TW // u
        # input in q-coords, padded so the DMA window starting at j*(TT//u)
        # covers q = (j*TT - H)/u - m_hi .. (j*TT + TT + H)/u - m_lo; the
        # window width rounds up to 128 for Mosaic's HBM slice alignment
        # (TT//u is already a multiple of 128 via _pick_tile)
        dma_w = -(-(TqW0 + (m_hi - m_lo)) // 128) * 128
        xT = jnp.swapaxes(x, 1, 2)  # [B, C_in, T_in]
        pad_lo = H // u + m_hi
        pad_hi = (nT - 1) * (TT // u) + dma_w - pad_lo - T_in
        xT = jnp.pad(xT, ((0, 0), (0, 0), (pad_lo, max(0, pad_hi))))
        n_taps_max = max(len(p) for p in phase_taps)
        wp = jnp.zeros((u, C, n_taps_max * C_in), jnp.float32)
        for r, taps in enumerate(phase_taps):
            for ti, (m, jj) in enumerate(taps):
                # W[r, o, ti*C_in + ci] = pre_kernel[jj, ci, o]
                wp = wp.at[r, :, ti * C_in : (ti + 1) * C_in].set(
                    jnp.transpose(pre_kernel[jj], (1, 0))
                )
        # kernel reads taps in the order listed -> shift by (m_hi - m)
        pre = (u, m_hi, phase_taps)
        extra_ins = [
            wp.astype(x.dtype),
            (pre_bias if pre_bias is not None else jnp.zeros((C,))).reshape(C, 1).astype(jnp.float32),
        ]
        scratch = pltpu.VMEM((C_in, dma_w), x.dtype)
    else:
        xT = jnp.swapaxes(x, 1, 2)  # [B, C, T]; storage/compute in x.dtype
        xT = jnp.pad(xT, ((0, 0), (0, 0), (H, nT * TT - T + H)))
        scratch = pltpu.VMEM((C, TW), x.dtype)

    C_out = C
    if post_kernel is not None:
        kp = post_kernel.shape[0]
        C_out = post_kernel.shape[2]
        post = (kp, C_out, post_tanh)
        extra_ins += [
            jnp.transpose(post_kernel, (2, 0, 1)).reshape(C_out, kp * C).astype(x.dtype),
            (post_bias if post_bias is not None else jnp.zeros((C_out,))).reshape(C_out, 1).astype(jnp.float32),
        ]

    kernel = functools.partial(
        _tower_kernel, chains, resblock, C, TT, H, T, pre, post
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (2 * len(chains) + len(extra_ins)),
        out_specs=pl.BlockSpec(
            (1, C_out, TT), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C_out, nT * TT), x.dtype),
        scratch_shapes=[
            scratch,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xT, *w_ins, *b_ins, *extra_ins)
    return jnp.swapaxes(out[:, :, :T], 1, 2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_sizes", "dilation_sizes", "resblock", "num_groups", "epsilon",
        "interpret",
    ),
)
def resblock_tower_gn(
    x: jnp.ndarray,
    weights: Tuple[Tuple[jnp.ndarray, ...], ...],
    biases: Tuple[Tuple[jnp.ndarray, ...], ...],
    gn_scales: jnp.ndarray,  # [n_chains, C]
    gn_biases: jnp.ndarray,  # [n_chains, C]
    *,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    resblock: str = "1",
    num_groups: int,
    epsilon: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused encoder resblock bundle (reference models.py:405-416):

        xs_0 = GN_0(r_0);  xs_g = GN_g(xs_{g-1} + r_g);  out = xs_last / G

    where every chain ``r_g`` reads the SAME stage input ``x`` and each
    GroupNorm normalizes the accumulated sum. A norm over the full time
    axis cannot live inside a time-tiled kernel, but it does not have to:
    GN is a per-channel affine once its group statistics are known, so the
    accumulated pre-norm tensor at every step is an affine combination
    ``sum_g coef_g[c] * r_g + const[c]`` whose statistics follow
    ALGEBRAICALLY from the per-channel moments ``sum_t r_g`` and
    ``sum_t r_g r_h``. Pass 1 (Pallas) computes all chains VMEM-resident
    (one HBM read of x, G writes) plus those moments; pass 2 derives the
    chained affines on [B, C] scalars and applies one fused elementwise
    combination (G reads, one write) — 2(G+1) tensor passes total vs
    ~3G(6+3) for the unfused lowering. Storage dtype bf16/f32 follows x;
    statistics and recombination run in f32.
    """
    B, T, C = x.shape
    G = len(kernel_sizes)
    H = tower_halo(kernel_sizes, dilation_sizes, resblock)
    H = -(-H // 64) * 64
    # the G chain-output f32 tiles add to the VMEM live set: shrink the
    # generator tower's tile budget accordingly
    TT = _pick_tile(C, H)
    while TT > 128 and (11 * C * (TT + 2 * H) * 2 + 5 * C * (TT + 2 * H) * 4
                        + G * C * TT * 4) > 8 * 1024 * 1024:
        TT //= 2
    nT = -(-T // TT)
    interpret = interpret or jax.default_backend() == "cpu"

    chains = tuple(
        (k, chain_conv_dilations(ds, resblock))
        for k, ds in zip(kernel_sizes, dilation_sizes)
    )
    w_ins, b_ins = [], []
    for g, (k, conv_ds) in enumerate(chains):
        wg, bg = [], []
        for i in range(len(conv_ds)):
            kern = weights[g][i]
            wg.append(jnp.transpose(kern, (2, 0, 1)).reshape(C, k * C))
            bg.append(biases[g][i].reshape(C, 1))
        w_ins.append(jnp.stack(wg).astype(x.dtype))
        b_ins.append(jnp.stack(bg).astype(jnp.float32))

    TW = TT + 2 * H
    xT = jnp.swapaxes(x, 1, 2)
    xT = jnp.pad(xT, ((0, 0), (0, 0), (H, nT * TT - T + H)))

    kernel = functools.partial(_gn_tower_kernel, chains, resblock, C, TT, H, T)
    outs = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * G),
        out_specs=[
            pl.BlockSpec((1, C, TT), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
            for _ in range(G)
        ]
        + [
            pl.BlockSpec((1, C, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_shape=[jax.ShapeDtypeStruct((B, C, nT * TT), x.dtype)] * G
        + [jax.ShapeDtypeStruct((B, C, 128), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((C, TW), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xT, *w_ins, *b_ins)
    rs, mom = outs[:G], outs[-1]  # rs: [B, C, nT*TT] each; mom: [B, C, 128]

    # ---- pass 2: chained GroupNorm affines from the moments (f32) -------
    m = [mom[:, :, g] for g in range(G)]  # each [B, C]
    q = {}
    col = G
    for g in range(G):
        for h in range(g, G):
            q[(g, h)] = q[(h, g)] = mom[:, :, col]
            col += 1

    gsize = C // num_groups
    N = float(gsize * T)

    def gsum(v):  # [B, C] -> per-group sum broadcast back to [B, C]
        s = v.reshape(B, num_groups, gsize).sum(axis=2, keepdims=True)
        return jnp.broadcast_to(s, (B, num_groups, gsize)).reshape(B, C)

    scales = gn_scales.astype(jnp.float32)
    bn = gn_biases.astype(jnp.float32)
    # running affine of the accumulated pre-norm tensor in the r_g basis:
    #   y_g = sum_h A[h] * r_h + K
    A = [jnp.zeros((B, C), jnp.float32) for _ in range(G)]
    K = jnp.zeros((B, C), jnp.float32)
    for g in range(G):
        A[g] = A[g] + 1.0  # ... + r_g
        # per-channel sum and sum-of-squares of y_g over time
        S = K * T
        for h in range(G):
            S = S + A[h] * m[h]
        Q = K * K * T
        for h in range(G):
            Q = Q + 2.0 * K * A[h] * m[h]
            for l in range(G):
                Q = Q + A[h] * A[l] * q[(h, l)]
        mu = gsum(S) / N
        var = gsum(Q) / N - mu * mu
        a = scales[g] * jax.lax.rsqrt(var + epsilon)
        b = bn[g] - mu * a
        # xs_g = a * y_g + b
        A = [a * Ah for Ah in A]
        K = a * K + b

    inv = 1.0 / float(G)
    out = K[:, :, None] * inv
    for g in range(G):
        out = out + (A[g] * inv)[:, :, None] * rs[g].astype(jnp.float32)
    out = out.astype(x.dtype)
    return jnp.swapaxes(out[:, :, :T], 1, 2)
