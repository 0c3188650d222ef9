"""Time-packed ("lanes-packed") conv algebra for small-channel stages.

TPU vector lanes are 128 wide; the codec's waveform-rate stages run at
C=1..64 channels, wasting 50-99% of every lane. These helpers re-express a
``[B, T, C]`` tensor as ``[B, T/p, p*C]`` (p consecutive time steps packed
into the channel dim) and lower stride/transposed convs to dense stride-1
convs over packed rows with block-Toeplitz kernels:

    packed_conv1d:            p_out = p_in / stride   (downsampling keeps rows)
    packed_conv_transpose1d:  p_out = p_in * stride   (upsampling keeps rows)

so an entire SEANet decoder tail (or encoder head) chains at a constant
row count and full 128-256 lane rows with ZERO intermediate relayouts —
pack once at the boundary, unpack once at the end. Arithmetic is identical
to the plain ops up to float reduction order (same products, summed in a
different association); measured ~0 bf16 divergence on codec shapes.

Why not Pallas: these lower to single XLA convs (= MXU matmuls) already;
the transform is pure data layout.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from academicodec_tpu.ops.conv import DN_1D, _promote_lhs


def pack(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """``[B, T, C] -> [B, ceil(T/p), p*C]`` (zero-padded tail). One relayout."""
    if p == 1:
        return x
    B, T, C = x.shape
    rows = -(-T // p)
    if rows * p != T:
        x = jnp.pad(x, ((0, 0), (0, rows * p - T), (0, 0)))
    return x.reshape(B, rows, p * C)


def unpack(x: jnp.ndarray, p: int, length: Optional[int] = None) -> jnp.ndarray:
    """``[B, R, p*C] -> [B, R*p, C]`` (sliced to ``length``)."""
    if p == 1:
        return x if length is None else x[:, :length]
    B, R, PC = x.shape
    y = x.reshape(B, R * p, PC // p)
    return y if length is None else y[:, :length]


@lru_cache(maxsize=None)
def _index_maps_conv(K: int, stride: int, p_in: int, pad_lo: int, dilation: int = 1):
    """Brute-force tap placement for a packed strided conv.

    y[t] = sum_k x[t*stride + k - pad_lo] W[k]; with x packed p_in and
    y packed p_out = p_in/stride, output row r slot u reads input row r+m
    slot i when  i = u*stride + k - pad_lo - m*p_in  lands in [0, p_in).
    Returns (M, [(m, i, u, k), ...]).
    """
    assert p_in % stride == 0, (p_in, stride)
    p_out = p_in // stride
    raw = []
    for u in range(p_out):
        for k in range(K):
            t = u * stride + k * dilation - pad_lo
            m, i = divmod(t, p_in)  # floor div handles negative t
            raw.append((m, i, u, k))
    m_lo = min(m for m, *_ in raw)
    m_hi = max(m for m, *_ in raw)
    entries = tuple((m - m_lo, i, u, k) for (m, i, u, k) in raw)
    return m_hi - m_lo + 1, -m_lo, entries


@lru_cache(maxsize=None)
def _index_maps_convt(K: int, stride: int, p_in: int, pad_lo: int):
    """Tap placement for a packed transposed conv.

    y_full[j*stride + k] += x[j] W[k]; cropped output y[t] = y_full[t+pad_lo]
    packed p_out = p_in*stride: row r slot u is y_full[r*p_out + u + pad_lo],
    reading input row r+m slot i when
    k = (r*p_out + u + pad_lo) - (r+m)*p_in*stride - i*stride ... i.e.
    k = u + pad_lo - (m*p_in + i)*stride  (within one r). m may be negative
    (future input rows feed earlier outputs when pad_lo > 0) — handled by
    shifting all m to >= 0 and padding the conv accordingly.
    """
    p_out = p_in * stride
    raw = []
    for u in range(p_out):
        for i in range(p_in):
            for k in range(K):
                t = u + pad_lo - i * stride - k  # = m * p_out  if aligned
                if t % p_out == 0:
                    raw.append((t // p_out, i, u, k))
    if not raw:
        return 0, 0, tuple()
    m_lo = min(m for m, *_ in raw)
    m_hi = max(m for m, *_ in raw)
    entries = tuple((m - m_lo, i, u, k) for (m, i, u, k) in raw)
    return m_hi - m_lo + 1, -m_lo, entries


def _pack_kernel(kernel: jnp.ndarray, M: int, entries, p_in: int, p_out: int):
    K, Ci, Co = kernel.shape
    W2 = jnp.zeros((M, p_in, Ci, p_out, Co), kernel.dtype)
    if entries:
        m_idx = np.array([e[0] for e in entries])
        i_idx = np.array([e[1] for e in entries])
        u_idx = np.array([e[2] for e in entries])
        k_idx = np.array([e[3] for e in entries])
        W2 = W2.at[m_idx, i_idx, :, u_idx, :].set(kernel[k_idx])
    return W2.reshape(M, p_in * Ci, p_out * Co)


def packed_conv1d(
    xp: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    p_in: int,
    pad_lo: int = 0,
    precision=None,
) -> Tuple[jnp.ndarray, int]:
    """Strided conv on a packed tensor. Returns ``(yp, p_out)``.

    ``xp`` is ``pack(x, p_in)``; the result is ``pack(y, p_out)`` of
    ``y[t] = sum_k x[t*stride + k*dilation - pad_lo] W[k] + b`` with x
    zero-extended outside its true range (junk propagates only into tail
    slots; ``unpack(..., length=...)`` slices them away at the boundary).
    """
    K, Ci, Co = kernel.shape
    M, m_shift, entries = _index_maps_conv(K, stride, p_in, pad_lo, dilation)
    p_out = p_in // stride
    W2 = _pack_kernel(kernel, M, entries, p_in, p_out)
    yp = lax.conv_general_dilated(
        _promote_lhs(xp, W2), W2, window_strides=(1,),
        padding=((m_shift, M - 1 - m_shift),),
        dimension_numbers=DN_1D, precision=precision,
    )
    if bias is not None:
        yp = yp + jnp.tile(bias, p_out)
    return yp, p_out


def packed_conv_transpose1d(
    xp: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    p_in: int,
    pad_lo: int = 0,
    precision=None,
) -> Tuple[jnp.ndarray, int]:
    """Transposed conv on a packed tensor. Returns ``(yp, p_out)`` with
    ``p_out = p_in * stride``; row r slot u is the cropped output
    ``y_full[r*p_out + u + pad_lo]`` (torch-style pad_lo crop baked in)."""
    K, Ci, Co = kernel.shape
    M, m_shift, entries = _index_maps_convt(K, stride, p_in, pad_lo)
    p_out = p_in * stride
    W2 = _pack_kernel(kernel, M, entries, p_in, p_out)
    # output row r sums input rows r + m - m_shift for m in [0, M):
    # y[r] = sum_m x[r + m - lo] W2[m] with lo = m_shift
    yp = lax.conv_general_dilated(
        _promote_lhs(xp, W2), W2, window_strides=(1,),
        padding=((m_shift, M - 1 - m_shift),),
        dimension_numbers=DN_1D, precision=precision,
    )
    if bias is not None:
        yp = yp + jnp.tile(bias, p_out)
    return yp, p_out


# ---------------------------------------------------------------------------
# Layer-level API with exact padding semantics (reflect/zero edges).
#
# The packed main conv zero-extends the signal; SEANet convs reflect-pad.
# Only outputs whose window crosses a boundary differ — a handful of rows.
# Three exactness strategies, fastest applicable first:
#   * zero-pad convs: zero-extension IS zero padding — no correction at all;
#   * deferred-halo (``pack_t(halo=...)``, the model-chain default for
#     reflect): tiny unpacked strips carry true edge semantics through the
#     whole chain and are spliced once at final unpack (see ``Packed``);
#   * immediate splice (strips absent): recompute boundary rows unpacked
#     and splice per conv — two full-tensor copies per conv, kept for
#     direct/standalone calls.
# All three: packed == unpacked EXACTLY (up to float reduction order).
# ---------------------------------------------------------------------------

import dataclasses

from academicodec_tpu.ops import padding as _pad_ops
from academicodec_tpu.ops.conv import conv1d as _plain_conv1d


@dataclasses.dataclass
class Packed:
    """A lanes-packed tensor with its packing factor and true length.

    Deferred-halo mode (``head``/``tail`` strips present): the packed stream
    runs every conv in plain zero-extension form — interior outputs are
    identical under ANY edge-padding mode, so no per-conv boundary splices
    are needed — while small unpacked strips of the true signal flow through
    the same ops with exact (reflect/zero) edge semantics. ``hb``/``tb``
    count the corrupt head/tail samples of the main stream; ``unpack_t``
    splices the strips over them ONCE at the end of the chain, where the
    tensor is cheapest. This removes the two full-tensor splices per reflect
    conv (~40% of the packed SEANet decoder's wall time, measured in
    benchmarks/seanet_padmode_probe.py).
    """

    x: jnp.ndarray  # [B, rows, p*C]
    p: int
    length: int  # true (unpacked) time length; rows*p - length slots are junk
    head: Optional[jnp.ndarray] = None  # [B, Vh, C] exact output prefix
    tail: Optional[jnp.ndarray] = None  # [B, Vt, C] exact output suffix
    hb: int = 0  # corrupt head samples in x (deferred mode)
    tb: int = 0  # corrupt tail samples in x (deferred mode)

    @property
    def channels(self) -> int:
        return self.x.shape[-1] // self.p

    @property
    def deferred(self) -> bool:
        return self.head is not None

    def __add__(self, other: "Packed") -> "Packed":
        assert self.p == other.p and self.length == other.length
        if self.deferred or other.deferred:
            assert self.deferred and other.deferred
            xa, xb = self.x, other.x
            if xa.shape[1] != xb.shape[1]:
                # one branch went through the erosion fallback, which repacks
                # tightly (rows = ceil(T/p)); pad the shorter with junk rows
                # (positions >= length, excluded by the final splice)
                rows = max(xa.shape[1], xb.shape[1])
                xa = jnp.pad(xa, ((0, 0), (0, rows - xa.shape[1]), (0, 0)))
                xb = jnp.pad(xb, ((0, 0), (0, rows - xb.shape[1]), (0, 0)))
            vh = min(self.head.shape[1], other.head.shape[1])
            vt = min(self.tail.shape[1], other.tail.shape[1])
            hb, tb = max(self.hb, other.hb), max(self.tb, other.tb)
            assert hb <= vh and tb <= vt, (
                "residual add truncated the halo strips below the corrupt "
                "region", hb, vh, tb, vt,
            )
            return Packed(
                xa + xb, self.p, self.length,
                head=self.head[:, :vh] + other.head[:, :vh],
                tail=self.tail[:, -vt:] + other.tail[:, -vt:],
                hb=hb, tb=tb,
            )
        return Packed(self.x + other.x, self.p, self.length)

    def map(self, fn) -> "Packed":
        """Apply an elementwise fn (activation) slot-wise."""
        if self.deferred:
            return Packed(
                fn(self.x), self.p, self.length,
                head=fn(self.head), tail=fn(self.tail), hb=self.hb, tb=self.tb,
            )
        return Packed(fn(self.x), self.p, self.length)


def maybe_map(fn, x):
    """Apply an elementwise fn to a plain array or a Packed tensor."""
    return x.map(fn) if isinstance(x, Packed) else fn(x)


def pack_t(x: jnp.ndarray, p: int, halo: int = 0) -> Packed:
    """Pack ``x``; ``halo > 0`` enters deferred-halo mode with strips of
    ``min(halo, T)`` true samples at each edge (see ``Packed``)."""
    if halo > 0:
        v = min(halo, x.shape[1])
        return Packed(pack(x, p), p, x.shape[1], head=x[:, :v], tail=x[:, -v:])
    return Packed(pack(x, p), p, x.shape[1])


def unpack_t(t: Packed) -> jnp.ndarray:
    y = unpack(t.x, t.p, length=t.length)
    if t.deferred and (t.hb or t.tb):
        assert t.hb + t.tb <= t.length, (t.hb, t.tb, t.length)
        assert t.hb <= t.head.shape[1] and t.tb <= t.tail.shape[1], (
            t.hb, t.head.shape, t.tb, t.tail.shape,
        )
        parts = []
        if t.hb:
            parts.append(t.head[:, : t.hb])
        parts.append(y[:, t.hb : t.length - t.tb])
        if t.tb:
            parts.append(t.tail[:, t.tail.shape[1] - t.tb :])
        y = jnp.concatenate(parts, axis=1)
    return y




def sconv1d_packed(
    t: Packed,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    dilation: int = 1,
    pad_left: int,
    pad_right: int,
    pad_mode: str = "reflect",
    precision=None,
) -> Packed:
    """SConv1d-semantics conv on a packed tensor with exact edge padding.

    Matches ``pad1d(x, (pad_left, pad_right), mode)`` then VALID conv:
    ``out_T = (length + pad_left + pad_right - (K-1)*dilation - 1)//stride + 1``.
    """
    K, Ci, Co = kernel.shape
    xp, p_in, T = t.x, t.p, t.length
    B, R, _ = xp.shape
    span = (K - 1) * dilation
    out_T = (T + pad_left + pad_right - span - 1) // stride + 1
    p_out = p_in // stride

    if out_T > R * p_out:
        # packed rows cannot hold every output (pad_left+pad_right > span,
        # reachable only through the public API — no model conv does this):
        # compute exactly unpacked, mirroring the convT capacity guard
        xs = _pad_ops.pad1d(unpack_t(t), (pad_left, pad_right), mode=pad_mode)
        y = _plain_conv1d(
            xs, kernel, bias, stride=stride, dilation=dilation,
            precision=precision,
        )[:, :out_T]
        if t.deferred:
            return pack_t(y, p_out, halo=max(t.head.shape[1], t.tail.shape[1]))
        return Packed(pack(y, p_out), p_out, out_T)

    if t.deferred:
        # Deferred-halo mode: main stream runs pure zero-extension (exact
        # for every interior output); true edge semantics live in the strips.
        vh, vt = t.head.shape[1], t.tail.shape[1]
        # corrupt-region growth: outputs whose window reads a corrupt sample
        # or crosses the signal edge (where zero-extension != pad_mode)
        hb_out = -(-(t.hb + pad_left) // stride)
        tc = max(0, -(-(T - t.tb + pad_left - span) // stride))
        tb_out = max(0, out_T - min(tc, out_T))
        vh_out = (vh + pad_left - span - 1) // stride + 1
        t1 = -(-(T - vt + pad_left) // stride)  # first output inside tail strip
        vt_out = out_T - t1
        if (
            vh_out < max(1, hb_out)
            or vt_out < max(1, tb_out)
            or hb_out + tb_out >= out_T  # corrupt regions would overlap
        ):
            # strips eroded below the corrupt region (tiny inputs only):
            # splice now, compute exactly unpacked, re-enter with full strips
            xs = _pad_ops.pad1d(unpack_t(t), (pad_left, pad_right), mode=pad_mode)
            y = _plain_conv1d(
                xs, kernel, bias, stride=stride, dilation=dilation,
                precision=precision,
            )[:, :out_T]
            return pack_t(y, p_out, halo=max(vh, vt))
        yp, _ = packed_conv1d(
            xp, kernel, bias, stride=stride, dilation=dilation, p_in=p_in,
            pad_lo=pad_left, precision=precision,
        )
        head2 = _plain_conv1d(
            _pad_ops.pad1d(t.head, (pad_left, 0), mode=pad_mode),
            kernel, bias, stride=stride, dilation=dilation, precision=precision,
        )
        r_off = t1 * stride - pad_left - (T - vt)  # strip-local grid offset
        tail2 = _plain_conv1d(
            _pad_ops.pad1d(t.tail, (0, pad_right), mode=pad_mode)[:, r_off:],
            kernel, bias, stride=stride, dilation=dilation, precision=precision,
        )[:, :vt_out]
        return Packed(yp, p_out, out_T, head=head2, tail=tail2, hb=hb_out, tb=tb_out)

    if pad_mode in ("zero", "constant"):
        # Zero-extension IS zero padding: packed_conv1d is exact for every
        # valid output, so the reflect-mode head/tail splice corrections
        # (two full-tensor concats per conv — fusion killers) are skipped
        # entirely. Junk tail slots (T % p_in != 0) are masked to zero so
        # valid outputs whose window crosses x[T-1] read exact zeros; junk
        # *output* slots are re-zeroed so downstream packed convs stay exact.
        if R * p_in != T:
            xp = xp * junk_mask(t)
        yp, _ = packed_conv1d(
            xp, kernel, bias, stride=stride, dilation=dilation, p_in=p_in,
            pad_lo=pad_left, precision=precision,
        )
        out = Packed(yp, p_out, out_T)
        if yp.shape[1] * p_out != out_T:
            out = Packed(yp * junk_mask(out), p_out, out_T)
        return out

    # tiny inputs: head/tail corrections would overlap — just run unpacked
    h_est = -(-max(pad_left, 1) // stride)
    t0_est = max(0, -(-(T + pad_left - span) // stride))
    if h_est + (out_T - t0_est) >= out_T or T <= 2 * p_in * max(
        1, -(-(span + pad_left) // p_in)
    ):
        xs = _pad_ops.pad1d(unpack_t(t), (pad_left, pad_right), mode=pad_mode)
        y = _plain_conv1d(
            xs, kernel, bias, stride=stride, dilation=dilation, precision=precision
        )[:, :out_T]
        return Packed(pack(y, p_out), p_out, out_T)

    yp, _ = packed_conv1d(
        xp, kernel, bias, stride=stride, dilation=dilation, p_in=p_in,
        pad_lo=pad_left, precision=precision,
    )  # [B, R, p_out*Co], zero-extension semantics

    # --- head: outputs whose window starts before x[0] ---
    h = -(-pad_left // stride) if pad_left > 0 else 0  # ceil
    h_rows = -(-h // p_out) if h else 0
    if h_rows:
        H = h_rows * p_out
        need = (H - 1) * stride + span - pad_left + 1
        rows_in = min(R, -(-need // p_in))
        xs = unpack(xp[:, :rows_in], p_in, length=min(T, rows_in * p_in))
        xs = _pad_ops.pad1d(xs, (pad_left, 0), mode=pad_mode)
        y_head = _plain_conv1d(
            xs, kernel, bias, stride=stride, dilation=dilation, precision=precision
        )[:, :H]
        # dynamic_update_slice, not concatenate: XLA updates in place where
        # safe; a concat always materializes a fresh full-size buffer
        yp = lax.dynamic_update_slice(yp, pack(y_head, p_out), (0, 0, 0))

    # --- tail: outputs whose window crosses x[length-1], plus junk slots ---
    t0 = max(0, -(-(T + pad_left - span) // stride))  # first crossing output
    r1 = min(t0 // p_out, R - 1)
    if r1 < R:
        a = r1 * p_out * stride - pad_left  # first input index needed
        row_a = max(0, a // p_in)
        xs = unpack(xp[:, row_a:], p_in, length=max(1, T - row_a * p_in))
        xs = _pad_ops.pad1d(xs, (0, pad_right), mode=pad_mode)
        o = r1 * p_out * stride - pad_left - row_a * p_in
        y_tail = _plain_conv1d(
            xs[:, o:], kernel, bias, stride=stride, dilation=dilation,
            precision=precision,
        )[:, : out_T - r1 * p_out]
        fill = (R - r1) * p_out - y_tail.shape[1]
        if fill:
            y_tail = jnp.pad(y_tail, ((0, 0), (0, fill), (0, 0)))
        yp = lax.dynamic_update_slice(yp, pack(y_tail, p_out), (0, r1, 0))

    return Packed(yp, p_out, out_T)


def sconvtranspose1d_packed(
    t: Packed,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    stride: int,
    pad_left: int,
    pad_right: int,
    precision=None,
) -> Packed:
    """SConvTranspose1d semantics (full convT then crop) on a packed tensor.

    Crop-only padding means the packed lowering is exact everywhere; only
    the true output length needs tracking: ``out_T = length*s - pad_l - pad_r``.
    """
    xp, p_in, T = t.x, t.p, t.length
    K = kernel.shape[0]
    out_T = (T - 1) * stride + K - pad_left - pad_right
    p_out = p_in * stride
    from academicodec_tpu.ops.conv import conv_transpose1d as _plain_convt

    if t.deferred:
        vh, vt = t.head.shape[1], t.tail.shape[1]
        # convT itself is exact (crop-only padding); corruption comes only
        # from corrupt inputs and junk tail slots feeding the last outputs
        hb_out = max(0, (t.hb - 1) * stride + K - pad_left) if t.hb else 0
        tb_out = max(0, out_T - max(0, (T - t.tb) * stride - pad_left))
        vh_out = vh * stride - pad_left
        vt_out = vt * stride - pad_right
        if (
            out_T > xp.shape[1] * p_out
            or K < stride
            or vh_out < max(1, hb_out)
            or vt_out < max(1, tb_out)
            or hb_out + tb_out >= out_T  # corrupt regions would overlap
        ):
            # odd crops / eroded strips: splice, run exact unpacked, re-enter
            y = _plain_convt(
                unpack_t(t), kernel, bias, stride=stride,
                padding=(pad_left, pad_right), precision=precision,
            )
            return pack_t(y, p_out, halo=max(vh, vt))
        yp, p_out = packed_conv_transpose1d(
            xp, kernel, bias, stride=stride, p_in=p_in, pad_lo=pad_left,
            precision=precision,
        )
        # strip prefixes/suffixes: full convT of the strip, cropped so only
        # fully-determined outputs remain (K - stride overlap cut off)
        head2 = _plain_convt(
            t.head, kernel, bias, stride=stride,
            padding=(pad_left, K - stride), precision=precision,
        )
        tail2 = _plain_convt(
            t.tail, kernel, bias, stride=stride,
            padding=(K - stride, pad_right), precision=precision,
        )
        return Packed(yp, p_out, out_T, head=head2, tail=tail2, hb=hb_out, tb=tb_out)

    if out_T > xp.shape[1] * p_out:
        # the crop removes fewer than (K - stride) samples (e.g. an odd
        # torch-style k-u pad), so the true output outgrows the packed rows —
        # run unpacked and repack rather than silently truncating the tail
        y = _plain_convt(
            unpack_t(t), kernel, bias, stride=stride,
            padding=(pad_left, pad_right), precision=precision,
        )
        return Packed(pack(y, p_out), p_out, out_T)
    yp, p_out = packed_conv_transpose1d(
        xp, kernel, bias, stride=stride, p_in=p_in, pad_lo=pad_left,
        precision=precision,
    )
    return Packed(yp, p_out, out_T)


# ---------------------------------------------------------------------------
# Packed normalization (HiFi-Codec encoder GroupNorm).
# ---------------------------------------------------------------------------


def junk_mask(t: Packed) -> jnp.ndarray:
    """``[rows, p*C]`` {0,1} mask of true (non-junk) slots, built from iotas
    (fuses into the consumer; no giant array literal in the graph)."""
    R, p, C = t.x.shape[1], t.p, t.channels
    pos = lax.broadcasted_iota(jnp.int32, (R, p), 0) * p + lax.broadcasted_iota(
        jnp.int32, (R, p), 1
    )  # absolute time index of slot u in row r
    valid = (pos < t.length).astype(t.x.dtype)
    return jnp.broadcast_to(valid[:, :, None], (R, p, C)).reshape(R, p * C)


def group_norm_packed(
    t: Packed,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float,
) -> Packed:
    """Channels-last GroupNorm over ``(T, C//g)`` per (batch, group) on a
    packed tensor: junk slots are masked out of the statistics (and re-zeroed
    afterwards so downstream tail-corrected convs see clean boundaries).
    Matches ``GroupNormTorch`` on the unpacked tensor up to float reduction
    order. (Deferred-halo streams are unsupported: GN statistics are global
    over T, so corrupt edges would pollute every output.)"""
    import jax

    assert not t.deferred, "group_norm_packed requires immediate-mode Packed"

    B, R, PC = t.x.shape
    p, C, g = t.p, t.channels, num_groups
    mask = junk_mask(t)
    x = t.x * mask
    xg = x.reshape(B, R, p, g, C // g)
    cnt = t.length * (C // g)
    mean = jnp.sum(xg, axis=(1, 2, 4)) / cnt  # [B, g]
    mb = mean[:, None, None, :, None]
    # junk slots must not contribute (0 - mean)^2 — mask the deviations
    dev = (xg - mb) * mask.reshape(1, R, p, g, C // g)
    var = jnp.sum(dev * dev, axis=(1, 2, 4)) / cnt
    rs = jax.lax.rsqrt(var + eps)[:, None, None, :, None]
    y = (xg - mb) * rs * scale.reshape(g, C // g) + bias.reshape(g, C // g)
    y = y.reshape(B, R, PC) * mask
    return Packed(y, p, t.length)
