"""Functional 1D/2D convolution primitives in channels-last layout.

These thin wrappers around ``lax.conv_general_dilated`` fix the TPU-friendly
dimension numbers once (``NHC`` activations / ``HIO`` kernels) so every layer
in the package shares one layout and XLA can tile the contractions onto the
MXU without layout churn.

Kernel layouts:
    conv1d:            ``[K, C_in // groups, C_out]``
    conv_transpose1d:  ``[K, C_in, C_out]``  (stored un-flipped; flipping and
                       input dilation happen here, matching the semantics of
                       a gradient/transposed convolution)
    conv2d:            ``[Kh, Kw, C_in, C_out]``
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

# (lhs, rhs, out) layouts for 1D convs on [B, T, C].
DN_1D = ("NHC", "HIO", "NHC")
DN_2D = ("NHWC", "HWIO", "NHWC")


def _promote_lhs(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Cast a floating activation to the kernel's floating dtype.

    The kernel dtype IS the layer's compute dtype (flax convention): under
    mixed-precision training f32 state (EMA codebook output, spectral-f32
    STFT features) meets bf16-cast kernels, and ``lax.conv_general_dilated``
    rejects mixed dtypes rather than promoting. No-op on the all-f32 parity
    paths and the all-bf16 serving paths.
    """
    if (
        x.dtype != kernel.dtype
        and jnp.issubdtype(x.dtype, jnp.floating)
        and jnp.issubdtype(kernel.dtype, jnp.floating)
    ):
        return x.astype(kernel.dtype)
    return x


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding: Sequence[Tuple[int, int]] = ((0, 0),),
    precision=None,
) -> jnp.ndarray:
    """Standard cross-correlation over ``[B, T, C]`` with kernel ``[K, Cin/g, Cout]``."""
    y = lax.conv_general_dilated(
        _promote_lhs(x, kernel),
        kernel,
        window_strides=(stride,),
        padding=tuple(padding),
        rhs_dilation=(dilation,),
        dimension_numbers=DN_1D,
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def conv_transpose1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: Tuple[int, int] = (0, 0),
    precision=None,
) -> jnp.ndarray:
    """Transposed conv over ``[B, T, C]`` with kernel ``[K, Cin, Cout]``.

    Implements ``y[t, o] = sum_{s,k,c} x[s, c] W[k, c, o]`` with
    ``t = s*stride + k - pad``: input dilation by ``stride``, full padding
    ``K-1`` reduced by the requested ``padding``, and a spatially flipped
    kernel. Output length is ``(T-1)*stride + K - pad_lo - pad_hi``.
    """
    k = kernel.shape[0]
    pad_lo, pad_hi = padding
    y = lax.conv_general_dilated(
        _promote_lhs(x, kernel),
        jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=((k - 1 - pad_lo, k - 1 - pad_hi),),
        lhs_dilation=(stride,),
        dimension_numbers=DN_1D,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def convt_phase_taps(k: int, u: int, pad: int):
    """Static tap placement for phase-major transposed-conv lowerings.

    Output ``y[u*q + r] = sum_m x[q - m] K[r + pad + u*m]`` over the ``m``
    with ``0 <= r + pad + u*m < k``. Returns ``(m_min, m_max, per-phase
    ((m, j), ...))``. Single source of truth for this index derivation —
    consumed by :func:`conv_transpose1d_subpixel` (XLA lowering) and the
    Pallas resblock tower's convT prologue (ops/pallas/resblock.py).
    """
    phases = []
    m_lo, m_hi = 10**9, -(10**9)
    for r in range(u):
        taps = []
        for m in range(-k, k + 1):
            j = r + pad + u * m
            if 0 <= j < k:
                taps.append((m, j))
                m_lo = min(m_lo, m)
                m_hi = max(m_hi, m)
        phases.append(tuple(taps))
    return m_lo, m_hi, tuple(phases)


def conv_transpose1d_subpixel(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: Tuple[int, int] = (0, 0),
    precision=None,
) -> jnp.ndarray:
    """Phase-major ("sub-pixel" / pixel-shuffle) transposed conv.

    Numerically equivalent to :func:`conv_transpose1d` when
    ``pad_lo == pad_hi == (K - stride) / 2`` (the HiFi-GAN upsample family,
    reference models/hificodec/models.py:143-151) but lowered TPU-first:
    one stride-1 conv producing ``[B, T, stride*Cout]`` — full MXU lanes
    even for narrow ``Cout`` — followed by a row-major reshape to
    ``[B, stride*T, Cout]``, which is a FREE contiguous reinterpretation
    (``(q, r*Co+o) == (q*stride+r, o)``). The lhs-dilation lowering XLA
    picks for the same op measured 0.1-12% of MXU peak on the decode
    stages; this form reaches regular-conv efficiency.

    Per output phase ``r``: ``y[u*q + r] = sum_m x[q - m] K[r + p + u*m]``;
    the scattered kernel packs all phases' taps into one ``[taps, Cin,
    u*Cout]`` weight (zero where a phase lacks a tap).
    """
    K, Ci, Co = kernel.shape
    u = stride
    p_lo, p_hi = padding
    if u < 1 or p_lo != p_hi or 2 * p_lo != K - u:
        raise ValueError(
            f"subpixel convT requires pad_lo == pad_hi == (K - stride)/2; "
            f"got K={K} stride={u} padding={padding}"
        )
    m_lo, m_hi, phases = convt_phase_taps(K, u, p_lo)
    taps = m_hi - m_lo + 1
    W = jnp.zeros((taps, Ci, u * Co), kernel.dtype)
    for r, phase in enumerate(phases):
        for m, j in phase:
            W = W.at[m_hi - m, :, r * Co : (r + 1) * Co].set(kernel[j])
    y = lax.conv_general_dilated(
        _promote_lhs(x, W),
        W,
        window_strides=(1,),
        padding=((m_hi, -m_lo),),  # negative pad = crop (XLA-supported)
        dimension_numbers=DN_1D,
        precision=precision,
    )
    B, Tq, _ = y.shape
    y = y.reshape(B, Tq * u, Co)
    if bias is not None:
        y = y + bias
    return y


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: Tuple[int, int] = (1, 1),
    dilation: Tuple[int, int] = (1, 1),
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0)),
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    """Standard 2D conv over ``[B, H, W, C]`` with kernel ``[Kh, Kw, Cin/g, Cout]``."""
    y = lax.conv_general_dilated(
        _promote_lhs(x, kernel),
        kernel,
        window_strides=tuple(stride),
        padding=tuple(padding),
        rhs_dilation=tuple(dilation),
        dimension_numbers=DN_2D,
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def avg_pool1d(
    x: jnp.ndarray, window: int, stride: int, padding: Tuple[int, int]
) -> jnp.ndarray:
    """Average pool over the time axis of ``[B, T, C]`` with torch AvgPool1d
    semantics: the divisor is the full window size, so zero padding counts."""
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), padding, (0, 0)),
    )
    return summed / float(window)
