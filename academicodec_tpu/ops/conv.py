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
        x,
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
        x,
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
        x,
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
