"""Streaming-safe 1D padding math for strided convolutions.

Behavioral contract mirrors the reference's exact-length-reconstruction
semantics (reference: academicodec/modules/conv.py:58-121): the encoder
right-pads so the final conv window is full, causal mode puts all fixed
padding on the left, and short inputs get a zero-pad guard before reflect
padding. All functions here operate on channels-last ``[..., T, C]`` arrays
(time is axis -2), the TPU-native layout used throughout this package.

Everything is shape-static: padding amounts are computed from static shapes
at trace time, so these helpers are jit-safe with no dynamic shapes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def get_extra_padding_for_conv1d(
    length: int, kernel_size: int, stride: int, padding_total: int = 0
) -> int:
    """Extra right-padding so the last conv window is full.

    Ensures ceil-mode framing: with this extra padding, a subsequent
    conv-transpose + unpad reconstructs exactly ``length`` samples.
    (reference semantics: academicodec/modules/conv.py:58-68)
    """
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def pad_for_conv1d(
    x: jnp.ndarray, kernel_size: int, stride: int, padding_total: int = 0
) -> jnp.ndarray:
    """Right-pad ``x`` (time axis -2) so the last conv window is full."""
    extra = get_extra_padding_for_conv1d(x.shape[-2], kernel_size, stride, padding_total)
    if extra == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[-2] = (0, extra)
    return jnp.pad(x, pads)


def pad1d(
    x: jnp.ndarray,
    paddings: Tuple[int, int],
    mode: str = "zero",
    value: float = 0.0,
) -> jnp.ndarray:
    """Pad the time axis (-2), with a zero-pad guard for short reflect inputs.

    If ``mode == 'reflect'`` and the signal is shorter than the largest pad,
    zero-extend on the right first so reflection is well-defined, then trim
    the extension back off — identical observable behavior to the reference
    guard (academicodec/modules/conv.py:90-111).
    """
    pad_left, pad_right = paddings
    assert pad_left >= 0 and pad_right >= 0, (pad_left, pad_right)
    length = x.shape[-2]

    def _pad(arr, lo, hi, m, v):
        pads = [(0, 0)] * arr.ndim
        pads[-2] = (lo, hi)
        if m == "zero" or m == "constant":
            return jnp.pad(arr, pads, constant_values=v)
        return jnp.pad(arr, pads, mode=m)

    if mode == "reflect":
        max_pad = max(pad_left, pad_right)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            x = _pad(x, 0, extra_pad, "zero", 0.0)
        padded = _pad(x, pad_left, pad_right, "reflect", 0.0)
        end = padded.shape[-2] - extra_pad
        return padded[..., :end, :]
    return _pad(x, pad_left, pad_right, mode, value)


def unpad1d(x: jnp.ndarray, paddings: Tuple[int, int]) -> jnp.ndarray:
    """Remove padding from the time axis (-2)."""
    pad_left, pad_right = paddings
    assert pad_left >= 0 and pad_right >= 0, (pad_left, pad_right)
    assert (pad_left + pad_right) <= x.shape[-2]
    end = x.shape[-2] - pad_right
    return x[..., pad_left:end, :]
