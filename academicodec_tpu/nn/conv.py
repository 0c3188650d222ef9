"""Flax conv layers with built-in weight/spectral norm and streaming padding.

Design notes (TPU-first):
  * Channels-last ``[B, T, C]`` activations; kernels ``[K, I, O]``. One layout
    for the whole network keeps XLA from inserting transposes and maps the
    implicit GEMMs straight onto the MXU.
  * Weight norm is a parametrization (``v``, ``g``) resolved at call time —
    a handful of VPU flops that XLA fuses into the conv; ``fold()`` in the
    checkpoint importer turns it into a plain kernel for inference.
  * Normalization axes follow the same per-channel convention as the
    reference parametrizations (torch ``weight_norm(dim=0)``): per
    out-channel for conv, per *in*-channel for transposed conv. This keeps
    checkpoint import a pure reshape/transpose and training dynamics
    equivalent.

Behavioral parity targets: academicodec/modules/conv.py (SConv1d:213-269,
SConvTranspose1d:272-323, NormConv1d:124, NormConv2d:146).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from academicodec_tpu.ops import conv as conv_ops
from academicodec_tpu.ops import padding as pad_ops
from academicodec_tpu.ops.packed import Packed

Dtype = Any

NORMS = ("none", "weight_norm", "spectral_norm", "time_group_norm", "layer_norm")


def torch_conv_kernel_init(fan_in: int):
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the reference conv init
    distribution (kaiming_uniform(a=sqrt(5)) on torch conv weights)."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _l2_norm_keep(x: jnp.ndarray, axes: Tuple[int, ...], eps: float = 0.0) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axes, keepdims=True) + eps)


class _NormalizedKernel(nn.Module):
    """Mixin-free helper: create a (possibly re-parametrized) kernel param.

    ``wn_axes`` are the axes reduced when computing the per-slice norm
    (everything except the torch ``dim=0`` channel axis).
    """

    @staticmethod
    def make(
        mod: nn.Module,
        name: str,
        shape: Tuple[int, ...],
        kernel_init,
        norm: str,
        wn_axes: Tuple[int, ...],
        dtype: Dtype = jnp.float32,
    ) -> jnp.ndarray:
        assert norm in NORMS, norm
        if norm == "weight_norm":
            v = mod.param(f"{name}_v", kernel_init, shape, dtype)

            def g_init(key):  # g <- ||v|| so the initial effective weight == v
                return _l2_norm_keep(jax.lax.stop_gradient(v), wn_axes)

            g = mod.param(f"{name}_g", g_init)
            return g * v / _l2_norm_keep(v, wn_axes)
        if norm == "spectral_norm":
            w = mod.param(name, kernel_init, shape, dtype)
            return _spectral_normalize(mod, name, w)
        # 'layer_norm' / 'time_group_norm' are post-conv activations norms
        # (reference get_norm_module, conv.py:38-55) — plain kernel here.
        return mod.param(name, kernel_init, shape, dtype)

    @staticmethod
    def post_norm(mod: nn.Module, norm: str, channels: int, x: jnp.ndarray, dtype) -> jnp.ndarray:
        if norm == "layer_norm":
            from academicodec_tpu.nn.norm import ConvLayerNorm

            return ConvLayerNorm(channels=channels, dtype=dtype, name="norm")(x)
        if norm == "time_group_norm":
            from academicodec_tpu.nn.norm import TimeGroupNorm

            return TimeGroupNorm(channels=channels, dtype=dtype, name="norm")(x)
        return x


def _spectral_normalize(mod: nn.Module, name: str, w: jnp.ndarray) -> jnp.ndarray:
    """Spectral norm via one power-iteration step per training call.

    The weight is reshaped to ``[out, -1]`` using the torch channel
    convention (last axis of our kernels is the out-channel). The ``u``
    vector lives in the ``'spectral'`` variable collection; pass
    ``mutable=['spectral']`` during training applies.
    """
    out_ch = w.shape[-1]
    w_mat = jnp.moveaxis(w, -1, 0).reshape(out_ch, -1)
    u_var = mod.variable(
        "spectral",
        f"{name}_u",
        lambda: jax.random.normal(mod.make_rng("params") if mod.has_rng("params") else jax.random.PRNGKey(0), (out_ch,)),
    )
    u = u_var.value
    u = u / (jnp.linalg.norm(u) + 1e-12)
    v = w_mat.T @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u_new = w_mat @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
    if not mod.is_initializing() and not u_var.is_mutable():
        u_new = u  # eval mode: use cached u
    sigma = jnp.einsum("o,oi,i->", jax.lax.stop_gradient(u_new), w_mat, jax.lax.stop_gradient(v))
    if u_var.is_mutable() and not mod.is_initializing():
        u_var.value = jax.lax.stop_gradient(u_new)
    return w / sigma


class Conv1d(nn.Module):
    """Plain torch-style Conv1d on ``[B, T, C]`` with explicit symmetric padding.

    Used by the HiFi-Codec family, whose convs carry fixed "same" padding
    (reference: models/hificodec/models.py:18-125,364-427).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    norm: str = "none"
    kernel_init: Optional[Any] = None
    # W8A8 quantized serving (ops/int8.py). The activation scale is a
    # variable in the 'quant' collection: apply with mutable=['quant'] to
    # CALIBRATE (records max|x|, conv runs at full precision), then pass
    # the collection read-only to SERVE int8. Uncalibrated w8a8 serving
    # raises at trace time. Params are untouched — the torch checkpoint
    # importer and every norm parametrization work unchanged.
    w8a8: bool = False
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, packed_pads=None, pad_mode: str = "zero", return_kernel: bool = False):
        k_shape = (self.kernel_size, self.in_channels // self.groups, self.out_channels)
        fan_in = (self.in_channels // self.groups) * self.kernel_size
        k_init = self.kernel_init or torch_conv_kernel_init(fan_in)
        kernel = _NormalizedKernel.make(
            self, "kernel", k_shape, k_init, self.norm, wn_axes=(0, 1), dtype=self.dtype
        )
        bias = (
            self.param("bias", torch_conv_kernel_init(fan_in), (self.out_channels,), self.dtype)
            if self.use_bias
            else None
        )
        if return_kernel:
            # weight-extraction mode for externally fused lowerings (the
            # Pallas resblock tower): declare the exact same params (tree
            # unchanged — checkpoint import still works) but hand the
            # resolved kernel/bias to the caller instead of convolving
            assert self.norm not in ("layer_norm", "time_group_norm"), self.norm
            return kernel, bias
        if isinstance(x, Packed):  # lanes-packed path (ops/packed.py)
            from academicodec_tpu.ops import packed as packed_ops

            assert self.groups == 1 and self.norm not in ("layer_norm", "time_group_norm")
            pads = packed_pads if packed_pads is not None else self.padding
            return packed_ops.sconv1d_packed(
                x, kernel, bias, stride=self.stride, dilation=self.dilation,
                pad_left=pads[0], pad_right=pads[1],
                pad_mode=pad_mode, precision=self.precision,
            )
        if self.w8a8:
            assert self.groups == 1 and self.norm not in (
                "layer_norm",
                "time_group_norm",
            ), "w8a8 supports plain/weight-norm kernels only"
            from academicodec_tpu.ops import int8 as int8_ops

            if self.is_initializing():
                pass  # no quant var at init -> an uncalibrated tree has no
                # 'quant' collection and serving below fails loudly
            elif self.is_mutable_collection("quant"):
                # calibration pass: record the running max, serve full-precision
                amax = self.variable(
                    "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
                )
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                )
            else:
                if not self.has_variable("quant", "act_amax"):
                    raise ValueError(
                        f"w8a8 Conv1d {self.name!r} has no calibrated "
                        "act_amax: run models.hificodec.calibrate_quant (or "
                        "apply with mutable=['quant']) first and pass the "
                        "'quant' collection at serving time"
                    )
                amax = self.variable("quant", "act_amax", lambda: None)
                return int8_ops.conv1d_w8a8(
                    x, kernel, bias,
                    jnp.maximum(amax.value, 1e-12) / 127.0,
                    stride=self.stride, dilation=self.dilation,
                    padding=self.padding,
                )
        y = conv_ops.conv1d(
            x,
            kernel,
            bias,
            stride=self.stride,
            dilation=self.dilation,
            groups=self.groups,
            padding=(self.padding,),
            precision=self.precision,
        )
        return _NormalizedKernel.post_norm(self, self.norm, self.out_channels, y, self.dtype)


class ConvTranspose1d(nn.Module):
    """Plain torch-style ConvTranspose1d on ``[B, T, C]``.

    ``padding`` follows the torch meaning: that much output is cut from each
    side of the full transposed-conv result.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    norm: str = "none"
    # phase-major ("sub-pixel") lowering when the padding is the symmetric
    # (K - stride)/2 crop: full-lane stride-1 conv + free reshape instead of
    # XLA's zero-stuffed lhs_dilation form (ops/conv.py
    # conv_transpose1d_subpixel). Identical math, different lowering.
    subpixel: bool = False
    kernel_init: Optional[Any] = None
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, streaming_ola: bool = False, packed_pads=None, return_kernel: bool = False):
        k_shape = (self.kernel_size, self.in_channels, self.out_channels)
        fan_in = self.out_channels * self.kernel_size  # torch convT fan_in = out*k
        k_init = self.kernel_init or torch_conv_kernel_init(fan_in)
        # torch weight_norm(dim=0) on convT weight [in, out, k] -> per-IN-channel.
        kernel = _NormalizedKernel.make(
            self, "kernel", k_shape, k_init, self.norm, wn_axes=(0, 2), dtype=self.dtype
        )
        bias = (
            self.param("bias", torch_conv_kernel_init(fan_in), (self.out_channels,), self.dtype)
            if self.use_bias
            else None
        )
        if return_kernel:
            # weight-extraction mode (see Conv1d) — identical param tree,
            # resolved [K, Cin, Cout] kernel handed to a fused lowering
            return kernel, bias
        if isinstance(x, Packed):  # lanes-packed path (ops/packed.py)
            from academicodec_tpu.ops import packed as packed_ops

            # torch-style self.padding is itself a crop — same meaning as
            # packed_pads; callers use one or the other, never both
            pads = packed_pads if packed_pads is not None else self.padding
            assert packed_pads is None or self.padding == (0, 0)
            return packed_ops.sconvtranspose1d_packed(
                x, kernel, bias, stride=self.stride,
                pad_left=pads[0], pad_right=pads[1],
                precision=self.precision,
            )
        if streaming_ola:
            # Chunked streaming via overlap-add: the last ``k - s`` outputs
            # of each chunk overlap the next chunk's head. The carry is kept
            # bias-free so overlapping samples count the bias exactly once.
            k, s = self.kernel_size, self.stride
            assert self.padding == (0, 0)
            y = conv_ops.conv_transpose1d(
                x, kernel, None, stride=s, padding=(0, 0), precision=self.precision
            )
            emit_len = x.shape[-2] * s
            tail = k - s
            ola = self.variable(
                "cache",
                "ola",
                lambda: jnp.zeros((x.shape[0], tail, self.out_channels), self.dtype),
            )
            if tail:
                head = y[:, :tail, :] + ola.value
                out = jnp.concatenate([head, y[:, tail:emit_len, :]], axis=-2)
            else:
                out = y[:, :emit_len, :]
            if ola.is_mutable():
                ola.value = y[:, emit_len:, :]
            if bias is not None:
                out = out + bias
            return out
        if (
            self.subpixel
            and self.padding[0] == self.padding[1]
            and 2 * self.padding[0] == self.kernel_size - self.stride
        ):
            return conv_ops.conv_transpose1d_subpixel(
                x, kernel, bias, stride=self.stride, padding=self.padding,
                precision=self.precision,
            )
        return conv_ops.conv_transpose1d(
            x, kernel, bias, stride=self.stride, padding=self.padding, precision=self.precision
        )


class Conv2d(nn.Module):
    """Torch-style Conv2d on ``[B, H, W, C]`` with explicit padding per dim."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    groups: int = 1
    use_bias: bool = True
    norm: str = "none"
    kernel_init: Optional[Any] = None
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        k_shape = (kh, kw, self.in_channels // self.groups, self.out_channels)
        fan_in = (self.in_channels // self.groups) * kh * kw
        k_init = self.kernel_init or torch_conv_kernel_init(fan_in)
        kernel = _NormalizedKernel.make(
            self, "kernel", k_shape, k_init, self.norm, wn_axes=(0, 1, 2), dtype=self.dtype
        )
        bias = (
            self.param("bias", torch_conv_kernel_init(fan_in), (self.out_channels,), self.dtype)
            if self.use_bias
            else None
        )
        return conv_ops.conv2d(
            x,
            kernel,
            bias,
            stride=self.stride,
            dilation=self.dilation,
            padding=self.padding,
            groups=self.groups,
            precision=self.precision,
        )


class SConv1d(nn.Module):
    """Conv1d with built-in causal/asymmetric streaming padding.

    ``padding_total = (k-1)*d - (s-1)``; causal puts it all on the left, the
    non-causal split is ``left = total - total//2``. Extra right padding
    makes the final window full so encode/decode round-trips preserve length
    (reference: academicodec/modules/conv.py:213-269).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    norm: str = "weight_norm"
    pad_mode: str = "reflect"
    kernel_init: Optional[Any] = None
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, streaming: bool = False):
        k, s, d = self.kernel_size, self.stride, self.dilation
        padding_total = (k - 1) * d - (s - 1)
        if isinstance(x, Packed):  # lanes-packed input
            assert not streaming
            extra = pad_ops.get_extra_padding_for_conv1d(x.length, k, s, padding_total)
            if self.causal:
                pads = (padding_total, extra)
            else:
                pad_right = padding_total // 2
                pads = (padding_total - pad_right, pad_right + extra)
            return Conv1d(
                in_channels=self.in_channels,
                out_channels=self.out_channels,
                kernel_size=k,
                stride=s,
                dilation=d,
                groups=self.groups,
                use_bias=self.use_bias,
                norm=self.norm,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                precision=self.precision,
                name="conv",
            )(x, packed_pads=pads, pad_mode=self.pad_mode)
        if streaming:
            # Chunked causal streaming: a 'cache' buffer carries the last
            # ``padding_total`` input samples. With chunk lengths divisible
            # by the stride, the leftover after consuming whole windows is
            # exactly ``padding_total`` — static shapes, one executable.
            # The stream start is primed with zeros: exact equality with
            # full mode for ``pad_mode='zero'`` models; reflect-padded models
            # differ only within the first receptive field (deep layers see
            # chunks shorter than their padding, so the full-mode reflection
            # is not reproducible chunk-wise).
            assert self.causal, "streaming requires a causal conv"
            assert x.shape[-2] % s == 0, "stream chunk must be divisible by stride"

            buf = self.variable(
                "cache",
                "buf",
                lambda: jnp.zeros(
                    (x.shape[0], padding_total, self.in_channels), self.dtype
                ),
            )
            x_cat = jnp.concatenate([buf.value, x], axis=-2)
            if buf.is_mutable():
                buf.value = x_cat[:, x_cat.shape[-2] - padding_total :, :] if padding_total else x_cat[:, :0, :]
            x = x_cat
        else:
            extra = pad_ops.get_extra_padding_for_conv1d(x.shape[-2], k, s, padding_total)
            if self.causal:
                x = pad_ops.pad1d(x, (padding_total, extra), mode=self.pad_mode)
            else:
                pad_right = padding_total // 2
                pad_left = padding_total - pad_right
                x = pad_ops.pad1d(x, (pad_left, pad_right + extra), mode=self.pad_mode)
        return Conv1d(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            kernel_size=k,
            stride=s,
            dilation=d,
            groups=self.groups,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            precision=self.precision,
            name="conv",
        )(x)


class SConvTranspose1d(nn.Module):
    """ConvTranspose1d with causal ``trim_right_ratio`` / asymmetric trimming
    (reference: academicodec/modules/conv.py:272-323)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    causal: bool = False
    trim_right_ratio: float = 1.0
    use_bias: bool = True
    norm: str = "weight_norm"
    kernel_init: Optional[Any] = None
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, streaming: bool = False):
        assert self.causal or self.trim_right_ratio == 1.0
        k, s = self.kernel_size, self.stride
        padding_total = k - s
        convtr = ConvTranspose1d(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            kernel_size=k,
            stride=s,
            padding=(0, 0),
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            precision=self.precision,
            name="convtr",
        )
        if isinstance(x, Packed):  # lanes-packed input
            assert not streaming
            if self.causal:
                pad_right = math.ceil(padding_total * self.trim_right_ratio)
            else:
                pad_right = padding_total // 2
            return convtr(x, packed_pads=(padding_total - pad_right, pad_right))
        if streaming:
            # With full right-trim (trim_right_ratio=1, the causal default)
            # the samples trimmed in full mode are exactly the OLA carry, so
            # streaming chunks emit ``T_c * s`` samples identical to the
            # full-mode output.
            assert self.causal and self.trim_right_ratio == 1.0, (
                "streaming requires causal convT with trim_right_ratio=1"
            )
            return convtr(x, streaming_ola=True)

        y = convtr(x)
        if self.causal:
            pad_right = math.ceil(padding_total * self.trim_right_ratio)
            pad_left = padding_total - pad_right
        else:
            pad_right = padding_total // 2
            pad_left = padding_total - pad_right
        return pad_ops.unpad1d(y, (pad_left, pad_right))
