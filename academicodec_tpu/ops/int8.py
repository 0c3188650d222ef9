"""W8A8 int8 convolution primitives for quantized serving.

The HiFi-Codec generator/encoder wide stages (C>=128) are MXU
compute-bound at bf16 — 63-74% of matmul peak through plain XLA
(BENCHMARKS.md stage profiles), so neither fusion nor packing buys more
there. int8 does: this chip multiplies int8 1.24-1.75x faster than bf16
at those conv shapes (benchmarks/int8_matmul_probe.py), and int8
activations halve the HBM traffic of every producer/consumer pass.

Scheme (standard post-training W8A8, serving-only):
  * weights: symmetric per-out-channel scales, quantized on the fly from
    the resolved (norm-applied / folded) kernel — a [K,I,O]-sized
    elementwise op, negligible next to the conv;
  * activations: symmetric per-tensor STATIC scale, calibrated offline by
    recording max|x| at each conv input over a calibration batch (see
    ``nn.conv.Conv1d(w8a8=True)`` + ``models.hificodec.calibrate_quant``).
    A static scale keeps the quantize step a pure elementwise op that XLA
    fuses into the previous conv's epilogue — the int8 tensor is written
    directly, with no extra max-reduction pass over the activation (a
    dynamic per-batch scale would cost one full read per conv, eating the
    MXU win at the bandwidth-bound widths).

Accumulation is int32 (exact — no int8 overflow class exists), dequant is
a single fused multiply by ``act_scale * w_scale[cout]``.

No reference counterpart: upstream AcademiCodec serves fp32/fp16 only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

from academicodec_tpu.ops.conv import DN_1D


def quantize_kernel_per_cout(
    kernel: jnp.ndarray, eps: float = 1e-12
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-out-channel int8 quantization of a ``[K, I, O]`` kernel.

    Returns ``(kernel_i8 [K,I,O] int8, scale [O] f32)`` with
    ``kernel ~= kernel_i8 * scale``.
    """
    kf = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kf), axis=(0, 1))  # [O]
    scale = jnp.maximum(amax, eps) / 127.0
    ki = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return ki, scale


def quantize_act(x: jnp.ndarray, act_scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-tensor int8 quantization with a STATIC scalar scale.

    Pure elementwise — fuses into the producer. Values beyond
    ``127*act_scale`` clip (the calibration margin governs how often).
    """
    xi = jnp.round(x.astype(jnp.float32) / act_scale)
    return jnp.clip(xi, -127, 127).astype(jnp.int8)


def conv1d_w8a8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    act_scale: jnp.ndarray,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """int8 x int8 -> int32 convolution of ``[B, T, C]`` by ``[K, I, O]``.

    ``x`` is bf16/f32 (quantized here with ``act_scale``) or already int8
    (used as-is; then ``act_scale`` is only the dequant factor). Output is
    ``x``'s float dtype (int8 input returns f32).

    Zero padding only: the padded value must be exactly representable in
    the int8 domain, and 0 always is (symmetric quantization).
    """
    if x.dtype == jnp.int8:
        xi, out_dtype = x, jnp.float32
    else:
        xi, out_dtype = quantize_act(x, act_scale), x.dtype
    ki, w_scale = quantize_kernel_per_cout(kernel)
    yi = lax.conv_general_dilated(
        xi,
        ki,
        window_strides=(stride,),
        padding=(padding,),
        rhs_dilation=(dilation,),
        dimension_numbers=DN_1D,
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * (act_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
