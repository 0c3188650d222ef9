"""SEANet encoder/decoder (the Encodec/SoundStream generator backbone).

Channels-last, built from SConv1d / SConvTranspose1d / SLSTM. Submodule
names carry the reference's sequential indices (``model_{i}``) so torch
checkpoints map mechanically onto this tree (activations occupy indices in
the reference ``nn.Sequential`` and are skipped here).

Behavioral parity target: academicodec/modules/seanet.py:17-334.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.nn.conv import SConv1d, SConvTranspose1d
from academicodec_tpu.ops import packed as packed_ops
from academicodec_tpu.nn.lstm import SLSTM


def _activation(name: str, params: dict):
    if name == "ELU":
        alpha = params.get("alpha", 1.0)
        return lambda x: jax.nn.elu(x, alpha=alpha)
    if name == "LeakyReLU":
        slope = params.get("negative_slope", 0.01)
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == "ReLU":
        return jax.nn.relu
    if name == "Tanh":
        return jnp.tanh
    raise ValueError(f"unsupported activation {name}")


class SEANetResnetBlock(nn.Module):
    """[act -> SConv1d(k, dilation) -> act -> SConv1d(1)] + shortcut.

    Hidden width is ``dim // compress``; the shortcut is identity
    (``true_skip``) or a 1x1 SConv1d (reference: seanet.py:17-82).
    """

    dim: int
    kernel_sizes: Tuple[int, ...] = (3, 1)
    dilations: Tuple[int, ...] = (1, 1)
    activation: str = "ELU"
    activation_params: Any = None
    norm: str = "weight_norm"
    causal: bool = False
    pad_mode: str = "reflect"
    compress: int = 2
    true_skip: bool = True
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, streaming: bool = False) -> jnp.ndarray:
        act = _activation(self.activation, self.activation_params or {"alpha": 1.0})
        hidden = self.dim // self.compress
        y = x
        n = len(self.kernel_sizes)
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            in_chs = self.dim if i == 0 else hidden
            out_chs = self.dim if i == n - 1 else hidden
            y = packed_ops.maybe_map(act, y)
            # index 2*i+1: the reference block is Sequential(act, conv, act, conv)
            y = SConv1d(
                in_channels=in_chs,
                out_channels=out_chs,
                kernel_size=k,
                dilation=d,
                norm=self.norm,
                causal=self.causal,
                pad_mode=self.pad_mode,
                dtype=self.dtype,
                precision=self.precision,
                name=f"block_{2 * i + 1}",
            )(y, streaming=streaming)
        if self.true_skip:
            shortcut = x
        else:
            shortcut = SConv1d(
                in_channels=self.dim,
                out_channels=self.dim,
                kernel_size=1,
                norm=self.norm,
                causal=self.causal,
                pad_mode=self.pad_mode,
                dtype=self.dtype,
                precision=self.precision,
                name="shortcut",
            )(x, streaming=streaming)
        return shortcut + y


class SEANetEncoder(nn.Module):
    """Conv stem -> per-ratio [resblocks -> act -> strided conv] -> SLSTM -> proj.

    ``ratios`` are given in decoder (upsampling) order and reversed here,
    exactly like the reference (seanet.py:85-202). Input/output: ``[B, T, C]``.
    """

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_params: Any = None
    norm: str = "weight_norm"
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    lstm_use_pallas: bool = False
    packed_head: bool = False
    dtype: Any = jnp.float32
    precision: Any = None

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @nn.compact
    def __call__(self, x: jnp.ndarray, streaming: bool = False) -> jnp.ndarray:
        if streaming:
            assert self.causal, "streaming encode requires a causal model"
            assert x.shape[-2] % self.hop_length == 0, (
                "stream chunks must be a multiple of the hop length"
            )
        act = _activation(self.activation, self.activation_params or {"alpha": 1.0})
        down_ratios = list(reversed(list(self.ratios)))
        mult = 1
        idx = 0
        # lanes-packing for the small-channel waveform-rate head: pack the
        # first j_max downsample stages' time steps into the channel dim so
        # every conv runs at >=128 effective lanes (ops/packed.py). Bit-for-
        # bit semantics incl. reflect edges; serving-path optimization.
        j_max = 0
        if self.packed_head and not streaming:
            p0 = 1
            for j, r in enumerate(down_ratios):
                if self.n_filters * (2 ** j) > 64 or p0 * r > 16:
                    break
                p0 *= r
                j_max = j + 1
            if j_max:
                # deferred-halo mode (ops/packed.py Packed): the halo must
                # survive the head's downsampling (total stride <= 16), so
                # it is larger than the decoder's; zero-pad models skip the
                # strips (their packed fast path is exact without them)
                halo = 0 if self.pad_mode in ("zero", "constant") else 1024
                x = packed_ops.pack_t(x, p0, halo=halo)
        common = dict(
            norm=self.norm,
            causal=self.causal,
            pad_mode=self.pad_mode,
            dtype=self.dtype,
            precision=self.precision,
        )
        x = SConv1d(
            in_channels=self.channels,
            out_channels=mult * self.n_filters,
            kernel_size=self.kernel_size,
            name=f"model_{idx}",
            **common,
        )(x, streaming=streaming)
        idx += 1
        for stage, ratio in enumerate(down_ratios):
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    dim=mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base**j, 1),
                    activation=self.activation,
                    activation_params=self.activation_params,
                    norm=self.norm,
                    causal=self.causal,
                    pad_mode=self.pad_mode,
                    compress=self.compress,
                    true_skip=self.true_skip,
                    dtype=self.dtype,
                    precision=self.precision,
                    name=f"model_{idx}",
                )(x, streaming=streaming)
                idx += 1
            idx += 1  # activation occupies a sequential slot in the reference
            x = packed_ops.maybe_map(act, x)
            x = SConv1d(
                in_channels=mult * self.n_filters,
                out_channels=mult * self.n_filters * 2,
                kernel_size=ratio * 2,
                stride=ratio,
                name=f"model_{idx}",
                **common,
            )(x, streaming=streaming)
            idx += 1
            mult *= 2
            if stage + 1 == j_max and isinstance(x, packed_ops.Packed):
                x = packed_ops.unpack_t(x)  # p==1 here: slice-only exit
        if self.lstm:
            slstm = SLSTM(
                dimension=mult * self.n_filters,
                num_layers=self.lstm,
                use_pallas=self.lstm_use_pallas,
                dtype=self.dtype,
                precision=self.precision,
                name=f"model_{idx}",
            )
            if streaming:
                hc = self.variable(
                    "cache", f"model_{idx}_hc", lambda: slstm.init_carry(x.shape[0])
                )
                x, new_hc = slstm(x, carry=hc.value, return_carry=True)
                if hc.is_mutable():
                    hc.value = new_hc
            else:
                x = slstm(x)
            idx += 1
        idx += 1  # final activation slot
        x = act(x)
        x = SConv1d(
            in_channels=mult * self.n_filters,
            out_channels=self.dimension,
            kernel_size=self.last_kernel_size,
            name=f"model_{idx}",
            **common,
        )(x, streaming=streaming)
        return x


class SEANetDecoder(nn.Module):
    """Mirror of the encoder: proj -> SLSTM -> per-ratio [act -> convT ->
    resblocks] -> act -> conv to audio (reference: seanet.py:205-334)."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_params: Any = None
    final_activation: Optional[str] = None
    final_activation_params: Any = None
    norm: str = "weight_norm"
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    lstm_use_pallas: bool = False
    trim_right_ratio: float = 1.0
    packed_tail: bool = False
    dtype: Any = jnp.float32
    precision: Any = None

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @nn.compact
    def __call__(self, z: jnp.ndarray, streaming: bool = False) -> jnp.ndarray:
        if streaming:
            assert self.causal, "streaming decode requires a causal model"
        act = _activation(self.activation, self.activation_params or {"alpha": 1.0})
        mult = int(2 ** len(self.ratios))
        idx = 0
        common = dict(
            norm=self.norm,
            causal=self.causal,
            pad_mode=self.pad_mode,
            dtype=self.dtype,
            precision=self.precision,
        )
        x = SConv1d(
            in_channels=self.dimension,
            out_channels=mult * self.n_filters,
            kernel_size=self.kernel_size,
            name=f"model_{idx}",
            **common,
        )(z, streaming=streaming)
        idx += 1
        if self.lstm:
            slstm = SLSTM(
                dimension=mult * self.n_filters,
                num_layers=self.lstm,
                use_pallas=self.lstm_use_pallas,
                dtype=self.dtype,
                precision=self.precision,
                name=f"model_{idx}",
            )
            if streaming:
                hc = self.variable(
                    "cache", f"model_{idx}_hc", lambda: slstm.init_carry(x.shape[0])
                )
                x, new_hc = slstm(x, carry=hc.value, return_carry=True)
                if hc.is_mutable():
                    hc.value = new_hc
            else:
                x = slstm(x)
            idx += 1
        # lanes-packing entry: the earliest upsample stage from which the
        # remaining packing factor stays small and channels are narrow —
        # everything downstream runs packed (ops/packed.py), unpacked once
        # at the very end. Bit-for-bit semantics; serving-path optimization.
        entry = None
        if self.packed_tail and not streaming:
            m_probe = int(2 ** len(self.ratios))
            for i in range(len(self.ratios)):
                cout = (m_probe >> (i + 1)) * self.n_filters
                rem = int(np.prod(self.ratios[i:]))
                if rem <= 16 and cout <= 64:
                    entry = i
                    break
        for stage, ratio in enumerate(self.ratios):
            if stage == entry:
                # deferred-halo mode: reflect-edge corrections ride tiny
                # strips and splice once at the end (ops/packed.py Packed);
                # zero-pad models skip the strips — their packed fast path
                # is already exact with no corrections at all
                halo = 0 if self.pad_mode in ("zero", "constant") else 256
                x = packed_ops.pack_t(x, 1, halo=halo)
            idx += 1  # activation slot
            x = packed_ops.maybe_map(act, x)
            x = SConvTranspose1d(
                in_channels=mult * self.n_filters,
                out_channels=mult * self.n_filters // 2,
                kernel_size=ratio * 2,
                stride=ratio,
                norm=self.norm,
                causal=self.causal,
                trim_right_ratio=self.trim_right_ratio,
                dtype=self.dtype,
                precision=self.precision,
                name=f"model_{idx}",
            )(x, streaming=streaming)
            idx += 1
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    dim=mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base**j, 1),
                    activation=self.activation,
                    activation_params=self.activation_params,
                    norm=self.norm,
                    causal=self.causal,
                    pad_mode=self.pad_mode,
                    compress=self.compress,
                    true_skip=self.true_skip,
                    dtype=self.dtype,
                    precision=self.precision,
                    name=f"model_{idx}",
                )(x, streaming=streaming)
                idx += 1
            mult //= 2
        idx += 1  # final activation slot
        x = packed_ops.maybe_map(act, x)
        x = SConv1d(
            in_channels=self.n_filters,
            out_channels=self.channels,
            kernel_size=self.last_kernel_size,
            name=f"model_{idx}",
            **common,
        )(x, streaming=streaming)
        if isinstance(x, packed_ops.Packed):
            x = packed_ops.unpack_t(x)
        if self.final_activation is not None:
            final_act = _activation(
                self.final_activation, self.final_activation_params or {}
            )
            x = final_act(x)
        return x
