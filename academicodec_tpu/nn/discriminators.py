"""Discriminator zoo: MS-STFT, multi-period, multi-scale (both flavors).

All return ``(logits, fmaps)`` per sub-discriminator, channels-last.

Two flavors exist per HiFi-GAN-style family, matching the reference:
  * "soundstream" flavor — thin fixed-32-channel convs, no norm, LeakyReLU
    0.2 (reference models/soundstream/models.py:14-160); used by the
    Encodec/SoundStream trainer.
  * "hificodec" flavor — full-width 32→1024 convs, weight/spectral norm,
    LeakyReLU 0.1 (reference models/hificodec/models.py:192-327); used by
    the HiFi-Codec trainer.

The MS-STFT discriminator (reference models/encodec/msstftd.py:27-178) is
shared by both trainers.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from academicodec_tpu.nn.conv import Conv1d, Conv2d
from academicodec_tpu.ops.conv import avg_pool1d
from academicodec_tpu.ops.stft import stft

DiscOutput = Tuple[List[jnp.ndarray], List[List[jnp.ndarray]]]


def _get_padding(k: int, d: int = 1) -> int:
    return int((k * d - d) / 2)


def _get_2d_padding(kernel_size, dilation=(1, 1)):
    return (
        ((kernel_size[0] - 1) * dilation[0]) // 2,
        ((kernel_size[1] - 1) * dilation[1]) // 2,
    )


class STFTDiscriminator(nn.Module):
    """Single-resolution STFT sub-discriminator (msstftd.py:27-134).

    Input wav ``[B, T]``; complex STFT (normalized, center=False) split into
    (real, imag) channels; 2D convs run over ``[time, freq]``.
    """

    filters: int = 32
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    in_channels: int = 1
    out_channels: int = 1
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: Tuple[int, int] = (3, 9)
    dilations: Tuple[int, ...] = (1, 2, 4)
    stride: Tuple[int, int] = (1, 2)
    norm: str = "weight_norm"
    activation_slope: float = 0.2
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        fmap = []
        s = stft(
            x,
            self.n_fft,
            self.hop_length,
            self.win_length,
            center=False,
            normalized=True,
        )  # [B, F, T']
        z = jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1)  # [B, F, T', 2]
        z = jnp.swapaxes(z, 1, 2)  # [B, T', F, 2]

        act = lambda v: jax.nn.leaky_relu(v, self.activation_slope)
        ks = self.kernel_size
        # first conv is *not* normalized in the reference (msstftd.py:84-89)
        z = Conv2d(
            in_channels=2 * self.in_channels,
            out_channels=self.filters,
            kernel_size=ks,
            padding=tuple((p, p) for p in _get_2d_padding(ks)),
            norm="none",
            dtype=self.dtype,
            precision=self.precision,
            name="convs_0",
        )(z)
        z = act(z)
        fmap.append(z)
        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, dilation in enumerate(self.dilations):
            out_chs = min((self.filters_scale ** (i + 1)) * self.filters, self.max_filters)
            z = Conv2d(
                in_channels=in_chs,
                out_channels=out_chs,
                kernel_size=ks,
                stride=self.stride,
                dilation=(dilation, 1),
                padding=tuple((p, p) for p in _get_2d_padding(ks, (dilation, 1))),
                norm=self.norm,
                dtype=self.dtype,
                precision=self.precision,
                name=f"convs_{i + 1}",
            )(z)
            z = act(z)
            fmap.append(z)
            in_chs = out_chs
        out_chs = min(
            (self.filters_scale ** (len(self.dilations) + 1)) * self.filters,
            self.max_filters,
        )
        sq = (ks[0], ks[0])
        z = Conv2d(
            in_channels=in_chs,
            out_channels=out_chs,
            kernel_size=sq,
            padding=tuple((p, p) for p in _get_2d_padding(sq)),
            norm=self.norm,
            dtype=self.dtype,
            precision=self.precision,
            name=f"convs_{len(self.dilations) + 1}",
        )(z)
        z = act(z)
        fmap.append(z)
        logits = Conv2d(
            in_channels=out_chs,
            out_channels=self.out_channels,
            kernel_size=sq,
            padding=tuple((p, p) for p in _get_2d_padding(sq)),
            norm=self.norm,
            dtype=self.dtype,
            precision=self.precision,
            name="conv_post",
        )(z)
        return logits.reshape(logits.shape[0], -1), fmap


class MultiScaleSTFTDiscriminator(nn.Module):
    """5 STFT sub-discriminators at n_fft {1024, 2048, 512, 256, 128}."""

    filters: int = 32
    n_ffts: Tuple[int, ...] = (1024, 2048, 512, 256, 128)
    hop_lengths: Tuple[int, ...] = (256, 512, 128, 64, 32)
    win_lengths: Tuple[int, ...] = (1024, 2048, 512, 256, 128)
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> DiscOutput:
        logits, fmaps = [], []
        for i, (nf, hl, wl) in enumerate(
            zip(self.n_ffts, self.hop_lengths, self.win_lengths)
        ):
            l, f = STFTDiscriminator(
                filters=self.filters,
                n_fft=nf,
                hop_length=hl,
                win_length=wl,
                dtype=self.dtype,
                precision=self.precision,
                name=f"discriminators_{i}",
            )(x)
            logits.append(l)
            fmaps.append(f)
        return logits, fmaps


class PeriodDiscriminator(nn.Module):
    """Reshapes wav by period into 2D and runs (k,1)-strided convs.

    ``channels=(32,32,32,32,32)`` + norm 'none' = soundstream flavor;
    ``channels=(32,128,512,1024,1024)`` + weight_norm = hificodec flavor.
    """

    period: int
    channels: Tuple[int, ...]
    kernel_size: int = 5
    stride: int = 3
    norm: str = "weight_norm"
    activation_slope: float = 0.1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        fmap = []
        B, T = x.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            T = T + n_pad
        z = x.reshape(B, T // p, p, 1)  # [B, t, period, C=1]

        in_ch = 1
        n = len(self.channels)
        for i, out_ch in enumerate(self.channels):
            last = i == n - 1
            z = Conv2d(
                in_channels=in_ch,
                out_channels=out_ch,
                kernel_size=(self.kernel_size, 1),
                stride=(1, 1) if last else (self.stride, 1),
                padding=((2, 2), (0, 0)),
                norm=self.norm,
                dtype=self.dtype,
                precision=self.precision,
                name=f"convs_{i}",
            )(z)
            z = jax.nn.leaky_relu(z, self.activation_slope)
            fmap.append(z)
            in_ch = out_ch
        z = Conv2d(
            in_channels=in_ch,
            out_channels=1,
            kernel_size=(3, 1),
            padding=((1, 1), (0, 0)),
            norm=self.norm,
            dtype=self.dtype,
            precision=self.precision,
            name="conv_post",
        )(z)
        fmap.append(z)
        return z.reshape(B, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Periods (2, 3, 5, 7, 11)."""

    flavor: str = "hificodec"  # or "soundstream"
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> DiscOutput:
        if self.flavor == "soundstream":
            channels, norm, slope = (32, 32, 32, 32, 32), "none", 0.2
        else:
            channels, norm, slope = (32, 128, 512, 1024, 1024), "weight_norm", 0.1
        logits, fmaps = [], []
        for i, p in enumerate(self.periods):
            l, f = PeriodDiscriminator(
                period=p,
                channels=channels,
                norm=norm,
                activation_slope=slope,
                dtype=self.dtype,
                precision=self.precision,
                name=f"discriminators_{i}",
            )(x)
            logits.append(l)
            fmaps.append(f)
        return logits, fmaps


class ScaleDiscriminator(nn.Module):
    """1D conv stack on (possibly pooled) raw audio."""

    specs: Tuple[Tuple[int, int, int, int, int], ...]  # (out_ch, k, s, groups, pad)
    norm: str = "weight_norm"
    activation_slope: float = 0.1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        fmap = []
        z = x[..., None]  # [B, T, 1]
        in_ch = 1
        for i, (out_ch, k, s, g, pad) in enumerate(self.specs):
            z = Conv1d(
                in_channels=in_ch,
                out_channels=out_ch,
                kernel_size=k,
                stride=s,
                groups=g,
                padding=(pad, pad),
                norm=self.norm,
                dtype=self.dtype,
                precision=self.precision,
                name=f"convs_{i}",
            )(z)
            z = jax.nn.leaky_relu(z, self.activation_slope)
            fmap.append(z)
            in_ch = out_ch
        z = Conv1d(
            in_channels=in_ch,
            out_channels=1,
            kernel_size=3,
            padding=(1, 1),
            norm=self.norm,
            dtype=self.dtype,
            precision=self.precision,
            name="conv_post",
        )(z)
        fmap.append(z)
        return z.reshape(z.shape[0], -1), fmap


_SS_SCALE_SPECS = (
    (32, 15, 1, 1, 7),
    (32, 41, 2, 4, 20),
    (32, 41, 2, 16, 20),
    (32, 41, 4, 16, 20),
    (32, 41, 4, 16, 20),
    (32, 41, 1, 16, 20),
    (32, 5, 1, 1, 2),
)
_HC_SCALE_SPECS = (
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
)


class MultiScaleDiscriminator(nn.Module):
    """3 scale discriminators on x1 / x2 / x4 average-pooled audio."""

    flavor: str = "hificodec"  # or "soundstream"
    num_scales: int = 3
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> DiscOutput:
        if self.flavor == "soundstream":
            specs, slope = _SS_SCALE_SPECS, 0.2
            norms = ("none",) * self.num_scales
        else:
            specs, slope = _HC_SCALE_SPECS, 0.1
            # reference: spectral norm on the first scale (models.py:303-306)
            norms = ("spectral_norm",) + ("weight_norm",) * (self.num_scales - 1)
        logits, fmaps = [], []
        z = x
        for i in range(self.num_scales):
            if i != 0:
                z = avg_pool1d(z[..., None], 4, 2, (2, 2))[..., 0]
            l, f = ScaleDiscriminator(
                specs=specs,
                norm=norms[i],
                activation_slope=slope,
                dtype=self.dtype,
                precision=self.precision,
                name=f"discriminators_{i}",
            )(x if i == 0 else z)
            logits.append(l)
            fmaps.append(f)
        return logits, fmaps
