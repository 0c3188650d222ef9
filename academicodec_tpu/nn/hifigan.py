"""HiFi-GAN-style encoder/generator blocks (the HiFi-Codec backbone).

Channels-last ``[B, T, C]``. Submodule names mirror the reference module
tree (``conv_pre``, ``ups_{i}``, ``resblocks_{i}``, ``normalize_{i}``,
``conv_post``) so torch checkpoints import as mechanical tensor reshapes.

Behavioral parity target: models/hificodec/models.py:18-189 (ResBlock1/2,
Generator) and :364-427 (Encoder, incl. the GroupNorm-on-accumulated-sum
quirk at models.py:410-415).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from academicodec_tpu.nn.conv import Conv1d, ConvTranspose1d, SConv1d, SConvTranspose1d
from academicodec_tpu.ops import packed as packed_ops

LRELU_SLOPE = 0.1


def _lrelu(x, slope=LRELU_SLOPE):
    return packed_ops.maybe_map(lambda v: jax.nn.leaky_relu(v, slope), x)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return int((kernel_size * dilation - dilation) / 2)


def hifigan_normal_init(key, shape, dtype=jnp.float32):
    """init_weights: normal(0, 0.01) (reference utils.py:181-184)."""
    return 0.01 * jax.random.normal(key, shape, dtype)


@dataclass(frozen=True)
class HiFiCodecConfig:
    """Typed equivalent of the reference JSON/AttrDict config
    (egs/HiFi-Codec-*/config_*.json)."""

    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 5, 4, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 11, 8, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    encoder_base_channels: int = 32  # reference hardcodes 32 (models.py:395)
    n_code_groups: int = 2
    n_codes: int = 1024
    codebook_loss_lambda: float = 1.0
    commitment_loss_lambda: float = 0.25
    sampling_rate: int = 24000
    segment_size: int = 16000
    num_mels: int = 80
    n_fft: int = 1024
    hop_size: int = 240
    win_size: int = 1024
    fmin: int = 0
    fmax: int = 8000
    fmax_for_loss: Any = None
    # beyond-reference: causal generator (left-padded convs, right-trimmed
    # convT) -> tokens-to-wav decode is chunk-streamable (encoder unchanged;
    # see HiFiGANEncoder docstring for why it has no causal variant)
    causal: bool = False

    @property
    def latent_dim(self) -> int:
        """Encoder output width = base * 2^num_stages (512 at reference
        defaults: models.py:417-421 conv_post, vqvae quantizer dim)."""
        return self.encoder_base_channels * (2 ** len(self.upsample_rates))

    @classmethod
    def from_json(cls, d: dict) -> "HiFiCodecConfig":
        names = {f for f in cls.__dataclass_fields__}
        kw = {}
        for k, v in d.items():
            if k in names:
                if isinstance(v, list):
                    v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
                kw[k] = v
        return cls(**kw)


def _res_conv(
    *, channels, kernel_size, dilation, norm, causal, dtype, precision, name,
    w8a8=False,
):
    """A resblock conv: symmetric "same" zero padding (reference
    models.py:18-125), or its causal counterpart (all-left padding via
    SConv1d, which also provides the chunked-streaming cache)."""
    if causal:
        assert not w8a8, "w8a8 is a non-causal serving lowering"
        return SConv1d(
            in_channels=channels,
            out_channels=channels,
            kernel_size=kernel_size,
            dilation=dilation,
            norm=norm,
            causal=True,
            pad_mode="zero",
            dtype=dtype,
            precision=precision,
            name=name,
        )
    conv = Conv1d(
        in_channels=channels,
        out_channels=channels,
        kernel_size=kernel_size,
        dilation=dilation,
        padding=(get_padding(kernel_size, dilation),) * 2,
        norm=norm,
        w8a8=w8a8,
        dtype=dtype,
        precision=precision,
        name=name,
    )
    return lambda x, streaming=False, return_kernel=False: conv(
        x, return_kernel=return_kernel
    )


class ResBlock1(nn.Module):
    """3x [lrelu -> dilated conv -> lrelu -> unit conv] with residual adds.

    ``collect=True`` declares the SAME conv submodules/params but returns
    their resolved ``(kernels, biases)`` (call order convs1_0, convs2_0,
    convs1_1, ...) instead of computing — the weight source for the fused
    Pallas tower (ops/pallas/resblock.py), which needs the whole 3-chain
    bundle at once. Non-causal only (the fused tower is a serving lowering).
    """

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    norm: str = "weight_norm"
    causal: bool = False
    w8a8: bool = False  # int8 serving for every conv (ops/int8.py)
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        streaming: bool = False,
        collect: bool = False,
        mask=None,
    ):
        common = dict(
            channels=self.channels, kernel_size=self.kernel_size,
            norm=self.norm, causal=self.causal, dtype=self.dtype,
            precision=self.precision, w8a8=self.w8a8,
        )
        if collect:
            assert not self.causal, "fused tower has no causal variant"
            ws, bs = [], []
            for i, d in enumerate(self.dilation):
                for nm, dd in ((f"convs1_{i}", d), (f"convs2_{i}", 1)):
                    k, b = _res_conv(dilation=dd, name=nm, **common)(
                        x, return_kernel=True
                    )
                    ws.append(k)
                    bs.append(b)
            return tuple(ws), tuple(bs)
        for i, d in enumerate(self.dilation):
            xt = _lrelu(x)
            xt = _res_conv(dilation=d, name=f"convs1_{i}", **common)(
                xt, streaming=streaming
            )
            if mask is not None:
                # re-zero pad frames so the next conv's valid outputs see
                # zeros (== the exact-length conv's zero padding), not the
                # bias leakage of a conv over padding
                xt = xt * mask
            xt = _lrelu(xt)
            xt = _res_conv(dilation=1, name=f"convs2_{i}", **common)(
                xt, streaming=streaming
            )
            if mask is not None:
                xt = xt * mask
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """2x [lrelu -> dilated conv] with residual adds. ``collect`` as in
    :class:`ResBlock1` (call order convs_0, convs_1)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    norm: str = "weight_norm"
    causal: bool = False
    w8a8: bool = False  # int8 serving for every conv (ops/int8.py)
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        streaming: bool = False,
        collect: bool = False,
        mask=None,
    ):
        common = dict(
            channels=self.channels, kernel_size=self.kernel_size,
            norm=self.norm, causal=self.causal, dtype=self.dtype,
            precision=self.precision, w8a8=self.w8a8,
        )
        if collect:
            assert not self.causal, "fused tower has no causal variant"
            ws, bs = [], []
            for i, d in enumerate(self.dilation):
                k, b = _res_conv(dilation=d, name=f"convs_{i}", **common)(
                    x, return_kernel=True
                )
                ws.append(k)
                bs.append(b)
            return tuple(ws), tuple(bs)
        for i, d in enumerate(self.dilation):
            xt = _lrelu(x)
            xt = _res_conv(dilation=d, name=f"convs_{i}", **common)(
                xt, streaming=streaming
            )
            if mask is not None:
                xt = xt * mask  # see ResBlock1: keep pad frames exactly zero
            x = xt + x
        return x


class GroupNormTorch(nn.Module):
    """GroupNorm matching torch semantics on channels-last input.

    ``mask``/``count`` (set together) restrict the statistics to valid
    frames: ``mask [B, T, 1]`` 0/1, ``count [B]`` = number of valid frames.
    This is the length-masked serving path (HiFiGANEncoder ``lengths``)
    that makes zero-padded batches match per-item exact-length encodes —
    the reference (eager, models.py:410-415) never pads so it never needs
    this; under jit padding is how variable-length corpora avoid
    per-length recompiles."""

    num_groups: int
    channels: int
    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, collect: bool = False, mask=None, count=None
    ):
        scale = self.param("scale", nn.initializers.ones, (self.channels,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), self.dtype)
        if collect:
            # declare the params but return them instead of computing — the
            # weight source for the fused encoder bundle (resblock_tower_gn)
            return scale, bias
        if isinstance(x, packed_ops.Packed):
            assert mask is None, "masked stats need the plain layout"
            return packed_ops.group_norm_packed(
                x, self.num_groups, scale, bias, self.epsilon
            )
        B, T, C = x.shape
        g = self.num_groups
        xg = x.reshape(B, T, g, C // g)
        if mask is None:
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.var(xg, axis=(1, 3), keepdims=True)
        else:
            # masked statistics accumulate in f32: the valid-element count
            # (count * C/g, ~1e4 for 10 s inputs) is not representable in
            # bf16 and the long masked sums would lose the very exactness
            # the lengths= path exists for; a no-op at f32 serving precision
            m = mask[..., None].astype(jnp.float32)  # [B, T, 1, 1]
            xf = xg.astype(jnp.float32)
            n = (count.astype(jnp.float32) * (C // g)).reshape(B, 1, 1, 1)
            mean = jnp.sum(xf * m, axis=(1, 3), keepdims=True) / n
            var = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 3), keepdims=True) / n
            mean = mean.astype(x.dtype)
            var = var.astype(x.dtype)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        return xg.reshape(B, T, C) * scale + bias


class HiFiGANEncoder(nn.Module):
    """Mirrored HiFi-GAN generator used as the HiFi-Codec encoder
    (reference models.py:364-427). ``[B, T, 1]`` -> ``[B, frames, 512]``.

    The encoder has no causal variant by design: its per-resblock
    GroupNorms (models.py:410-415) normalize over the full utterance, so
    causal convs alone would not make frame t independent of the future —
    and the encode side runs offline in the TTS pipeline anyway. The causal
    (streaming) option lives in :class:`HiFiGANGenerator`."""

    config: HiFiCodecConfig
    norm: str = "weight_norm"
    packed_conv: bool = False
    # fused Pallas chains for the narrow waveform-rate stages (see
    # HiFiGANGenerator.fused_resblock). The encoder's GroupNorms normalize
    # the ACCUMULATED sum between chains (models.py:410-415), so chains are
    # fused one at a time and the norms stay in XLA.
    fused_resblock: bool = False
    fused_max_channels: int = 64
    # W8A8 int8 serving for resblock convs of stages with channels >=
    # int8_min_channels (0 = off) — see HiFiGANGenerator.int8_min_channels.
    # NOTE: int8 encode perturbs the latent, so extracted TOKENS can differ
    # from the bf16 path near codebook boundaries; decode-side int8 keeps
    # tokens exact. Calibrate encoder and generator together.
    int8_min_channels: int = 0
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None) -> jnp.ndarray:
        h = self.config
        num_kernels = len(h.resblock_kernel_sizes)
        resblock_cls = ResBlock1 if h.resblock == "1" else ResBlock2
        base = h.encoder_base_channels
        ups = list(reversed(list(zip(h.upsample_rates, h.upsample_kernel_sizes))))
        # Length-masked encode: ``lengths [B]`` marks the valid prefix of a
        # zero-padded batch. Valid-frame outputs then match each item's
        # exact-length encode (the GroupNorm statistics are restricted to
        # valid frames and pad frames are re-zeroed after every conv, so
        # right-edge windows see exactly the zeros an exact-length conv
        # pads with). This is what makes bucketed/batched variable-length
        # token extraction exact under jit — see codec/compress.py.
        L = mask = None
        if lengths is not None:
            if self.packed_conv or self.fused_resblock:
                raise ValueError(
                    "length-masked encode requires the plain lowering "
                    "(packed_conv=False, fused_resblock=False)"
                )
            L = jnp.asarray(lengths, jnp.int32)

        def _mask_for(xx, LL):
            B, T, _ = xx.shape
            return (jnp.arange(T)[None, :] < LL[:, None]).astype(xx.dtype)[
                ..., None
            ]

        # lanes-packing for the small-channel waveform-rate head (same policy
        # as SEANetEncoder.packed_head; ops/packed.py): pack the input so the
        # C=1..64 stem/stage convs and their GroupNorms run at >=128 effective
        # lanes, unpack (slice-only, p==1) once channels reach 128.
        j_max = 0
        if self.packed_conv:
            p0 = 1
            for j, (u, _k) in enumerate(ups):
                if base * (2**j) > 64 or p0 * u > 16:
                    break
                p0 *= u
                j_max = j + 1
            if j_max:
                x = packed_ops.pack_t(x, p0)
        x = Conv1d(
            in_channels=1,
            out_channels=base,
            kernel_size=7,
            padding=(3, 3),
            norm=self.norm,
            dtype=self.dtype,
            precision=self.precision,
            name="conv_pre",
        )(x)
        if L is not None:
            mask = _mask_for(x, L)
            x = x * mask  # conv-over-padding leaks the bias; zero it
        rks = list(reversed(h.resblock_kernel_sizes))
        rds = list(reversed(h.resblock_dilation_sizes))
        for i, (u, k) in enumerate(ups):
            x = _lrelu(x)
            x = Conv1d(
                in_channels=base * (2**i),
                out_channels=base * (2 ** (i + 1)),
                kernel_size=k,
                stride=u,
                padding=((k - u) // 2,) * 2,
                norm=self.norm,
                kernel_init=hifigan_normal_init,
                dtype=self.dtype,
                precision=self.precision,
                name=f"ups_{i}",
            )(x)
            if L is not None:
                # strided-conv output-length arithmetic on the valid prefix
                L = (L + 2 * ((k - u) // 2) - k) // u + 1
                mask = _mask_for(x, L)
                x = x * mask
            if i + 1 == j_max and isinstance(x, packed_ops.Packed):
                x = packed_ops.unpack_t(x)  # p==1 here: slice-only exit
            ch = base * (2 ** (i + 1))
            if ch < 16:
                raise ValueError(
                    f"encoder_base_channels={base} too small: stage {i} has "
                    f"{ch} channels but GroupNorm uses ch//16 groups "
                    "(reference models.py:412); need base*2 >= 16"
                )
            fuse_stage = self.fused_resblock and ch <= self.fused_max_channels
            if fuse_stage and isinstance(x, packed_ops.Packed):
                x = packed_ops.unpack_t(x)  # fused chains run on plain layout
            if fuse_stage:
                # whole-bundle fusion: all chains + the interleaved
                # accumulated-sum GroupNorms (reference models.py:405-416)
                # via the moments-based two-pass lowering
                from academicodec_tpu.ops.pallas.resblock import resblock_tower_gn

                ws_all, bs_all, scs, gbs = [], [], [], []
                for j in range(num_kernels):
                    rb = resblock_cls(
                        channels=ch, kernel_size=rks[j], dilation=tuple(rds[j]),
                        norm=self.norm, dtype=self.dtype,
                        precision=self.precision,
                        name=f"resblocks_{i * num_kernels + j}",
                    )
                    ws, bs = rb(x, collect=True)
                    ws_all.append(ws)
                    bs_all.append(bs)
                    sc, gb = GroupNormTorch(
                        num_groups=ch // 16, channels=ch, epsilon=1e-6,
                        dtype=self.dtype,
                        name=f"normalize_{i * num_kernels + j}",
                    )(x, collect=True)
                    scs.append(sc)
                    gbs.append(gb)
                x = resblock_tower_gn(
                    x, tuple(ws_all), tuple(bs_all),
                    jnp.stack(scs), jnp.stack(gbs),
                    kernel_sizes=tuple(rks),
                    dilation_sizes=tuple(tuple(d) for d in rds),
                    resblock=h.resblock,
                    num_groups=ch // 16,
                    epsilon=1e-6,
                )
            else:
                stage_w8a8 = (
                    0 < self.int8_min_channels <= ch
                    and not isinstance(x, packed_ops.Packed)
                )
                xs = None
                for j in range(num_kernels):
                    rb = resblock_cls(
                        channels=ch,
                        kernel_size=rks[j],
                        dilation=tuple(rds[j]),
                        norm=self.norm,
                        w8a8=stage_w8a8,
                        dtype=self.dtype,
                        precision=self.precision,
                        name=f"resblocks_{i * num_kernels + j}",
                    )
                    r = rb(x, mask=mask)
                    # the reference normalizes the *accumulated* sum each
                    # step (models.py:410-415)
                    xs = r if xs is None else xs + r
                    xs = GroupNormTorch(
                        num_groups=ch // 16,
                        channels=ch,
                        epsilon=1e-6,
                        dtype=self.dtype,
                        name=f"normalize_{i * num_kernels + j}",
                    )(xs, mask=mask, count=L)
                    if mask is not None:
                        xs = xs * mask  # the norm's bias leaks into pad frames
                x = packed_ops.maybe_map(lambda v: v / num_kernels, xs)
        if isinstance(x, packed_ops.Packed):
            x = packed_ops.unpack_t(x)
        x = _lrelu(x, 0.01)  # default torch slope (models.py:417)
        x = Conv1d(
            in_channels=h.latent_dim,
            out_channels=h.latent_dim,
            kernel_size=3,
            padding=(1, 1),
            norm="none",
            kernel_init=hifigan_normal_init,
            dtype=self.dtype,
            precision=self.precision,
            name="conv_post",
        )(x)
        return x


class HiFiGANGenerator(nn.Module):
    """HiFi-GAN generator (reference models.py:128-189).
    ``[B, frames, 512]`` -> ``[B, T, 1]``.

    ``causal=True`` builds the beyond-reference causal variant: every conv
    left-padded (SConv1d) and every upsample convT right-trimmed
    (SConvTranspose1d, trim_right_ratio=1), which makes tokens -> wav
    chunk-streamable with carried caches (``streaming=True``) — the serving
    mode TTS consumers (VALL-E/SoundStorm) need for incremental synthesis.
    """

    config: HiFiCodecConfig
    norm: str = "weight_norm"
    causal: bool = False
    packed_conv: bool = False
    packed_entry: int = -1  # upsample stage to enter packed layout (-1 = auto)
    packed_p0: int = 1  # initial packing factor applied at entry
    # fused Pallas resblock towers (ops/pallas/resblock.py) for stages with
    # cout <= fused_max_channels: one HBM round trip per 18-conv bundle
    # instead of 18, full-MXU im2col matmuls. Serving lowering — non-causal,
    # non-streaming; bit-compatible with the plain path up to bf16
    # reduction order (tests/test_pallas_resblock.py).
    fused_resblock: bool = False
    fused_max_channels: int = 64
    # also fuse the upsample convT INTO the tower kernel (phase-major
    # prologue). Default off on TPU: Mosaic cannot lower the phase
    # interleave ("unsupported shape cast" on the [C, Tq, u] -> [C, T]
    # collapse); the XLA convT feeds the fused tower instead. The kernel
    # path is complete and interpret-tested — flip on when Mosaic grows the
    # layout cast.
    fused_pre: bool = False
    # W8A8 int8 serving (ops/int8.py) for resblock convs of stages with
    # cout >= int8_min_channels (0 = off). Targets the MXU compute-bound
    # wide stages; composes with fused_resblock (narrow stages stay bf16
    # Pallas towers). Requires calibration — see models.hificodec
    # .calibrate_quant. Non-causal serving only.
    int8_min_channels: int = 0
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, streaming: bool = False) -> jnp.ndarray:
        h = self.config
        assert not streaming or self.causal, "streaming requires causal=True"
        assert not (self.int8_min_channels and self.causal), (
            "int8 serving has no causal variant"
        )
        num_kernels = len(h.resblock_kernel_sizes)
        resblock_cls = ResBlock1 if h.resblock == "1" else ResBlock2
        fused = self.fused_resblock and not streaming and not self.causal
        # lanes-packing entry: the earliest upsample stage from which the
        # remaining packing factor stays small and channels are narrow
        # (same policy as SEANetDecoder.packed_tail; ops/packed.py).
        entry = None
        if self.packed_conv and not streaming and not fused:
            import numpy as _np

            if self.packed_entry >= 0:
                entry = self.packed_entry
            else:
                for _i in range(len(h.upsample_rates)):
                    cout = h.upsample_initial_channel // (2 ** (_i + 1))
                    rem = int(_np.prod(h.upsample_rates[_i:]))
                    if rem <= 16 and cout <= 64:
                        entry = _i
                        break
        if self.causal:
            x = SConv1d(
                in_channels=h.latent_dim,
                out_channels=h.upsample_initial_channel,
                kernel_size=7,
                causal=True,
                pad_mode="zero",
                norm=self.norm,
                dtype=self.dtype,
                precision=self.precision,
                name="conv_pre",
            )(x, streaming=streaming)
        else:
            x = Conv1d(
                in_channels=h.latent_dim,
                out_channels=h.upsample_initial_channel,
                kernel_size=7,
                padding=(3, 3),
                norm=self.norm,
                dtype=self.dtype,
                precision=self.precision,
                name="conv_pre",
            )(x)
        ch = h.upsample_initial_channel
        n_up = len(h.upsample_rates)
        post_fused = False
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            cin = h.upsample_initial_channel // (2**i)
            cout = h.upsample_initial_channel // (2 ** (i + 1))
            if fused and cout <= self.fused_max_channels:
                # fused stage: 3-chain tower (+ lrelu/conv_post/tanh
                # epilogue on the last stage) in one Pallas call; the
                # upsample convT either fuses in as the phase-major
                # prologue (fused_pre) or runs as the XLA convT
                from academicodec_tpu.ops.pallas.resblock import resblock_tower

                ups = ConvTranspose1d(
                    in_channels=cin, out_channels=cout, kernel_size=k,
                    stride=u, padding=((k - u) // 2,) * 2, norm=self.norm,
                    subpixel=True,
                    kernel_init=hifigan_normal_init, dtype=self.dtype,
                    precision=self.precision, name=f"ups_{i}",
                )
                if self.fused_pre:
                    wT, bT = ups(x, return_kernel=True)
                else:
                    x = ups(_lrelu(x))
                ws, bs = [], []
                for j, (rk, rd) in enumerate(
                    zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)
                ):
                    w_b = resblock_cls(
                        channels=cout, kernel_size=rk, dilation=tuple(rd),
                        norm=self.norm, causal=self.causal, dtype=self.dtype,
                        precision=self.precision,
                        name=f"resblocks_{i * num_kernels + j}",
                    )(x, collect=True)
                    ws.append(w_b[0])
                    bs.append(w_b[1])
                post_kw = {}
                if i == n_up - 1:
                    wp, bp = Conv1d(
                        in_channels=cout, out_channels=1, kernel_size=7,
                        padding=(3, 3), norm=self.norm,
                        kernel_init=hifigan_normal_init, dtype=self.dtype,
                        precision=self.precision, name="conv_post",
                    )(x, return_kernel=True)
                    post_kw = dict(post_kernel=wp, post_bias=bp, post_tanh=True)
                    post_fused = True
                pre_kw = {}
                if self.fused_pre:
                    pre_kw = dict(
                        pre_kernel=wT, pre_bias=bT, pre_stride=u,
                        pre_pad=(k - u) // 2,
                    )
                x = resblock_tower(
                    x, tuple(ws), tuple(bs),
                    kernel_sizes=tuple(h.resblock_kernel_sizes),
                    dilation_sizes=tuple(tuple(d) for d in h.resblock_dilation_sizes),
                    resblock=h.resblock,
                    **pre_kw,
                    **post_kw,
                )
                ch = cout
                continue
            if i == entry:
                x = packed_ops.pack_t(x, self.packed_p0)
            x = _lrelu(x)
            if self.causal:
                x = SConvTranspose1d(
                    in_channels=cin,
                    out_channels=cout,
                    kernel_size=k,
                    stride=u,
                    causal=True,
                    trim_right_ratio=1.0,
                    norm=self.norm,
                    kernel_init=hifigan_normal_init,
                    dtype=self.dtype,
                    precision=self.precision,
                    name=f"ups_{i}",
                )(x, streaming=streaming)
            else:
                x = ConvTranspose1d(
                    in_channels=cin,
                    out_channels=cout,
                    kernel_size=k,
                    stride=u,
                    padding=((k - u) // 2,) * 2,
                    norm=self.norm,
                    subpixel=fused,  # phase-major lowering in serving mode
                    kernel_init=hifigan_normal_init,
                    dtype=self.dtype,
                    precision=self.precision,
                    name=f"ups_{i}",
                )(x)
            ch = cout
            stage_w8a8 = (
                0 < self.int8_min_channels <= ch
                and not isinstance(x, packed_ops.Packed)
            )
            xs = None
            for j, (rk, rd) in enumerate(
                zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)
            ):
                r = resblock_cls(
                    channels=ch,
                    kernel_size=rk,
                    dilation=tuple(rd),
                    norm=self.norm,
                    causal=self.causal,
                    w8a8=stage_w8a8,
                    dtype=self.dtype,
                    precision=self.precision,
                    name=f"resblocks_{i * num_kernels + j}",
                )(x, streaming=streaming)
                xs = r if xs is None else xs + r
            x = packed_ops.maybe_map(lambda v: v / num_kernels, xs)
        if post_fused:
            return x  # conv_post + tanh ran inside the last fused stage
        x = _lrelu(x)
        if self.causal:
            x = SConv1d(
                in_channels=ch,
                out_channels=1,
                kernel_size=7,
                causal=True,
                pad_mode="zero",
                norm=self.norm,
                kernel_init=hifigan_normal_init,
                dtype=self.dtype,
                precision=self.precision,
                name="conv_post",
            )(x, streaming=streaming)
        else:
            x = Conv1d(
                in_channels=ch,
                out_channels=1,
                kernel_size=7,
                padding=(3, 3),
                norm=self.norm,
                kernel_init=hifigan_normal_init,
                dtype=self.dtype,
                precision=self.precision,
                name="conv_post",
            )(x)
        x = packed_ops.maybe_map(jnp.tanh, x)
        if isinstance(x, packed_ops.Packed):
            x = packed_ops.unpack_t(x)
        return x
