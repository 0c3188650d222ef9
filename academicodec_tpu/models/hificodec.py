"""HiFi-Codec: HiFi-GAN encoder + GRVQ + HiFi-GAN generator.

The ``VQVAE`` assembly mirrors the reference inference wrapper
(models/hificodec/vqvae.py:12-45): ``encode(wav) -> [B, frames, 4]`` int
tokens (the VALL-E/SoundStorm hand-off contract) and
``decode(tokens) -> wav``.

Public waveform layout: ``[B, T]`` float32.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.nn.hifigan import HiFiCodecConfig, HiFiGANEncoder, HiFiGANGenerator
from academicodec_tpu.quant.grvq import GroupResidualVQ


class VQVAE(nn.Module):
    config: HiFiCodecConfig = HiFiCodecConfig()
    norm: str = "weight_norm"  # "none" after utils.fold.fold_vqvae
    packed_conv: bool = False  # lanes-packed waveform-rate convs (ops/packed.py)
    fused_resblock: bool = False  # Pallas fused decode towers (ops/pallas/resblock.py)
    # encoder-side fused bundles (resblock_tower_gn: whole-stage chains +
    # the interleaved accumulated-sum GroupNorms via the moments lowering)
    # are a separate opt-in: the tower wins isolated (21.8 -> 16.0 ms on
    # the s0 bundle) but loses end-to-end in every wiring (35.2-35.5 ms
    # encode vs 34.2 packed) — the Pallas call is a scheduling barrier
    # that forfeits more XLA cross-segment overlap than it saves, plus
    # the head-unpack relayout. See BENCHMARKS.md "Where the encode time
    # is". The lanes-packed head stays the encoder fast path.
    fused_encoder: bool = False
    # W8A8 int8 serving for the MXU compute-bound wide resblock stages
    # (channels >= this; 0 = off). Requires a one-off calibration pass —
    # see calibrate_quant below. Composes with packed_conv/fused_resblock
    # (narrow stages keep their bf16 fast paths). ops/int8.py.
    int8_min_channels: int = 0
    dtype: Any = jnp.float32
    precision: Any = None

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.config.upsample_rates))

    def setup(self):
        h = self.config
        self.encoder = HiFiGANEncoder(
            config=h, norm=self.norm, packed_conv=self.packed_conv,
            fused_resblock=self.fused_encoder,
            int8_min_channels=self.int8_min_channels,
            dtype=self.dtype, precision=self.precision,
        )
        self.generator = HiFiGANGenerator(
            config=h, norm=self.norm, causal=h.causal,
            packed_conv=self.packed_conv,
            fused_resblock=self.fused_resblock,
            int8_min_channels=0 if h.causal else self.int8_min_channels,
            dtype=self.dtype, precision=self.precision,
        )
        self.quantizer = GroupResidualVQ(
            dim=h.latent_dim,
            n_codes=h.n_codes,
            n_groups=h.n_code_groups,
            n_residual=2,
            codebook_loss_lambda=h.codebook_loss_lambda,
            commitment_loss_lambda=h.commitment_loss_lambda,
            dtype=self.dtype,
        )

    def __call__(
        self, x: jnp.ndarray, training: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Training/eval forward: ``x [B, T]`` -> ``(recon [B, T], loss_q,
        codes [B, frames, n_res*G])`` (reference train.py:214-218)."""
        c = self.encoder(x[..., None])
        q, loss_q, codes = self.quantizer(c, training=training)
        y = self.generator(q)
        return y[..., 0], loss_q, codes

    def encode(self, x: jnp.ndarray, lengths=None) -> jnp.ndarray:
        """``x [B, T]`` -> acoustic tokens ``[B, frames, 4]``
        (reference vqvae.py:37-45).

        ``lengths [B]`` (optional): valid sample counts for a zero-padded
        batch. The encoder then masks its GroupNorm statistics to the valid
        prefix, so each item's valid token frames are exactly what its
        exact-length encode yields — one compile serves a whole
        variable-length corpus (trim frames ``>= ceil-mode count`` per
        item host-side). Requires the plain lowering (no packed/fused)."""
        c = self.encoder(x[..., None], lengths=lengths)
        _, _, codes = self.quantizer(c, training=False)
        return codes

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """tokens ``[B, frames, 4]`` -> wav ``[B, T]``
        (reference vqvae.py:31-35)."""
        q = self.quantizer.embed(codes)
        return self.generator(q)[..., 0]

    def decode_stream(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Chunked streaming decode (causal models): feed ``[B, frames, 4]``
        token chunks, get ``[B, frames*hop]`` waveform; per-conv caches carry
        across calls (see streaming.StreamingVQVAEDecoder)."""
        assert self.config.causal, "decode_stream requires a causal config"
        q = self.quantizer.embed(codes)
        return self.generator(q, streaming=True)[..., 0]


def calibrate_quant(model: VQVAE, variables: dict, wav: jnp.ndarray) -> dict:
    """One-off activation calibration for ``int8_min_channels`` serving.

    Runs one full-precision roundtrip over ``wav [B, T]`` with the
    ``'quant'`` collection mutable; every w8a8 conv records max|input| into
    its ``act_amax`` variable. Returns ``variables`` with the calibrated
    ``'quant'`` collection merged in — pass that dict to every subsequent
    ``apply``. Calibrate with the SAME config/threshold as serving (the set
    of w8a8 sites must match) and representative audio (the scales are
    static; louder out-of-distribution inputs clip at 127 * amax/127).

    The pass itself runs on a PLAIN clone (no fused towers, no packing):
    the fused Pallas towers extract conv weights instead of applying the
    conv modules, so their inputs are only observable through the unfused
    lowering. Module names are identical across lowerings, so the recorded
    collection serves any of them.
    """
    assert model.int8_min_channels > 0, "model has no w8a8 sites to calibrate"
    calib_model = model.clone(
        fused_resblock=False, fused_encoder=False, packed_conv=False
    )
    _, mut = calib_model.apply(variables, wav, mutable=["quant"])
    return {**variables, "quant": mut["quant"]}
