"""The five graded benchmark configurations (BASELINE.json) exercised
end-to-end at test scale (full-size where cheap, shrunk where compile-bound).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from academicodec_tpu import load_codec
from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.models.hificodec import VQVAE


def test_config1_encodec_24k_32d_single_codebook_roundtrip():
    """Encodec_24k_32d: 1-codebook encode/decode of a 24 kHz wav."""
    model, variables = load_codec("encodec_24k_32d")
    assert model.n_q == 2
    wav = 0.3 * jnp.sin(2 * np.pi * 440 * jnp.arange(24000) / 24000)[None, :]
    # target_bw 7.5 kbps -> 1 codebook at 750 Hz frames (BASELINE.md)
    codes = jax.jit(
        lambda v, w: model.apply(v, w, target_bw=7.5, method=SoundStream.encode)
    )(variables, wav)
    assert codes.shape == (1, 1, 750)
    out = jax.jit(lambda v, c: model.apply(v, c, method=SoundStream.decode))(
        variables, codes
    )
    assert out.shape == (1, 24000)
    assert np.isfinite(np.asarray(out)).all()


def test_config2_encodec_16k_320d_8codebook_tokenization_batch8():
    """Encodec_16k_320d: bw=4 kbps -> exactly 8 RVQ codebooks, batch 8
    (SpearTTS-style token extraction)."""
    model, variables = load_codec("encodec_16k_320d")
    assert model.n_q == 24
    assert model.n_q_for_bandwidth(4) == 8  # 0.5 kbps per codebook at 50 Hz
    wav = jnp.zeros((8, 16000))
    codes = jax.jit(
        lambda v, w: model.apply(v, w, target_bw=4, method=SoundStream.encode)
    )(variables, wav)
    assert codes.shape == (8, 8, 50)
    assert codes.dtype == jnp.int32


def test_config4_hificodec_grvq_token_extraction():
    """HiFi-Codec-24k-320d: 4-stream acoustic tokens [B, T, 4]."""
    model, variables = load_codec("hificodec_24k_320d")
    wav = jnp.zeros((1, 4800))
    codes = jax.jit(lambda v, w: model.apply(v, w, method=VQVAE.encode))(
        variables, wav
    )
    assert codes.shape == (1, 4800 // 320, 4)
    out = jax.jit(lambda v, c: model.apply(v, c, method=VQVAE.decode))(
        variables, codes
    )
    assert out.shape == (1, 4800)


# configs 3 (GAN eval step) and 5 (full GAN train step on a data mesh) are
# exercised in tests/test_train.py::test_encodec_train_step_runs /
# test_encodec_train_step_sharded at test scale.
