"""Causal HiFi-Codec generator + streaming decode (beyond-reference).

``HiFiCodecConfig(causal=True)`` builds a generator with left-padded convs
(SConv1d) and right-trimmed upsample convTs (SConvTranspose1d), making
tokens -> wav decoding chunk-streamable with carried caches — the
incremental-synthesis mode VALL-E/SoundStorm-style consumers need. The
encoder is unchanged (its full-utterance GroupNorms preclude causality; it
runs offline in that pipeline anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from academicodec_tpu.models.hificodec import VQVAE
from academicodec_tpu.nn.hifigan import HiFiCodecConfig
from academicodec_tpu.streaming import StreamingVQVAEDecoder

CFG = HiFiCodecConfig(
    upsample_rates=(2, 2, 2, 2),
    upsample_kernel_sizes=(4, 4, 4, 4),
    upsample_initial_channel=128,
    resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 2), (1, 3)),
    encoder_base_channels=8,
    n_code_groups=2,
    n_codes=32,
    sampling_rate=16000,
    causal=True,
)


@pytest.fixture(scope="module")
def causal_vqvae():
    model = VQVAE(config=CFG)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 640)).astype(np.float32) * 0.3
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, wav)
    return model, variables, wav


def test_causal_roundtrip_shapes(causal_vqvae):
    model, variables, wav = causal_vqvae
    y, loss_q, codes = model.apply(variables, wav)
    assert y.shape == wav.shape
    assert codes.shape == (2, wav.shape[1] // model.hop_length, 4)
    assert np.isfinite(float(loss_q))


@pytest.mark.parametrize("chunk", [1, 7, 10])
def test_streaming_decode_equals_full(causal_vqvae, chunk):
    """Chunked streaming decode is EXACTLY the full decode, for any chunk
    size in frames (incl. frame-by-frame)."""
    model, variables, wav = causal_vqvae
    toks = model.apply(variables, wav, method=VQVAE.encode)
    full = model.apply(variables, toks, method=VQVAE.decode)
    dec = StreamingVQVAEDecoder(model, variables)
    outs = [
        dec.process(toks[:, i : i + chunk]) for i in range(0, toks.shape[1], chunk)
    ]
    stream = jnp.concatenate(outs, axis=1)
    assert stream.shape == full.shape
    np.testing.assert_allclose(
        np.asarray(stream), np.asarray(full), atol=1e-5, rtol=1e-5
    )
    # session reset replays identically
    dec.reset()
    again = dec.process(toks[:, :chunk])
    np.testing.assert_array_equal(np.asarray(again), np.asarray(outs[0]))


def test_decode_causality(causal_vqvae):
    """Future tokens must not influence past audio AT ALL (bit-exact)."""
    model, variables, wav = causal_vqvae
    toks = model.apply(variables, wav, method=VQVAE.encode)
    full = model.apply(variables, toks, method=VQVAE.decode)
    cut = 30
    toks2 = toks.at[:, cut:].set((toks[:, cut:] + 1) % CFG.n_codes)
    full2 = model.apply(variables, toks2, method=VQVAE.decode)
    hop = model.hop_length
    np.testing.assert_array_equal(
        np.asarray(full[:, : cut * hop]), np.asarray(full2[:, : cut * hop])
    )
    # and the perturbation does change the future (the test has teeth)
    assert np.abs(np.asarray(full2[:, cut * hop :] - full[:, cut * hop :])).max() > 0


def test_non_causal_unchanged():
    """causal=False keeps the reference module tree (param names identical to
    the torch-importable layout — conv kernels directly under ups_i etc.)."""
    cfg = HiFiCodecConfig(
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), encoder_base_channels=8,
        n_code_groups=2, n_codes=16,
    )
    model = VQVAE(config=cfg)
    wav = jnp.zeros((1, 64), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, wav)
    gen = variables["params"]["generator"]
    # plain ConvTranspose1d/Conv1d params live directly under the module
    # (weight-norm kernel_v/kernel_g), not nested in SConv's convtr/conv
    assert "kernel_v" in gen["ups_0"] and "convtr" not in gen["ups_0"]
    assert "kernel_v" in gen["resblocks_0"]["convs1_0"]
    assert "conv" not in gen["resblocks_0"]["convs1_0"]


def test_causal_fold_weight_norm(causal_vqvae):
    """fold_vqvae handles the causal tree (SConv nesting: conv/convtr
    submodules) — identical tokens, float-noise decode deltas."""
    from academicodec_tpu.utils.fold import fold_vqvae

    model, variables, wav = causal_vqvae
    toks = model.apply(variables, wav, method=VQVAE.encode)
    full = model.apply(variables, toks, method=VQVAE.decode)
    fm, fv = fold_vqvae(model, variables)
    toks2 = fm.apply(fv, wav, method=VQVAE.encode)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
    full2 = fm.apply(fv, toks, method=VQVAE.decode)
    np.testing.assert_allclose(np.asarray(full2), np.asarray(full), atol=1e-5)
