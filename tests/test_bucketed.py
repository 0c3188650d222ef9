"""Length-bucketed serving: bounded jit compiles for variable-length corpora.

The eager reference runs each file at its native length (test.py:102-123);
under jit every distinct length is a fresh XLA compile (30 s-5 min each on
the TPU relay), so ``bucket_seconds`` pads inputs to bucket multiples and
trims outputs back. These tests pin the contract:

  * exact output lengths are restored (wav and token streams),
  * head tokens are bit-identical to an exact-length encode (only the tail
    receptive field may see the zero padding),
  * compiles are bounded: one encode executable per bucket count.
"""

import math

import numpy as np
import pytest

import jax

from academicodec_tpu.codec.compress import SoundStreamCompressor, decompress_codes
from academicodec_tpu.models.soundstream import SoundStream


RATIOS, SR, BWS = (8, 5, 4, 2), 16000, (1, 2, 4)
HOP = int(np.prod(RATIOS))  # 320


@pytest.fixture(scope="module")
def tiny_soundstream():
    model = SoundStream(
        n_filters=4, dimension=32, ratios=RATIOS, sample_rate=SR,
        target_bandwidths=BWS,
    )
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (1, SR)) * 0.1
    variables = model.init(
        {"params": rng, "rvq": rng}, wav, n_q=model.n_q, training=False
    )
    return model, variables


def test_bucketed_roundtrip_restores_exact_lengths(tiny_soundstream):
    model, variables = tiny_soundstream
    comp = SoundStreamCompressor(
        model, variables, target_bw=4, bucket_seconds=0.25
    )
    rng = np.random.default_rng(7)
    for T in (1000, 3999, 4000, 4001, 7777, 12000):
        wav = (rng.standard_normal(T) * 0.1).astype(np.float32)
        blob = comp.compress(wav)
        codes, meta = decompress_codes(blob)
        # the bitstream carries the exact-length frame count, not the bucket
        assert codes.shape[-1] == math.ceil(T / HOP)
        out, sr = comp.decompress(blob)
        assert sr == SR
        assert out.shape == (T,)


def test_bucketed_head_tokens_bit_identical(tiny_soundstream):
    """Zero-padding to the bucket may only perturb tokens whose receptive
    field reaches the pad — everything earlier must match an exact-length
    encode bit-for-bit."""
    model, variables = tiny_soundstream
    exact = SoundStreamCompressor(model, variables, target_bw=4)
    bucketed = SoundStreamCompressor(
        model, variables, target_bw=4, bucket_seconds=0.5
    )
    rng = np.random.default_rng(3)
    T = 5555  # mid-bucket: 2445 samples of zero padding follow
    wav = (rng.standard_normal(T) * 0.1).astype(np.float32)
    c_exact, _ = decompress_codes(exact.compress(wav))
    c_buck, _ = decompress_codes(bucketed.compress(wav))
    assert c_exact.shape == c_buck.shape
    n = c_exact.shape[-1]
    diff = np.nonzero((c_exact != c_buck).any(axis=0))[0]
    # tail-only deviation, bounded by the encoder's future receptive field
    # (SLSTM is causal; the conv stack's one-sided RF is well under 16
    # frames at these kernel sizes — measured 0-3 frames in practice)
    if diff.size:
        assert diff.min() >= n - 16, (
            f"bucketing changed non-tail tokens: first diff at frame "
            f"{diff.min()} of {n}"
        )


def test_bucketed_bounds_compiles(tiny_soundstream):
    """5 different lengths inside one bucket -> exactly one encode compile
    and one decode compile."""
    model, variables = tiny_soundstream
    comp = SoundStreamCompressor(
        model, variables, target_bw=4, bucket_seconds=1.0
    )
    rng = np.random.default_rng(11)
    blobs = []
    for T in (9000, 11111, 13013, 15000, 15999):
        wav = (rng.standard_normal(T) * 0.1).astype(np.float32)
        blobs.append(comp.compress(wav))
    assert comp._encode._cache_size() == 1
    for blob in blobs:
        comp.decompress(blob)
    assert comp._decode._cache_size() == 1
    # a second bucket count adds exactly one more executable
    wav = (rng.standard_normal(2 * SR - 5) * 0.1).astype(np.float32)
    comp.decompress(comp.compress(wav))
    assert comp._encode._cache_size() == 2
    assert comp._decode._cache_size() == 2


def test_bucketed_streams_interoperate_with_exact(tiny_soundstream):
    """The ECDC format is unchanged: bucketed-encoded files decode through
    an exact-length compressor and vice versa."""
    model, variables = tiny_soundstream
    exact = SoundStreamCompressor(model, variables, target_bw=4)
    bucketed = SoundStreamCompressor(
        model, variables, target_bw=4, bucket_seconds=0.25
    )
    rng = np.random.default_rng(5)
    T = 6001
    wav = (rng.standard_normal(T) * 0.1).astype(np.float32)

    out_a, _ = exact.decompress(bucketed.compress(wav))
    assert out_a.shape == (T,)
    out_b, _ = bucketed.decompress(exact.compress(wav))
    assert out_b.shape == (T,)
    # same tokens -> numerically close wavs (decode pad tokens only touch
    # the trimmed region plus the decoder's tail receptive field)
    head = T - 4 * HOP
    np.testing.assert_allclose(out_a[:head], out_b[:head], atol=1e-4)


def _tiny_vqvae():
    from academicodec_tpu.models.hificodec import VQVAE
    from academicodec_tpu.nn.hifigan import HiFiCodecConfig

    cfg = HiFiCodecConfig(
        upsample_rates=(5, 4, 2, 2),
        upsample_kernel_sizes=(11, 8, 4, 4),
        segment_size=4000,
    )
    model = VQVAE(config=cfg)
    rng = jax.random.PRNGKey(2)
    wav_init = jax.random.normal(rng, (1, 4000)) * 0.1
    variables = model.init(rng, wav_init, training=False)
    return cfg, model, variables


def test_bucketed_vqvae_token_extraction():
    """extract_tokens --bucket_seconds: trimmed [1, frames, 4] contract and
    BIT-EXACT tokens for the HiFi-Codec family. The encoder's GroupNorms
    normalize over the whole utterance, so plain zero-padding would shift
    every frame's statistics — VQVAE.encode(lengths=) masks the statistics
    to the valid prefix, making padded extraction exact."""
    from academicodec_tpu.models.hificodec import VQVAE

    cfg, model, variables = _tiny_vqvae()
    hop = int(np.prod(cfg.upsample_rates))

    encode = jax.jit(lambda v, w: model.apply(v, w, method=VQVAE.encode))
    encode_masked = jax.jit(
        lambda v, w, l: model.apply(v, w, lengths=l, method=VQVAE.encode)
    )
    rng_np = np.random.default_rng(9)
    T = 3210
    wav = (rng_np.standard_normal(T) * 0.1).astype(np.float32)

    n_exact = jax.eval_shape(
        lambda v, x: model.apply(v, x, method=VQVAE.encode),
        variables,
        jax.ShapeDtypeStruct((1, T), np.float32),
    ).shape[1]
    codes_exact = np.asarray(encode(variables, wav[None, :]))
    assert codes_exact.shape == (1, n_exact, 4)

    bucket = math.ceil(4000 / hop) * hop
    B = math.ceil(T / bucket) * bucket
    codes_buck = np.asarray(
        encode_masked(
            variables,
            np.pad(wav, (0, B - T))[None, :],
            np.array([T], np.int32),
        )
    )[:, :n_exact, :]
    np.testing.assert_array_equal(codes_exact, codes_buck)


def test_masked_encode_batches_variable_lengths():
    """One padded batch of different-length wavs == each wav encoded alone
    at its exact length — the serving capability the eager reference can't
    express (it runs files one by one, vqvae_tester.py:16-37)."""
    from academicodec_tpu.models.hificodec import VQVAE

    cfg, model, variables = _tiny_vqvae()
    encode = jax.jit(lambda v, w: model.apply(v, w, method=VQVAE.encode))
    encode_masked = jax.jit(
        lambda v, w, l: model.apply(v, w, lengths=l, method=VQVAE.encode)
    )
    rng_np = np.random.default_rng(13)
    lengths = [1777, 2400, 3999]
    wavs = [
        (rng_np.standard_normal(T) * 0.1).astype(np.float32) for T in lengths
    ]
    Tmax = max(lengths)
    batch = np.stack([np.pad(w, (0, Tmax - len(w))) for w in wavs])
    codes = np.asarray(
        encode_masked(variables, batch, np.array(lengths, np.int32))
    )
    for i, w in enumerate(wavs):
        n = jax.eval_shape(
            lambda v, x: model.apply(v, x, method=VQVAE.encode),
            variables,
            jax.ShapeDtypeStruct((1, len(w)), np.float32),
        ).shape[1]
        alone = np.asarray(encode(variables, w[None, :]))
        np.testing.assert_array_equal(alone[0], codes[i, :n, :])
