"""Streaming == full-utterance equality for causal models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.streaming import StreamingDecoder, StreamingEncoder


@pytest.fixture(scope="module")
def causal_model():
    # pad_mode='zero': streaming primes with zeros, so full == streaming
    # exactly (reflect models differ within the first receptive field)
    model = SoundStream(
        n_filters=4,
        dimension=32,
        ratios=(8, 5, 4, 2),
        sample_rate=16000,
        target_bandwidths=(1, 2, 4),
        causal=True,
        pad_mode="zero",
    )
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 3200)) * 0.1
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "rvq": rng}, wav, n_q=model.n_q, training=False
    )
    # random codebooks so encode is nontrivial
    cb = variables["codebook"]["quantizer"]["vq"]
    emb = jax.random.normal(rng, cb["embed"].shape)
    variables = {
        "params": variables["params"],
        "codebook": {
            "quantizer": {
                "vq": {
                    "embed": emb,
                    "embed_avg": emb,
                    "cluster_size": jnp.ones_like(cb["cluster_size"]),
                    "inited": jnp.ones_like(cb["inited"]),
                }
            }
        },
    }
    return model, variables


def test_streaming_encoder_latents_match_full(causal_model):
    """The carried-state encoder reproduces the full-utterance latents
    (float tolerance: XLA fuses differently for different chunk shapes)."""
    model, variables = causal_model
    rng = np.random.default_rng(1)
    T = 3200
    wav = jnp.asarray((rng.standard_normal((2, T)) * 0.1).astype(np.float32))

    full_lat = model.apply(
        variables, wav[..., None], method=lambda m, x: m.encoder(x)
    )

    chunk = 640  # 2 frames per chunk
    cache = None
    parts = []
    for i in range(0, T, chunk):
        vs = dict(variables)
        if cache is not None:
            vs["cache"] = cache
        lat, mut = model.apply(
            vs,
            wav[:, i : i + chunk, None],
            method=lambda m, x: m.encoder(x, streaming=True),
            mutable=["cache"],
        )
        cache = mut["cache"]
        parts.append(lat)
    stream_lat = jnp.concatenate(parts, axis=-2)
    np.testing.assert_allclose(
        np.asarray(stream_lat), np.asarray(full_lat), atol=2e-5, rtol=1e-4
    )


def test_streaming_encode_tokens_match_full(causal_model):
    """Tokens agree with full-mode encode (allowing <2% near-tie argmin
    flips from shape-dependent float fusion)."""
    model, variables = causal_model
    rng = np.random.default_rng(1)
    T = 3200
    wav = jnp.asarray((rng.standard_normal((2, T)) * 0.1).astype(np.float32))

    full_codes = np.asarray(
        jax.jit(
            lambda v, w: model.apply(v, w, target_bw=4, method=SoundStream.encode)
        )(variables, wav)
    )

    enc = StreamingEncoder(model, variables, target_bw=4)
    chunk = 640
    parts = [enc.process(wav[:, i : i + chunk]) for i in range(0, T, chunk)]
    stream_codes = np.asarray(jnp.concatenate(parts, axis=-1))
    assert stream_codes.shape == full_codes.shape
    agreement = np.mean(stream_codes == full_codes)
    assert agreement > 0.98, agreement


def test_streaming_decode_matches_full(causal_model):
    model, variables = causal_model
    rng = np.random.default_rng(2)
    frames = 12
    codes = jnp.asarray(rng.integers(0, 64, size=(4, 2, frames)).astype(np.int32))

    full_wav = jax.jit(lambda v, c: model.apply(v, c, method=SoundStream.decode))(
        variables, codes
    )

    dec = StreamingDecoder(model, variables)
    parts = [dec.process(codes[:, :, i : i + 3]) for i in range(0, frames, 3)]
    stream_wav = jnp.concatenate(parts, axis=-1)
    assert stream_wav.shape == full_wav.shape
    np.testing.assert_allclose(
        np.asarray(stream_wav), np.asarray(full_wav), atol=1e-5, rtol=1e-4
    )


def test_streaming_roundtrip_and_reset(causal_model):
    model, variables = causal_model
    rng = np.random.default_rng(3)
    wav = jnp.asarray((rng.standard_normal((1, 1920)) * 0.1).astype(np.float32))
    enc = StreamingEncoder(model, variables, target_bw=4)
    c1 = enc.process(wav)
    enc.reset()
    c2 = enc.process(wav)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
