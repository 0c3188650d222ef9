"""Data-parallel SERVING equivalence: sharding the batch over the device
mesh must not change tokens or waveforms (the multi-chip deployment mode
for batch tokenization/synthesis; training DP is covered in test_train)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.parallel import make_mesh, shard_batch


def test_sharded_encode_decode_equals_unsharded():
    model = SoundStream(
        n_filters=4, dimension=32, ratios=(8, 5, 4, 2), sample_rate=16000,
        target_bandwidths=(1, 2, 4), bins=64,
    )
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (8, 16000)) * 0.1
    variables = model.init(
        {"params": rng, "rvq": rng}, wav[:1], n_q=model.n_q, training=False
    )

    codes_ref = model.apply(variables, wav, target_bw=4, method=SoundStream.encode)
    out_ref = model.apply(variables, codes_ref, method=SoundStream.decode)

    mesh = make_mesh()
    assert np.prod(list(mesh.shape.values())) == 8  # conftest: 8 virtual devices
    wav_sharded = shard_batch(np.asarray(wav), mesh)
    enc = jax.jit(
        lambda v, w: model.apply(v, w, target_bw=4, method=SoundStream.encode)
    )
    dec = jax.jit(lambda v, c: model.apply(v, c, method=SoundStream.decode))
    codes = enc(variables, wav_sharded)
    out = dec(variables, codes)

    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_ref))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), atol=1e-5, rtol=1e-5
    )


def test_data_parallel_compressor_blobs_byte_identical():
    """Corpus serving over the mesh (SoundStreamCompressor(mesh=...)): ECDC
    blobs must be byte-identical to single-device serving and decode must
    match — the graph is batch-pointwise, so GSPMD partitioning cannot
    change per-item numerics. This is the multi-chip deployment mode of
    cli/compress --data_parallel."""
    from academicodec_tpu.codec.compress import SoundStreamCompressor

    model = SoundStream(
        n_filters=4, dimension=32, ratios=(8, 5, 4, 2), sample_rate=16000,
        target_bandwidths=(1, 2, 4), bins=64,
    )
    rng = jax.random.PRNGKey(3)
    variables = model.init(
        {"params": rng, "rvq": rng}, jnp.zeros((1, 16000), jnp.float32),
        n_q=model.n_q, training=False,
    )
    rng_np = np.random.default_rng(7)
    wavs = [
        (rng_np.standard_normal(T) * 0.1).astype(np.float32)
        for T in (5000, 7000, 3000, 6400)
    ]

    plain = SoundStreamCompressor(model, variables, target_bw=4, bucket_seconds=0.5)
    dp = SoundStreamCompressor(
        model, variables, target_bw=4, bucket_seconds=0.5, mesh=make_mesh()
    )
    blobs_ref = plain.compress_batch(wavs, pad_to_batch=8)
    blobs_dp = dp.compress_batch(wavs, pad_to_batch=8)
    for got, want in zip(blobs_dp, blobs_ref):
        assert got == want
    outs_ref = plain.decompress_batch(blobs_ref, pad_to_batch=8)
    outs_dp = dp.decompress_batch(blobs_dp, pad_to_batch=8)
    for (a, sra), (b, srb) in zip(outs_dp, outs_ref):
        assert sra == srb and a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError, match="divisible"):
        dp.compress_batch(wavs[:3], pad_to_batch=3)
