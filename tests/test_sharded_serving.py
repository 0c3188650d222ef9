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


# ---------------------------------------------------------------------------
# Sequence parallelism: ONE stream's time axis over the mesh
# ---------------------------------------------------------------------------


def test_time_sharded_soundstream_bit_exact_and_partitioned():
    """parallel.sequence.TimeShardedSoundStream: sharding the TIME axis of
    a single waveform over the mesh must keep tokens bit-exact (serving has
    no cross-time reductions — spatial partitioning moves data, not math)
    and the compiled graph must actually be partitioned (halo exchanges
    present, conv operands at T/n_devices)."""
    from academicodec_tpu.parallel import TimeShardedSoundStream
    from academicodec_tpu.parallel.sequence import shard_time

    model = SoundStream(
        n_filters=4, dimension=32, ratios=(8, 5, 4, 2), sample_rate=16000,
        target_bandwidths=(1, 2, 4), bins=64,
    )
    rng = jax.random.PRNGKey(0)
    wav = np.asarray(jax.random.normal(rng, (1, 16000)) * 0.1)
    variables = model.init(
        {"params": rng, "rvq": rng}, wav, n_q=model.n_q, training=False
    )
    codes_ref = model.apply(variables, wav, target_bw=4, method=SoundStream.encode)
    out_ref = model.apply(variables, codes_ref, method=SoundStream.decode)

    mesh = make_mesh()
    ts = TimeShardedSoundStream(model, variables, mesh, target_bw=4)
    codes, out = ts.roundtrip(wav)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_ref))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), atol=1e-6, rtol=1e-6
    )

    # partition evidence: the encoder HLO carries collective-permute halo
    # exchanges and runs its stem conv on a T/8 shard, not the full T
    txt = ts._encode.lower(
        ts.variables, shard_time(wav, mesh)
    ).compile().as_text()
    assert txt.count("collective-permute") > 0
    assert "f32[1,2000,4]" in txt  # stem conv output shard: 16000/8 frames

    # odd length: the time dim (1999 frames post-pad) does not divide the
    # mesh; shard_time falls back to a replicated put and numerics hold
    wav_odd = wav[:, : 16000 - 7]
    codes_odd_ref = model.apply(
        variables, wav_odd, target_bw=4, method=SoundStream.encode
    )
    np.testing.assert_array_equal(
        np.asarray(ts.encode(wav_odd)), np.asarray(codes_odd_ref)
    )


def test_time_sharded_vqvae_matches_unsharded():
    """TimeShardedVQVAE: GRVQ tokens under time sharding match unsharded
    extraction (the encoder's GroupNorm reductions become partial sums +
    all-reduce; observed bit-exact at f32/HIGHEST) and decode matches to
    float tolerance."""
    from academicodec_tpu.models.hificodec import VQVAE
    from academicodec_tpu.nn.hifigan import HiFiCodecConfig
    from academicodec_tpu.parallel import TimeShardedVQVAE

    cfg = HiFiCodecConfig.from_json(dict(
        upsample_rates=[5, 4, 2, 2], upsample_kernel_sizes=[11, 8, 4, 4],
        segment_size=4000, encoder_base_channels=8,
        upsample_initial_channel=128, n_codes=64,
    ))
    model = VQVAE(config=cfg)
    rng = jax.random.PRNGKey(2)
    wav = np.asarray(jax.random.normal(rng, (1, 16000)) * 0.1)
    variables = model.init(rng, wav, training=False)

    codes_ref = np.asarray(model.apply(variables, wav, method=VQVAE.encode))
    out_ref = np.asarray(model.apply(variables, codes_ref, method=VQVAE.decode))

    ts = TimeShardedVQVAE(model, variables, make_mesh())
    np.testing.assert_array_equal(np.asarray(ts.encode(wav)), codes_ref)
    np.testing.assert_allclose(
        np.asarray(ts.decode(codes_ref)), out_ref, atol=1e-6, rtol=1e-6
    )


def test_sequence_parallel_compressor_blobs_byte_identical():
    """SoundStreamCompressor(shard_axis='time'): ECDC blobs under
    sequence-parallel serving are byte-identical to single-device serving
    (tokens bit-exact under spatial partitioning), and odd lengths that do
    not divide the mesh fall back cleanly. CLI surface: compress
    --sequence_parallel."""
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
    rng_np = np.random.default_rng(11)
    # one mesh-divisible length, one not (8-device fallback path)
    wavs = [
        (rng_np.standard_normal(T) * 0.1).astype(np.float32)
        for T in (16000, 9973)
    ]

    plain = SoundStreamCompressor(model, variables, target_bw=4)
    sp = SoundStreamCompressor(
        model, variables, target_bw=4, mesh=make_mesh(), shard_axis="time"
    )
    for wav in wavs:
        assert sp.compress(wav) == plain.compress(wav)
    blob = plain.compress(wavs[0])
    a, sra = plain.decompress(blob)
    b, srb = sp.decompress(blob)
    assert sra == srb
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)

    with pytest.raises(ValueError, match="shard_axis"):
        SoundStreamCompressor(model, variables, mesh=make_mesh(), shard_axis="x")
