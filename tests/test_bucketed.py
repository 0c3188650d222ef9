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


def test_compress_batch_blobs_byte_identical(tiny_soundstream):
    """Batched corpus serving (compress_batch/decompress_batch): one device
    call per group must produce byte-identical ECDC blobs to sequential
    compress() calls — encode is batch-invariant at the token level — and
    decompress_batch must restore exact lengths with float-noise-only wav
    deltas (the batched decode's different XLA schedule)."""
    model, variables = tiny_soundstream
    comp = SoundStreamCompressor(
        model, variables, target_bw=4, bucket_seconds=0.5
    )
    rng = np.random.default_rng(21)
    # both in the same 1-bucket group (8000-sample pad) like the CLI groups
    lengths = [5000, 7000, 3000]
    wavs = [
        (rng.standard_normal(T) * 0.1).astype(np.float32) for T in lengths
    ]
    blobs_b = comp.compress_batch(wavs, pad_to_batch=4)
    blobs_s = [comp.compress(w) for w in wavs]
    for got, want in zip(blobs_b, blobs_s):
        assert got == want
    outs = comp.decompress_batch(blobs_b, pad_to_batch=4)
    for (out, sr), w in zip(outs, wavs):
        assert sr == SR and out.shape == w.shape
        ref, _ = comp.decompress(comp.compress(w))
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_compress_batch_mixed_lengths_need_bucketing(tiny_soundstream):
    model, variables = tiny_soundstream
    comp = SoundStreamCompressor(model, variables, target_bw=4)
    rng = np.random.default_rng(2)
    wavs = [(rng.standard_normal(T) * 0.1).astype(np.float32) for T in (3000, 5000)]
    with pytest.raises(ValueError, match="bucket_seconds"):
        comp.compress_batch(wavs)


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


@pytest.mark.slow
def test_extract_tokens_cli_batched_matches_sequential(tmp_path, monkeypatch):
    """extract_tokens --batch_files: the grouped/padded corpus path writes
    the same token tensors as sequential extraction (bit-exact; masked
    GroupNorm stats are per-item) and the same reconstructions."""
    import json
    import sys

    from academicodec_tpu.cli import extract_tokens as cli
    from academicodec_tpu.data.wavio import write_wav
    from academicodec_tpu.models.hificodec import VQVAE
    from academicodec_tpu.nn.hifigan import HiFiCodecConfig
    from academicodec_tpu.utils.checkpoint import save_checkpoint

    cfg_d = dict(
        upsample_rates=[5, 4, 2, 2], upsample_kernel_sizes=[11, 8, 4, 4],
        segment_size=4000, encoder_base_channels=8,
        upsample_initial_channel=128, n_codes=64,
    )
    cfg = HiFiCodecConfig.from_json(cfg_d)
    with open(tmp_path / "cfg.json", "w") as fh:
        json.dump(cfg_d, fh)
    model = VQVAE(config=cfg)
    rng = jax.random.PRNGKey(2)
    variables = model.init(rng, np.zeros((1, 4000), np.float32), training=False)
    save_checkpoint(
        str(tmp_path / "ckpt"), "g", 1,
        {"params": jax.device_get(variables["params"])},
    )
    import glob as _glob

    ckpt = _glob.glob(str(tmp_path / "ckpt" / "g_*"))[0]

    sr = 24000
    (tmp_path / "in").mkdir()
    rng_np = np.random.default_rng(1)
    for i, T in enumerate((3210, 4000, 2100, 9000, 1500)):
        write_wav(
            str(tmp_path / "in" / f"f{i}.wav"),
            (rng_np.standard_normal(T) * 0.1).astype(np.float32), sr,
        )

    base = [
        "extract_tokens", "--config", str(tmp_path / "cfg.json"),
        "--model_path", ckpt, "--input", str(tmp_path / "in"),
        "--sample_rate", str(sr), "--bucket_seconds", "0.2",
    ]
    monkeypatch.setattr(sys, "argv", base + [
        "--outputdir", str(tmp_path / "out_b"),
        "--tokens_out", str(tmp_path / "tok_b.npz"), "--batch_files", "2",
    ])
    cli.main()
    monkeypatch.setattr(sys, "argv", base + [
        "--outputdir", str(tmp_path / "out_s"),
        "--tokens_out", str(tmp_path / "tok_s.npz"),
    ])
    cli.main()

    # data-parallel serving (batch sharded over the 8-virtual-device mesh)
    # must extract the same bit-exact tokens
    monkeypatch.setattr(sys, "argv", base + [
        "--outputdir", str(tmp_path / "out_d"),
        "--tokens_out", str(tmp_path / "tok_d.npz"),
        "--batch_files", "8", "--data_parallel", "--no_synth",
    ])
    cli.main()

    # sequence-parallel serving (each file's TIME axis sharded over the
    # 8-virtual-device mesh) must also extract the same bit-exact tokens
    monkeypatch.setattr(sys, "argv", base + [
        "--outputdir", str(tmp_path / "out_t"),
        "--tokens_out", str(tmp_path / "tok_t.npz"),
        "--sequence_parallel", "--no_synth",
    ])
    cli.main()

    tb = np.load(tmp_path / "tok_b.npz")
    ts = np.load(tmp_path / "tok_s.npz")
    td = np.load(tmp_path / "tok_d.npz")
    tt = np.load(tmp_path / "tok_t.npz")
    assert (sorted(tb.files) == sorted(ts.files) == sorted(td.files)
            == sorted(tt.files))
    for k in ts.files:
        np.testing.assert_array_equal(tb[k], ts[k])
        np.testing.assert_array_equal(td[k], ts[k])
        np.testing.assert_array_equal(tt[k], ts[k])
    from academicodec_tpu.data.wavio import read_wav

    for i in range(5):
        a, _ = read_wav(str(tmp_path / "out_b" / f"f{i}.wav"))
        b, _ = read_wav(str(tmp_path / "out_s" / f"f{i}.wav"))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4)


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


def test_masked_groupnorm_bf16_stats_accumulate_f32():
    """Masked GroupNorm statistics must not degrade at bf16 activation
    dtype: the valid-element count (~1e4 for 10 s inputs, not bf16-
    representable) and the long masked sums accumulate in f32 regardless
    of x.dtype (nn/hifigan.py GroupNormTorch)."""
    import jax.numpy as jnp

    from academicodec_tpu.nn.hifigan import GroupNormTorch

    B, T, C, g = 2, 12000, 32, 8
    rng_np = np.random.default_rng(7)
    x = (rng_np.standard_normal((B, T, C)) * 0.5 + 0.3).astype(np.float32)
    lengths = np.array([11777, 9000], np.int32)
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    gn = GroupNormTorch(num_groups=g, channels=C)
    variables = gn.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(
        gn.apply(variables, x, mask=jnp.asarray(mask), count=jnp.asarray(lengths))
    )
    out = np.asarray(
        gn.apply(
            variables,
            jnp.asarray(x, jnp.bfloat16),
            mask=jnp.asarray(mask, jnp.bfloat16),
            count=jnp.asarray(lengths),
        ),
        np.float32,
    )
    err = np.abs(out - ref)[mask[..., 0] > 0]
    assert err.max() < 0.045, err.max()


def test_pipelined_groups_covers_all_items_once():
    """The shared serving pipeline (cli/compress.pipelined_groups) must
    complete every submitted group exactly once, keep groups key-
    homogeneous and <= group_size, and flush trailing partial groups."""
    from academicodec_tpu.cli.compress import pipelined_groups

    items = [(f"f{i}", "x" * (1 + i % 3)) for i in range(11)]
    submitted, completed = [], []

    def submit(group):
        tags = tuple(t for t, _ in group)
        keys = {len(w) for _, w in group}
        assert len(keys) == 1 and len(group) <= 4
        submitted.append(tags)
        return tags

    pipelined_groups(items, lambda w: len(w), 4, submit, completed.append)
    assert completed == submitted
    flat = [t for grp in completed for t in grp]
    assert sorted(flat) == sorted(t for t, _ in items)
