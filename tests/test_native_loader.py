"""Native C++ wav-crop loader (native/wavloader.cpp) correctness.

Pins: crop sample values bit-match the Python reader's float conversion,
per-epoch coverage (every file drawn exactly once per epoch), rank-sharded
disjointness matching ``shard_indices`` semantics, determinism per seed,
zero-pad of short files, corrupt-file noise fallback, and multi-channel /
multi-dtype decoding.
"""

from __future__ import annotations

import struct
import wave

import numpy as np
import pytest

from academicodec_tpu.data.native_loader import (
    NativeWavLoader,
    native_batch_iterator,
    native_loader_available,
)
from academicodec_tpu.data.wavio import read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native_loader_available(), reason="no native toolchain"
)


def _make_corpus(tmp_path, n_files=6, length=700, seed=0):
    rng = np.random.default_rng(seed)
    files = []
    for i in range(n_files):
        # embed the file id in the signal so batches are attributable
        w = (rng.standard_normal(length) * 0.1 + (i + 1)).astype(np.float32) * 0.05
        path = str(tmp_path / f"f{i}.wav")
        write_wav(path, w, 16000)
        files.append(path)
    return files


def _file_id(files, crop):
    """Recover which file a crop came from via its mean level."""
    means = []
    for f in files:
        w, _ = read_wav(f)
        means.append(w.mean())
    return int(np.argmin([abs(crop.mean() - m) for m in means]))


def test_crop_values_match_python_reader(tmp_path):
    files = _make_corpus(tmp_path, n_files=2, length=300)
    loader = NativeWavLoader(files, 300, 2, seed=1, num_workers=2)
    batch = loader.next()
    loader.close()
    # segment == file length: crops are the whole files, order = epoch perm
    pys = {i: read_wav(f)[0] for i, f in enumerate(files)}
    for row in batch:
        fid = _file_id(files, row)
        np.testing.assert_array_equal(row, pys[fid])


def test_epoch_coverage_and_determinism(tmp_path):
    files = _make_corpus(tmp_path, n_files=8, length=200)
    ids = []
    batches_a = list(
        native_batch_iterator(files, 200, 2, seed=7, num_workers=4, epochs=2)
    )
    for b in batches_a:
        for row in b:
            ids.append(_file_id(files, row))
    # each epoch covers all 8 files exactly once
    assert sorted(ids[:8]) == list(range(8))
    assert sorted(ids[8:]) == list(range(8))
    assert ids[:8] != ids[8:]  # reshuffled between epochs (overwhelmingly)

    batches_b = list(
        native_batch_iterator(files, 200, 2, seed=7, num_workers=1, epochs=2)
    )
    for a, b in zip(batches_a, batches_b):
        np.testing.assert_array_equal(a, b)  # same seed => same stream


def test_rank_sharding_disjoint(tmp_path):
    files = _make_corpus(tmp_path, n_files=8, length=200)
    seen = {}
    for rank in range(2):
        ids = []
        for b in native_batch_iterator(
            files, 200, 2, seed=3, epochs=1, process_index=rank, process_count=2
        ):
            ids.extend(_file_id(files, row) for row in b)
        assert len(ids) == 4
        seen[rank] = set(ids)
    assert seen[0] | seen[1] == set(range(8))
    assert not (seen[0] & seen[1])


def test_short_file_zero_pad_and_long_file_crop(tmp_path):
    w_short = (np.ones(50, np.float32)) * 0.25
    write_wav(str(tmp_path / "s.wav"), w_short, 16000)
    loader = NativeWavLoader([str(tmp_path / "s.wav")], 128, 1, seed=0)
    row = loader.next()[0]
    loader.close()
    np.testing.assert_allclose(row[:50], read_wav(str(tmp_path / "s.wav"))[0])
    assert np.all(row[50:] == 0.0)

    rng = np.random.default_rng(1)
    w_long = (rng.standard_normal(10_000) * 0.2).astype(np.float32)
    write_wav(str(tmp_path / "l.wav"), w_long, 16000)
    loader = NativeWavLoader([str(tmp_path / "l.wav")], 128, 1, seed=0)
    row = loader.next()[0]
    loader.close()
    full, _ = read_wav(str(tmp_path / "l.wav"))
    # the crop is a contiguous window of the file
    idx = np.where(np.isclose(full, row[0]))[0]
    assert any(np.allclose(full[i : i + 128], row) for i in idx if i + 128 <= len(full))


def test_corrupt_file_noise_fallback(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")
    loader = NativeWavLoader([str(bad)], 256, 1, seed=0)
    row = loader.next()[0]
    loader.close()
    assert row.std() > 0.01 and abs(row.mean()) < 0.05  # low-level noise


def test_stereo_and_pcm32(tmp_path):
    # stereo PCM16: mono mixdown must equal the Python reader's
    rng = np.random.default_rng(2)
    st = (rng.standard_normal((2, 400)) * 0.2).astype(np.float32)
    path = str(tmp_path / "st.wav")
    with wave.open(path, "wb") as fh:
        fh.setnchannels(2)
        fh.setsampwidth(2)
        fh.setframerate(16000)
        inter = np.clip(st.T.reshape(-1) * 32768, -32768, 32767).astype("<i2")
        fh.writeframes(inter.tobytes())
    loader = NativeWavLoader([path], 400, 1, seed=0)
    row = loader.next()[0]
    loader.close()
    ref, _ = read_wav(path)  # wavio mixes channels to mono
    np.testing.assert_allclose(row, ref, atol=1e-6)


def test_mixture_prob_changes_stream(tmp_path):
    files = _make_corpus(tmp_path, n_files=4, length=300, seed=5)
    a = NativeWavLoader(files, 300, 4, seed=9, mixture_prob=0.0)
    b = NativeWavLoader(files, 300, 4, seed=9, mixture_prob=1.0)
    xa, xb = a.next(), b.next()
    a.close(), b.close()
    assert not np.allclose(xa, xb)  # every item is a two-clip sum
    # mixture adds a second clip: levels roughly double on average
    assert xb.mean() > 1.5 * xa.mean()


def test_wrong_sample_rate_rejected_eagerly(tmp_path):
    files = _make_corpus(tmp_path, n_files=2, length=300)
    with pytest.raises(ValueError, match="does not resample"):
        NativeWavLoader(files, 300, 2, sample_rate=24000)  # corpus is 16 kHz


def test_mixed_rate_files_fall_back_to_noise(tmp_path):
    """A wrong-rate file mid-corpus degrades to the noise fallback (like a
    corrupt file) instead of silently training on mis-rated audio."""
    ok = str(tmp_path / "ok.wav")
    write_wav(ok, np.full(300, 0.5, np.float32), 16000)
    bad = str(tmp_path / "bad.wav")
    write_wav(bad, np.full(300, 0.5, np.float32), 48000)
    loader = NativeWavLoader([ok, bad], 300, 2, sample_rate=16000, seed=0)
    batch = loader.next()
    loader.close()
    kinds = sorted(round(float(r.mean()), 1) for r in batch)
    assert kinds[0] < 0.1 and kinds[1] == 0.5  # one noise row, one real row


def test_truncated_fmt_chunk_is_corrupt(tmp_path):
    """A 14-byte WAVEFORMAT fmt chunk must be treated as corrupt, not parsed
    from uninitialized memory."""
    p = tmp_path / "oldfmt.wav"
    fmt = struct.pack("<HHIIH", 1, 1, 16000, 32000, 2)  # 14 bytes, no bits field
    data = b"\x00\x00" * 64
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    p.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    loader = NativeWavLoader([str(p)], 128, 1, seed=0)
    row = loader.next()[0]
    loader.close()
    assert row.std() > 0.01  # noise fallback, not garbage-decoded zeros
