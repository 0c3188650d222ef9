"""WAV IO + dataset pipeline tests (self-contained, synthetic wavs)."""

import os

import numpy as np
import pytest

from academicodec_tpu.data.wavio import read_wav, write_wav
from academicodec_tpu.data.dataset import (
    WavCropDataset,
    batch_iterator,
    list_audio_files,
    shard_indices,
)


@pytest.fixture()
def wav_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(6):
        t = rng.integers(8000, 40000)
        wav = (rng.standard_normal(int(t)) * 0.2).astype(np.float32)
        write_wav(str(tmp_path / f"clip{i}.wav"), wav, 24000)
    return str(tmp_path)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    wav = np.clip(rng.standard_normal(24000) * 0.3, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, 24000)
    back, sr = read_wav(path)
    assert sr == 24000
    np.testing.assert_allclose(back, wav, atol=1.0 / 16000, rtol=0)


def test_wav_resample(tmp_path):
    wav = np.sin(2 * np.pi * 440 * np.arange(24000) / 24000).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    write_wav(path, wav, 24000)
    back, sr = read_wav(path, sr=16000)
    assert sr == 16000
    assert abs(back.shape[0] - 16000) <= 2


def test_list_audio_files_dir_and_filelist(wav_dir, tmp_path):
    files = list_audio_files(wav_dir)
    assert len(files) == 6
    lst = str(tmp_path / "files.lst")
    with open(lst, "w") as fh:
        fh.write("\n".join(files[:4]))
    assert len(list_audio_files(lst)) == 4


def test_crop_dataset_and_batches(wav_dir):
    ds = WavCropDataset(wav_dir, segment_length=16000, sample_rate=24000)
    x = ds.sample(0)
    assert x.shape == (16000,) and x.dtype == np.float32
    batches = list(batch_iterator(ds, batch_size=2, epochs=1, num_workers=2))
    assert len(batches) == 3
    assert all(b.shape == (2, 16000) for b in batches)


def test_mixture_augmentation(wav_dir):
    ds = WavCropDataset(
        wav_dir, segment_length=8000, sample_rate=24000, mixture_prob=1.0, seed=3
    )
    x = ds.sample(0)
    assert np.isfinite(x).all()


@pytest.mark.parametrize("n,pcount", [(17, 2), (16, 4), (5, 3)])
def test_shard_indices_disjoint_cover(n, pcount):
    """Rank partitioning must be disjoint and jointly cover the epoch
    (reference DistributedSampler, main_launch.py:220-227)."""
    rng = np.random.default_rng(0)
    idx = rng.permutation(n)
    shards = [shard_indices(idx, p, pcount) for p in range(pcount)]
    # equal per-rank counts (pad-by-wrap like DistributedSampler)
    assert len({len(s) for s in shards}) == 1
    union = np.concatenate(shards)
    # jointly cover every sample of the epoch
    assert set(union.tolist()) == set(range(n))
    # disjoint up to the <process_count wrap pad
    pad = (-n) % pcount
    assert len(union) == n + pad
    from collections import Counter

    counts = Counter(union.tolist())
    assert sum(c - 1 for c in counts.values()) == pad


def test_shard_indices_identity_and_validation():
    idx = np.arange(7)
    np.testing.assert_array_equal(shard_indices(idx, 0, 1), idx)
    with pytest.raises(ValueError):
        shard_indices(idx, 2, 2)


def test_batch_iterator_rank_aware(wav_dir):
    """Two simulated processes with the same seed draw disjoint files."""
    ds = WavCropDataset(wav_dir, segment_length=4000, sample_rate=24000)
    seen = []
    for p in range(2):
        # record which dataset indices each process samples
        sampled = []
        orig = ds.sample

        def spy(i, _s=sampled, **kw):
            _s.append(i)
            return orig(i, **kw)

        ds.sample = spy
        list(
            batch_iterator(
                ds, batch_size=1, seed=7, epochs=1, num_workers=1,
                process_index=p, process_count=2,
            )
        )
        ds.sample = orig
        seen.append(set(sampled))
    assert seen[0] and seen[1]
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(len(ds)))


def test_crop_can_start_at_final_offset():
    """The crop RNG must be able to return the last valid start offset."""
    from academicodec_tpu.data.mt64 import item_rng

    ds = WavCropDataset.__new__(WavCropDataset)
    ds.segment_length = 10
    ds.sample_rate = None
    ds.seed = 0
    wav = np.arange(15, dtype=np.float32)

    import academicodec_tpu.data.dataset as dmod

    orig = dmod.read_wav
    dmod.read_wav = lambda path, sr=None: (wav, 24000)
    try:
        starts = {
            int(ds._load_crop("x", item_rng(0, 0, i))[0]) for i in range(200)
        }
    finally:
        dmod.read_wav = orig
    assert max(starts) == 5  # len - seg, the final valid offset


def test_mel_npy_dataset_aligned_crops(tmp_path):
    """Fine-tuning mode (reference meldataset.py:183-206): crops are
    mel-frame-aligned — wav[mel_start*hop] must equal the sample index."""
    from academicodec_tpu.data.dataset import MelNpyCropDataset

    sr, hop, seg = 24000, 100, 800
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    n_frames = 50
    wav = (np.arange(n_frames * hop, dtype=np.float32)) / (n_frames * hop)
    write_wav(str(tmp_path / "a.wav"), wav * 0.5, sr)
    # mel row 0 carries the frame index so alignment is checkable
    mel = np.tile(np.arange(n_frames, dtype=np.float32), (4, 1))
    np.save(str(mels_dir / "a.npy"), mel)

    ds = MelNpyCropDataset(
        str(tmp_path), seg, hop_size=hop, base_mels_path=str(mels_dir),
        sample_rate=sr, seed=0,
    )
    fps = -(-seg // hop)
    for _ in range(10):
        w, m = ds.sample(0)
        assert w.shape == (seg,) and m.shape == (4, fps)
        mel_start = int(m[0, 0])
        # the wav crop starts exactly at mel_start*hop (16-bit wav tolerance)
        expected = wav[mel_start * hop] * 0.5
        assert abs(w[0] - expected) < 1e-3, (mel_start, w[0], expected)
        # frames are consecutive
        np.testing.assert_array_equal(m[0], np.arange(mel_start, mel_start + fps))


def test_mel_npy_dataset_pads_short_files(tmp_path):
    from academicodec_tpu.data.dataset import MelNpyCropDataset

    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    write_wav(str(tmp_path / "s.wav"), np.ones(300, np.float32) * 0.1, 24000)
    np.save(str(mels_dir / "s.npy"), np.ones((4, 3), np.float32))
    ds = MelNpyCropDataset(
        str(tmp_path), 800, hop_size=100, base_mels_path=str(mels_dir),
        sample_rate=24000,
    )
    w, m = ds.sample(0)
    assert w.shape == (800,) and m.shape == (4, 8)
    assert (w[300:] == 0).all() and (m[:, 3:] == 0).all()


def test_batch_iterator_pairs(tmp_path):
    """Paired datasets batch as a tuple of stacked arrays."""
    from academicodec_tpu.data.dataset import MelNpyCropDataset

    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    for i in range(4):
        write_wav(str(tmp_path / f"c{i}.wav"),
                  np.ones(2000, np.float32) * 0.1, 24000)
        np.save(str(mels_dir / f"c{i}.npy"), np.ones((4, 20), np.float32))
    ds = MelNpyCropDataset(
        str(tmp_path), 800, hop_size=100, base_mels_path=str(mels_dir),
        sample_rate=24000,
    )
    batches = list(batch_iterator(ds, batch_size=2, epochs=1, num_workers=1))
    assert len(batches) == 2
    wavs, mels = batches[0]
    assert wavs.shape == (2, 800) and mels.shape == (2, 4, 8)


def test_read_wav_rejects_non_wav(tmp_path):
    p = tmp_path / "x.wav"
    p.write_bytes(b"definitely not a riff file")
    with pytest.raises(ValueError):
        read_wav(str(p))


def test_dataset_corrupt_file_fallback(tmp_path):
    (tmp_path / "bad.wav").write_bytes(b"garbage")
    ds = WavCropDataset(str(tmp_path), segment_length=4000)
    x = ds.sample(0)  # falls back to low-level noise, not an exception
    assert x.shape == (4000,)
    assert np.abs(x).max() < 0.5
