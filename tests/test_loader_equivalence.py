"""Python pipeline == native C++ loader, bit for bit.

Both pipelines draw every random decision (epoch shuffle, crop offset,
mixture gate/partner) from the same ``(seed, epoch, item)``-keyed
mt19937_64 streams (data/mt64.py == native/wavloader.cpp:174-214), so for
one seed/filelist/shard the produced batches must be IDENTICAL — one seed
reproduces one run regardless of thread count or backend. Also pins the
Python MT19937-64 against std::mt19937_64 golden values and the native
loader's noise-fallback counter (ADVICE r2: silent substitution).
"""

from __future__ import annotations

import numpy as np
import pytest

from academicodec_tpu.data.dataset import WavCropDataset, batch_iterator
from academicodec_tpu.data.mt64 import MT19937_64, epoch_order, item_rng
from academicodec_tpu.data.native_loader import (
    NativeWavLoader,
    native_batch_iterator,
    native_loader_available,
)
from academicodec_tpu.data.wavio import write_wav


def test_mt64_matches_std_mt19937_64():
    """Golden values from a g++ std::mt19937_64 run (this repo's toolchain).

    seed 5489 (the std default): draw #1 and draw #10000;
    seed 0x123456789abcdef: first three draws.
    """
    r = MT19937_64(5489)
    assert r.next() == 14514284786278117030
    for _ in range(9998):
        r.next()
    assert r.next() == 9981545732273789042
    r2 = MT19937_64(0x123456789ABCDEF)
    assert [r2.next() for _ in range(3)] == [
        13169394222641354532,
        341231063478520994,
        9087906688904613890,
    ]


def test_item_rng_schedule_independent():
    """sample(i, epoch, item) is a pure function — same draws whatever
    order items are computed in."""
    a = [item_rng(42, 3, i).next() for i in range(8)]
    b = [item_rng(42, 3, i).next() for i in reversed(range(8))]
    assert a == list(reversed(b))
    # distinct epochs / items give distinct streams
    assert item_rng(42, 0, 1).next() != item_rng(42, 1, 1).next()
    assert item_rng(42, 0, 1).next() != item_rng(42, 0, 2).next()


def test_epoch_order_is_permutation():
    o0 = epoch_order(13, 7, 0)
    o1 = epoch_order(13, 7, 1)
    assert sorted(o0.tolist()) == list(range(13))
    assert sorted(o1.tolist()) == list(range(13))
    assert o0.tolist() != o1.tolist()


@pytest.fixture()
def corpus(tmp_path):
    """Clean mono PCM16 corpus with long (cropped) and short (zero-padded)
    files — lengths chosen so both code paths are exercised."""
    rng = np.random.default_rng(0)
    lengths = [700, 150, 1200, 200, 901, 350, 644]
    for i, t in enumerate(lengths):
        w = (rng.standard_normal(t) * 0.1 + 0.02 * (i + 1)).astype(np.float32)
        write_wav(str(tmp_path / f"c{i}.wav"), w * 0.5, 16000)
    return str(tmp_path)


needs_native = pytest.mark.skipif(
    not native_loader_available(), reason="no native toolchain"
)


@needs_native
@pytest.mark.parametrize("mixture_prob", [0.0, 0.5])
def test_python_and_native_batches_bit_identical(corpus, mixture_prob):
    seed, seg, bs = 11, 256, 2
    ds = WavCropDataset(
        corpus, segment_length=seg, sample_rate=16000,
        mixture_prob=mixture_prob, seed=seed,
    )
    py = list(
        batch_iterator(ds, bs, seed=seed, epochs=2, num_workers=3)
    )
    nat = list(
        native_batch_iterator(
            ds.files, seg, bs, sample_rate=16000, mixture_prob=mixture_prob,
            seed=seed, num_workers=4, epochs=2,
        )
    )
    assert len(py) == len(nat) and len(py) == 2 * (len(ds.files) // bs)
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)


@needs_native
def test_python_and_native_sharded_bit_identical(corpus):
    seed, seg, bs = 5, 300, 2
    ds = WavCropDataset(corpus, segment_length=seg, sample_rate=16000, seed=seed)
    for rank in range(2):
        py = list(
            batch_iterator(
                ds, bs, seed=seed, epochs=1, num_workers=2,
                process_index=rank, process_count=2,
            )
        )
        nat = list(
            native_batch_iterator(
                ds.files, seg, bs, sample_rate=16000, seed=seed,
                num_workers=2, epochs=1, process_index=rank, process_count=2,
            )
        )
        assert py and len(py) == len(nat)
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(a, b)


@needs_native
def test_start_epoch_resumes_the_stream(corpus):
    """Epoch K of a fresh run == a start_epoch=K resumed iterator, on both
    backends (the resume-data-order contract, VERDICT r2 #8)."""
    seed, seg, bs = 21, 256, 2
    ds = WavCropDataset(corpus, segment_length=seg, sample_rate=16000, seed=seed)
    bpe = len(ds.files) // bs
    full = list(batch_iterator(ds, bs, seed=seed, epochs=3, num_workers=2))
    epoch2 = full[2 * bpe :]
    resumed_py = list(
        batch_iterator(ds, bs, seed=seed, epochs=1, start_epoch=2, num_workers=2)
    )
    resumed_nat = list(
        native_batch_iterator(
            ds.files, seg, bs, sample_rate=16000, seed=seed, epochs=1,
            start_epoch=2,
        )
    )
    assert len(epoch2) == len(resumed_py) == len(resumed_nat) == bpe
    for a, b, c in zip(epoch2, resumed_py, resumed_nat):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)


def test_python_batches_thread_count_invariant(corpus):
    """One seed reproduces one run regardless of worker threads."""
    ds = WavCropDataset(
        corpus, segment_length=256, sample_rate=16000, mixture_prob=0.5, seed=3
    )
    a = list(batch_iterator(ds, 2, seed=3, epochs=1, num_workers=1))
    b = list(batch_iterator(ds, 2, seed=3, epochs=1, num_workers=5))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@needs_native
def test_native_fallback_counter_and_warning(tmp_path):
    """Corrupt files increment .fallbacks and warn once (ADVICE r2: a
    partially bad corpus must not silently train on noise)."""
    write_wav(str(tmp_path / "ok.wav"), np.full(400, 0.25, np.float32), 16000)
    (tmp_path / "bad.wav").write_bytes(b"not a riff")
    loader = NativeWavLoader(
        [str(tmp_path / "ok.wav"), str(tmp_path / "bad.wav")], 400, 2, seed=0
    )
    with pytest.warns(UserWarning, match="substituted noise"):
        loader.next()
    assert loader.fallbacks >= 1
    loader.close()


@needs_native
def test_native_fallbacks_zero_on_clean_corpus(corpus):
    ds = WavCropDataset(corpus, segment_length=256, sample_rate=16000)
    loader = NativeWavLoader(ds.files, 256, 2, seed=1)
    loader.next()
    assert loader.fallbacks == 0
    loader.close()
