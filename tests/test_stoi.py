"""Native STOI/ESTOI sanity + invariants (eval/stoi.py).

pystoi is absent in this image, so these pin the algorithm's published
properties instead of package-vs-package deltas: perfect reconstruction
scores ~1, scores fall monotonically with additive noise, scale
invariance, band-matrix structure, and the octave resampler's passband.
"""

from __future__ import annotations

import numpy as np
import pytest

from academicodec_tpu.eval.stoi import (
    FS,
    N_FRAME,
    remove_silent_frames,
    resample_oct,
    stoi,
    thirdoct,
)


def _speechlike(n: int, sr: int, seed: int = 0) -> np.ndarray:
    """Amplitude-modulated multi-tone + noise — broadband, non-silent."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t)
    sig = sum(np.sin(2 * np.pi * f * t + p) for f, p in
              [(220, 0.1), (510, 1.2), (1333, 2.0), (2731, 0.7), (4000, 1.9)])
    return (env * sig + 0.05 * rng.standard_normal(n)).astype(np.float64)


@pytest.mark.parametrize("sr", [10000, 16000, 24000])
def test_identity_scores_near_one(sr):
    x = _speechlike(3 * sr, sr)
    assert stoi(x, x, sr) > 0.999
    assert stoi(x, x, sr, extended=True) > 0.999


def test_monotonic_under_noise():
    sr = 16000
    x = _speechlike(3 * sr, sr)
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(x))
    scores = [stoi(x, x + lvl * noise, sr) for lvl in (0.05, 0.3, 1.0, 4.0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 0.85 and scores[-1] < 0.4


def test_scale_invariance():
    sr = 16000
    x = _speechlike(2 * sr, sr)
    y = x + 0.2 * np.sin(2 * np.pi * 777 * np.arange(len(x)) / sr)
    a = stoi(x, y, sr)
    b = stoi(x, 13.7 * y, sr)  # intermediate normalization absorbs gain
    assert abs(a - b) < 1e-3


def test_extended_tracks_classic():
    sr = 16000
    x = _speechlike(3 * sr, sr)
    rng = np.random.default_rng(2)
    y = x + 0.5 * rng.standard_normal(len(x))
    d = stoi(x, y, sr)
    e = stoi(x, y, sr, extended=True)
    assert 0.0 < e < d < 1.0  # ESTOI is the stricter measure under noise


def test_thirdoct_structure():
    obm, cf = thirdoct()
    assert obm.shape == (15, 257)
    # disjoint bands, each non-empty, centers at 150*2^(k/3)
    assert np.all(obm.sum(axis=0) <= 1.0)
    assert np.all(obm.sum(axis=1) >= 1)
    np.testing.assert_allclose(cf, 150.0 * 2.0 ** (np.arange(15) / 3.0))
    # last band stays under Nyquist of the 10 kHz operating rate
    edges = np.nonzero(obm[-1])[0]
    assert edges.max() * FS / 512 < FS / 2


def test_remove_silent_frames_drops_silence():
    sr = FS
    x = np.concatenate([_speechlike(sr, sr), np.zeros(sr), _speechlike(sr, sr, seed=3)])
    y = x + 0.01
    xs, ys = remove_silent_frames(x, y)
    assert len(xs) == len(ys)
    assert len(xs) < len(x) - sr // 2  # the silent middle second is gone
    # louder-than-threshold content is preserved in overlap-add (interior
    # Hann at 50% hop sums to 1)
    assert np.max(np.abs(xs)) > 0.5 * np.max(np.abs(x))


def test_silence_removal_keeps_alignment():
    """Degraded frames must be dropped by the CLEAN signal's mask."""
    sr = FS
    x = np.concatenate([np.zeros(sr), _speechlike(sr, sr)])
    y = np.concatenate([_speechlike(sr, sr, seed=9), np.zeros(sr)])  # noise in x's silence
    xs, _ = remove_silent_frames(x, y)
    assert len(xs) <= sr + N_FRAME  # only clean-active frames survive


def test_resample_oct_passband():
    sr = 24000
    t = np.arange(2 * sr) / sr
    x = np.sin(2 * np.pi * 1000 * t)
    y = resample_oct(x, FS, sr)
    assert abs(len(y) - 2 * FS) <= 1
    # interior amplitude preserved, frequency correct (count zero crossings)
    mid = y[FS // 2 : -FS // 2]
    assert 0.95 < np.max(np.abs(mid)) < 1.05
    crossings = np.sum(np.diff(np.signbit(mid)))
    assert abs(crossings - 2 * 1000 * len(mid) / FS) < 20


def test_short_signal_raises():
    with pytest.raises(ValueError):
        stoi(np.zeros(100), np.zeros(100), FS)


def test_metrics_integration():
    from academicodec_tpu.eval.metrics import evaluate_pair, stoi_score

    sr = 16000
    x = _speechlike(2 * sr, sr)
    y = x + 0.1 * np.random.default_rng(4).standard_normal(len(x))
    assert 0.5 < stoi_score(y, x, sr) <= 1.0
    out = evaluate_pair(y, x, sr, external=False)
    assert "stoi" in out and "si_snr" in out and "mel_l1" in out
