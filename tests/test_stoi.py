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


def _fake_pystoi_module(value=0.5, extended_value=0.4):
    """Minimal stand-in for the external 'pystoi' package: the
    ``stoi(ref, deg, fs, extended=False)`` surface eval/metrics.py uses."""
    import types

    mod = types.ModuleType("pystoi")

    def fake_stoi(ref, deg, fs, extended=False):
        assert len(ref) == len(deg)
        return extended_value if extended else value

    mod.stoi = fake_stoi
    return mod


def test_strict_presence_branch_stoi_cross_check(monkeypatch):
    """The pystoi cross-check's PRESENCE branch (dead code in this image):
    under strict, the main ``stoi`` key must be the NATIVE score (the
    thing being validated) while the external score rides along under
    ``stoi_ext``/``estoi_ext`` — a disagreement is surfaced side by side,
    never hidden by the non-strict preference for pystoi (round-4
    verdict #6)."""
    import sys as _sys

    from academicodec_tpu.eval.metrics import evaluate_pair

    sr = 16000
    x = _speechlike(3 * sr, sr)
    native = float(stoi(x, x, sr))  # ~1.0 on identical signals
    monkeypatch.setitem(
        _sys.modules, "pystoi",
        _fake_pystoi_module(value=0.51, extended_value=0.41),
    )
    out = evaluate_pair(x, x, sr, external=False, estoi=True, strict=True)
    assert out["stoi"] == pytest.approx(native, abs=1e-9)
    assert out["stoi_ext"] == pytest.approx(0.51)
    assert out["estoi_ext"] == pytest.approx(0.41)
    assert abs(out["stoi"] - out["stoi_ext"]) > 0.4  # disagreement visible


def test_nonstrict_prefers_installed_pystoi(monkeypatch):
    """Non-strict ``stoi_score`` keeps its documented preference for the
    installed external package — which is exactly why strict mode must
    compute the main key natively (otherwise the cross-check would
    compare pystoi to itself)."""
    import sys as _sys

    from academicodec_tpu.eval.metrics import stoi_score

    sr = 16000
    x = _speechlike(2 * sr, sr)
    monkeypatch.setitem(_sys.modules, "pystoi", _fake_pystoi_module(value=0.33))
    assert stoi_score(x, x, sr) == pytest.approx(0.33)


def test_strict_presence_branch_stoi_agreement(monkeypatch):
    """Agreement case: an external implementation returning the native
    score passes strict cleanly with matching main and ``_ext`` keys."""
    import sys as _sys

    from academicodec_tpu.eval.metrics import evaluate_pair

    sr = 16000
    x = _speechlike(3 * sr, sr)
    native = float(stoi(x, x, sr))
    monkeypatch.setitem(
        _sys.modules, "pystoi", _fake_pystoi_module(value=native)
    )
    out = evaluate_pair(x, x, sr, external=False, strict=True)
    assert out["stoi"] == pytest.approx(native, abs=1e-9)
    assert out["stoi_ext"] == pytest.approx(native)
