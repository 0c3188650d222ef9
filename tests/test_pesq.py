"""Native PESQ (eval/pesq.py, ITU-T P.862 nb / P.862.2 wb).

Pins the anchors that hold by construction of the standard (identical
input -> raw 4.5 -> MOS-LQO 4.549 nb / 4.644 wb via the published P.862.1
and P.862.2 mappings), the behavioral contract of the full pipeline
(level invariance, delay invariance through the time aligner, strict
monotonicity in SNR, additive noise punished more than equal-power signal
removal — the asymmetry factor), and the API guards. Exact numerical
parity with the ITU implementation is cross-checked via the optional
``pesq`` package when installed (see eval/metrics.pesq_score); this image
does not have it (zero egress), so these tests pin everything that can be
pinned without it.
"""

from __future__ import annotations

import numpy as np
import pytest

from academicodec_tpu.eval.pesq import pesq, pesq_raw, time_align


def _speech_like(fs: int, seconds: float = 3.0, seed: int = 0,
                 pad: float = 0.25) -> np.ndarray:
    """Syllabically modulated harmonic signal + noise floor, with leading/
    trailing silence (the P.862 test-file convention)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    env = (np.sin(2 * np.pi * 2.5 * t) ** 2) * (np.sin(2 * np.pi * 0.3 * t) ** 2)
    x = env * (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.sin(2 * np.pi * 880 * t)
    )
    x = x + 0.005 * rng.standard_normal(len(t))
    z = np.zeros(int(fs * pad))
    return np.concatenate([z, x, z])


def _add_noise(x: np.ndarray, snr_db: float, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(x))
    n *= np.sqrt((x**2).mean() / (n**2).mean()) * 10 ** (-snr_db / 20)
    return x + n


@pytest.fixture(scope="module")
def speech16():
    return _speech_like(16000)


def test_identical_anchor_values(speech16):
    """Zero disturbance -> raw 4.5; the published output mappings give
    4.549 (P.862.1 nb) and 4.644 (P.862.2 wb) — the same values the ITU
    implementation returns for identical inputs."""
    assert pesq_raw(16000, speech16, speech16, "nb") == pytest.approx(4.5)
    assert pesq(16000, speech16, speech16, "nb") == pytest.approx(4.549, abs=1e-3)
    assert pesq(16000, speech16, speech16, "wb") == pytest.approx(4.644, abs=1e-3)


def test_identical_anchor_8k():
    x = _speech_like(8000)
    assert pesq(8000, x, x, "nb") == pytest.approx(4.549, abs=1e-3)


@pytest.mark.parametrize("mode", ["nb", "wb"])
def test_monotone_in_snr(speech16, mode):
    scores = [pesq(16000, speech16, _add_noise(speech16, s), mode)
              for s in (40, 30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    # 40 dB SNR broadband noise still fills the fixture's silences —
    # P.862's asymmetry factor punishes added content in silence, so the
    # score sits well below the identical-input anchor but stays high
    assert scores[0] > 3.5
    assert scores[-1] < 2.5  # 0 dB SNR is bad


def test_level_invariance(speech16):
    """Level alignment: a 20 dB gain on the degraded signal is compensated."""
    base = pesq(16000, speech16, _add_noise(speech16, 25), "wb")
    scaled = pesq(16000, speech16, _add_noise(speech16, 25) * 10.0, "wb")
    assert scaled == pytest.approx(base, abs=0.05)


@pytest.mark.parametrize("shift_ms", [10, 50, -50])
def test_delay_invariance(speech16, shift_ms):
    """The time aligner absorbs constant delay (within the 300 ms search
    range): a shifted copy scores like the unshifted one. Leading/trailing
    silence in the fixture keeps content from falling off the ends."""
    fs = 16000
    shift = int(abs(shift_ms) * fs / 1000)
    if shift_ms >= 0:
        d = np.concatenate([np.zeros(shift), speech16])[: len(speech16)]
    else:
        d = np.concatenate([speech16[shift:], np.zeros(shift)])
    assert pesq(fs, speech16, d, "nb") > 4.4


def test_time_align_recovers_constant_delay(speech16):
    fs = 16000
    for true_delay in (0, 160, 800, -800):
        if true_delay >= 0:
            d = np.concatenate([np.zeros(true_delay), speech16])[: len(speech16)]
        else:
            d = np.concatenate([speech16[-true_delay:], np.zeros(-true_delay)])
        utts = time_align(speech16, d, fs)
        assert utts, "no utterances found"
        for (_s, _e, delay) in utts:
            assert abs(delay - true_delay) <= 64, (true_delay, utts)


def test_asymmetry_additive_worse_than_subtractive(speech16):
    """The P.862 asymmetry factor: ADDING spectral content (coding noise)
    is punished harder than REMOVING it (e.g. band-limiting)."""
    fs = 16000
    # subtractive: low-pass at 2 kHz (removes the 880*? harmonics + hiss)
    from scipy.signal import butter, sosfiltfilt

    sos = butter(6, 2000.0, btype="lowpass", fs=fs, output="sos")
    removed = sosfiltfilt(sos, speech16)
    added = _add_noise(speech16, 15)
    s_removed = pesq(fs, speech16, removed, "nb")
    s_added = pesq(fs, speech16, added, "nb")
    assert s_removed > s_added, (s_removed, s_added)


def test_quantization_degradation_ladder(speech16):
    """Coarser waveform quantization -> strictly lower PESQ."""
    fs = 16000

    def quant(x, bits):
        q = 2.0 ** (bits - 1)
        return np.round(np.clip(x, -1, 1) * q) / q

    scores = [pesq(fs, speech16, quant(speech16, b), "wb") for b in (12, 8, 5)]
    assert scores[0] > scores[1] > scores[2], scores
    assert scores[0] > 4.0 and scores[2] < 4.0


def test_api_guards(speech16):
    with pytest.raises(ValueError, match="fs"):
        pesq(44100, speech16, speech16)
    with pytest.raises(ValueError, match="mode"):
        pesq(16000, speech16, speech16, "superwide")
    with pytest.raises(ValueError, match="wideband"):
        pesq(8000, speech16, speech16, "wb")
    with pytest.raises(ValueError, match="short"):
        pesq(16000, speech16[:1000], speech16[:1000])


def test_metrics_pesq_score_resamples(speech16):
    """pesq_score resamples to 16 kHz (reference compute_pesq.py:17-20
    convention) and reports both bands."""
    from scipy.signal import resample_poly

    from academicodec_tpu.eval.metrics import pesq_score

    x24 = resample_poly(speech16, 3, 2)  # pretend a 24 kHz corpus
    out = pesq_score(x24, x24, 24000)
    assert out["pesq_nb"] == pytest.approx(4.549, abs=2e-3)
    assert out["pesq_wb"] == pytest.approx(4.644, abs=2e-3)


def test_evaluate_pair_includes_pesq(speech16):
    from academicodec_tpu.eval.metrics import evaluate_pair

    out = evaluate_pair(_add_noise(speech16, 30), speech16, 16000)
    assert {"si_snr", "mel_l1", "stoi", "pesq_nb", "pesq_wb"} <= set(out)
    assert 1.0 <= out["pesq_nb"] <= 4.6


def test_time_varying_delay_utterance_splitting():
    """P.862 utterance splitting: a delay CHANGE mid-stream must be
    resolved into two independently-aligned segments (``_align_split``) —
    a single-delay alignment would mis-place half the frames and tank the
    score. On this synthetic periodic carrier the ABSOLUTE delay may lock
    to a pitch-period alias (37 x 68.08 samples), so the pinned contract
    is the split structure and the inter-segment delay DIFFERENCE."""
    fs = 16000
    rng = np.random.default_rng(3)
    t = np.arange(int(fs * 4.0)) / fs
    env = 0.55 + 0.45 * (np.sin(2 * np.pi * 3.1 * t) ** 2) * (
        0.6 + 0.4 * np.sin(2 * np.pi * 0.43 * t)
    )
    x = env * (
        0.3 * np.sin(2 * np.pi * 235 * t) + 0.2 * np.sin(2 * np.pi * 470 * t)
    ) + 0.004 * rng.standard_normal(len(t))
    half = len(x) // 2
    shifted = np.concatenate([np.zeros(400), x])[: len(x)]
    deg = np.concatenate([x[:half], shifted[half:]])  # delay 0 -> 400 at t=2 s

    utts = time_align(x, deg, fs)
    assert len(utts) == 2, utts
    (s1, e1, d1), (s2, e2, d2) = utts
    assert s1 == 0 and e2 == len(x) and e1 == s2
    assert abs(e1 - half) <= int(0.35 * fs), utts  # split near the change
    assert abs((d2 - d1) - 400) <= 64, utts  # the delta is the real change
    # the recovered alignment keeps the score in the mild-degradation range
    # (mis-aligning either half drops it well below 3)
    assert pesq(fs, x, deg, "nb") > 3.2

    # constant-delay input does NOT split (sample-jitter guard)
    utts_const = time_align(x, shifted, fs)
    assert len(utts_const) == 1 and abs(utts_const[0][2] - 400) <= 64, utts_const


def test_regression_fixture_matrix(speech16):
    """Full-precision regression anchors over a deterministic degradation
    matrix (additive noise at 30/20/10 dB SNR, 8-bit quantization, 2 kHz
    low-pass on the module's synthetic speech fixture).

    Provenance: values computed by THIS implementation (eval/pesq.py,
    round 4) at float64 — they are regression anchors pinning the whole
    pipeline (filtering, candidate-based alignment, perceptual model, MOS
    mappings) to 1e-3, NOT ITU-conformance values (the ITU reference
    implementation is unavailable offline; cli/evaluate.py --strict runs
    the external cross-check where the ``pesq`` package exists). Any
    future numerical drift — including a ±0.1 MOS bias — fails here."""
    from scipy.signal import butter, sosfiltfilt

    fs = 16000
    sos = butter(6, 2000.0, btype="lowpass", fs=fs, output="sos")
    anchors = {
        "snr30": (_add_noise(speech16, 30), 3.584238, 4.090782),
        "snr20": (_add_noise(speech16, 20), 2.997831, 3.772482),
        "snr10": (_add_noise(speech16, 10), 1.901425, 2.941434),
        "quant8": (np.round(np.clip(speech16, -1, 1) * 128) / 128,
                   4.513652, 4.625309),
        "lp2k": (sosfiltfilt(sos, speech16), 4.366110, 4.350155),
    }
    for name, (deg, nb, wb) in anchors.items():
        assert pesq(fs, speech16, deg, "nb") == pytest.approx(nb, abs=1e-3), name
        assert pesq(fs, speech16, deg, "wb") == pytest.approx(wb, abs=1e-3), name


def test_strict_mode_raises_without_external_package(speech16):
    """--strict contract: when the external ITU 'pesq' package is absent
    (this image), the cross-check must FAIL LOUDLY instead of silently
    passing native-only scores (the round-3 eval/metrics.py:78 silent-pass
    failure mode)."""
    from academicodec_tpu.eval.metrics import pesq_score

    try:
        import pesq as _ext  # noqa: F401
        pytest.skip("external pesq installed: strict mode would run it")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="pesq"):
        pesq_score(speech16, speech16, 16000, strict=True)
    # non-strict keeps the round-3 behavior: native scores, no _ext keys
    out = pesq_score(speech16, speech16, 16000)
    assert "pesq_nb" in out and "pesq_nb_ext" not in out


def test_strict_mode_covers_stoi_too(speech16):
    """--strict must be strict about STOI as well as PESQ: a missing
    pystoi raises (round-4 review finding — the STOI leg previously ran
    native-only under strict with no error), and the raise happens before
    any NaN-skip swallowing."""
    from academicodec_tpu.eval.metrics import evaluate_pair

    try:
        import pystoi as _ext  # noqa: F401
        pytest.skip("pystoi installed: strict mode would run it")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="pystoi"):
        evaluate_pair(speech16, speech16, 16000, external=False, strict=True)
    # non-strict unchanged: native STOI, no _ext keys
    out = evaluate_pair(speech16, speech16, 16000, external=False)
    assert "stoi" in out and "stoi_ext" not in out


def _fake_pesq_module(nb=None, wb=None, raise_exc=None):
    """Minimal stand-in for the external ITU 'pesq' package: exposes the
    same ``pesq(fs, ref, deg, mode)`` surface eval/metrics.py imports."""
    import types

    mod = types.ModuleType("pesq")

    def fake_pesq(fs, ref, deg, mode="wb"):
        if raise_exc is not None:
            raise raise_exc
        assert fs == 16000 and len(ref) == len(deg)
        return {"nb": nb, "wb": wb}[mode]

    mod.pesq = fake_pesq
    return mod


def test_strict_presence_branch_agreement_passes(speech16, monkeypatch):
    """The cross-check's PRESENCE branch (dead code in this image — no
    'pesq' package): with an agreeing external implementation injected,
    strict mode returns native scores under the main keys and the external
    scores under ``*_ext``, and nothing raises (round-4 verdict #6 — the
    day an ITU package IS available, the comparison path must be
    known-functional)."""
    import sys as _sys

    from academicodec_tpu.eval.metrics import pesq_score

    native = pesq_score(speech16, speech16, 16000)  # package absent: no _ext
    assert "pesq_wb_ext" not in native
    monkeypatch.setitem(
        _sys.modules, "pesq",
        _fake_pesq_module(nb=native["pesq_nb"], wb=native["pesq_wb"]),
    )
    out = pesq_score(speech16, speech16, 16000, strict=True)
    assert out["pesq_nb"] == native["pesq_nb"]  # main keys stay native
    assert out["pesq_wb"] == native["pesq_wb"]
    assert out["pesq_nb_ext"] == pytest.approx(native["pesq_nb"])
    assert out["pesq_wb_ext"] == pytest.approx(native["pesq_wb"])


def test_strict_presence_branch_disagreement_is_surfaced(speech16, monkeypatch):
    """A DISAGREEING external implementation must be visible side by side:
    the ``*_ext`` keys carry the external values verbatim (they are not
    averaged into, or overwritten by, the native scores), so any
    systematic bias shows up in every report that includes them."""
    import sys as _sys

    from academicodec_tpu.eval.metrics import pesq_score

    monkeypatch.setitem(
        _sys.modules, "pesq", _fake_pesq_module(nb=1.21, wb=1.07)
    )
    out = pesq_score(speech16, speech16, 16000, strict=True)
    # identical signals: native sits near the top of the scale...
    assert out["pesq_nb"] > 4.0 and out["pesq_wb"] > 4.0
    # ...while the injected external scores ride along untouched
    assert out["pesq_nb_ext"] == pytest.approx(1.21)
    assert out["pesq_wb_ext"] == pytest.approx(1.07)
    assert abs(out["pesq_wb"] - out["pesq_wb_ext"]) > 3.0


def test_strict_presence_branch_runtime_failure(speech16, monkeypatch):
    """An external package that is INSTALLED but fails at runtime
    (pesq raises NoUtterancesError etc.): strict propagates the failure;
    non-strict discloses it as NaN ``*_ext`` keys without aborting the
    native scores (eval/metrics.py pesq_score exception branch)."""
    import math as _math
    import sys as _sys

    from academicodec_tpu.eval.metrics import pesq_score

    class Boom(Exception):
        pass

    monkeypatch.setitem(
        _sys.modules, "pesq", _fake_pesq_module(raise_exc=Boom("no utterances"))
    )
    with pytest.raises(Boom):
        pesq_score(speech16, speech16, 16000, strict=True)
    out = pesq_score(speech16, speech16, 16000)
    assert out["pesq_nb"] > 4.0  # native leg unaffected
    assert _math.isnan(out["pesq_nb_ext"]) and _math.isnan(out["pesq_wb_ext"])
