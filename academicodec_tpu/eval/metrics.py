"""Objective reconstruction metrics.

All native (no external deps): SI-SNR, multi-scale mel distance, STOI/ESTOI
(``eval/stoi.py``, pystoi-equivalent numerics — the reference's
compute_stoi.py:12-27 tooling), and PESQ nb+wb (``eval/pesq.py``, ITU-T
P.862/P.862.2 — reference compute_pesq.py:11-32, same resample-to-16k
convention). When the external ``pesq``/``pystoi`` packages are installed
they are reported alongside as a cross-check (``*_ext`` keys).
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np


def si_snr(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant SNR in dB over 1-D signals (higher is better)."""
    n = min(est.shape[-1], ref.shape[-1])
    est, ref = est[..., :n], ref[..., :n]
    est = est - est.mean(axis=-1, keepdims=True)
    ref = ref - ref.mean(axis=-1, keepdims=True)
    proj = (np.sum(est * ref, axis=-1, keepdims=True) * ref) / (
        np.sum(ref**2, axis=-1, keepdims=True) + eps
    )
    noise = est - proj
    ratio = (np.sum(proj**2, axis=-1) + eps) / (np.sum(noise**2, axis=-1) + eps)
    return float(np.mean(10.0 * np.log10(ratio)))


def mel_distance(
    est: np.ndarray, ref: np.ndarray, sr: int, n_mels: int = 64
) -> float:
    """Mean L1 distance between log-mels at scales 2^6..2^11 (the shape of
    the training reconstruction loss, usable as a cheap eval proxy)."""
    import jax.numpy as jnp

    from academicodec_tpu.ops.stft import mel_spectrogram_torchaudio

    n = min(est.shape[-1], ref.shape[-1])
    e = jnp.asarray(est[..., :n]).reshape(1, -1)
    r = jnp.asarray(ref[..., :n]).reshape(1, -1)
    total = 0.0
    scales = [2**i for i in range(6, 12)]
    for s in scales:
        me = mel_spectrogram_torchaudio(e, sr, max(s, 512), s // 4, s, n_mels=n_mels)
        mr = mel_spectrogram_torchaudio(r, sr, max(s, 512), s // 4, s, n_mels=n_mels)
        total += float(np.mean(np.abs(np.log(np.asarray(me) + 1e-7) - np.log(np.asarray(mr) + 1e-7))))
    return total / len(scales)


def pesq_score(
    deg: np.ndarray, ref: np.ndarray, sr: int, strict: bool = False
) -> Dict[str, float]:
    """Narrow+wide-band PESQ at 16 kHz (resampled), reference convention
    (compute_pesq.py:11-32). Computed by the native P.862 implementation
    (``eval/pesq.py``); if the external ``pesq`` package happens to be
    installed its scores ride along under ``*_ext`` as a cross-check.
    ``strict=True`` makes the cross-check MANDATORY: a missing package or
    a failing cross-check computation raises instead of silently reporting
    native-only scores (cli/evaluate.py --strict)."""
    from scipy.signal import resample_poly

    from academicodec_tpu.eval.pesq import pesq as native_pesq

    if sr != 16000:
        g = math.gcd(16000, sr)
        deg = resample_poly(deg, 16000 // g, sr // g)
        ref = resample_poly(ref, 16000 // g, sr // g)
    n = min(len(deg), len(ref))
    out = {
        "pesq_nb": float(native_pesq(16000, ref[:n], deg[:n], "nb")),
        "pesq_wb": float(native_pesq(16000, ref[:n], deg[:n], "wb")),
    }
    try:  # pragma: no cover - absent in this image
        from pesq import pesq as ext_pesq
    except ImportError:
        if strict:
            raise RuntimeError(
                "strict cross-check requested but the external 'pesq' "
                "package (ITU P.862 wrapper) is not installed — native "
                "scores cannot be validated in this environment"
            )
        return out
    try:  # pragma: no cover - absent in this image
        out["pesq_nb_ext"] = float(ext_pesq(16000, ref[:n], deg[:n], "nb"))
        out["pesq_wb_ext"] = float(ext_pesq(16000, ref[:n], deg[:n], "wb"))
    except Exception:
        # the package's runtime errors (NoUtterancesError etc., not
        # ValueError) must not abort an evaluation whose native scores
        # above already succeeded — the cross-check is best-effort unless
        # strict
        if strict:
            raise
        out["pesq_nb_ext"] = float("nan")
        out["pesq_wb_ext"] = float("nan")
    return out


def stoi_score(deg: np.ndarray, ref: np.ndarray, sr: int, extended: bool = False) -> float:
    """STOI via pystoi when installed, else the native implementation
    (``eval/stoi.py``, numerically equivalent)."""
    n = min(len(deg), len(ref))
    try:
        from pystoi import stoi  # pragma: no cover - absent in this image
    except ImportError:
        from academicodec_tpu.eval.stoi import stoi
    return float(stoi(ref[:n], deg[:n], sr, extended=extended))


def evaluate_pair(
    deg: np.ndarray, ref: np.ndarray, sr: int, external: bool = True,
    estoi: bool = False, strict: bool = False,
) -> Dict[str, float]:
    """All metrics for one (degraded, reference) pair. ``external=True``
    includes PESQ (native; ~1 s/clip of host compute — the flag name is
    historical, from when it gated the external package). ``strict=True``
    requires the external cross-checks to actually run for BOTH PESQ
    (see :func:`pesq_score`) and STOI (pystoi, reported under
    ``stoi_ext``/``estoi_ext``), and refuses to NaN-skip failures."""
    out = {"si_snr": si_snr(deg, ref), "mel_l1": mel_distance(deg, ref, sr)}
    if strict:
        try:  # pragma: no cover - absent in this image
            from pystoi import stoi as ext_stoi
        except ImportError:
            raise RuntimeError(
                "strict cross-check requested but the external 'pystoi' "
                "package is not installed — native STOI cannot be "
                "validated in this environment"
            )
    n = min(len(deg), len(ref))
    try:
        if estoi:
            # one shared front-end pass for both measures
            from academicodec_tpu.eval.stoi import stoi_and_estoi

            out["stoi"], out["estoi"] = stoi_and_estoi(ref[:n], deg[:n], sr)
        elif strict:
            # under strict the main key must be the NATIVE score (the
            # thing being validated); stoi_score would prefer pystoi when
            # installed and the cross-check below would compare pystoi to
            # itself
            from academicodec_tpu.eval.stoi import stoi as native_stoi

            out["stoi"] = float(native_stoi(ref[:n], deg[:n], sr))
        else:
            out["stoi"] = stoi_score(deg, ref, sr)
        if strict:  # pragma: no cover - pystoi absent in this image
            out["stoi_ext"] = float(ext_stoi(ref[:n], deg[:n], sr))
            if estoi:
                out["estoi_ext"] = float(
                    ext_stoi(ref[:n], deg[:n], sr, extended=True)
                )
    except ValueError:
        # too short / all-silent for the 384 ms STOI segments: record the
        # skip as NaN so aggregate reports disclose the excluded rows
        # instead of averaging over a silently smaller subset — unless
        # strict, where a silent skip defeats the cross-check contract
        if strict:
            raise
        out["stoi"] = float("nan")
        if estoi:
            out["estoi"] = float("nan")
    if external:
        try:
            out.update(pesq_score(deg, ref, sr, strict=strict))
        except ValueError:
            if strict:
                raise
            out["pesq_nb"] = float("nan")  # too short for PESQ: disclose
            out["pesq_wb"] = float("nan")
    return out
