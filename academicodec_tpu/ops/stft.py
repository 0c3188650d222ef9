"""STFT / spectrogram / mel filterbanks, implemented natively for TPU.

Two front-end conventions are reproduced exactly (they differ and both
matter for loss parity):

  * ``mel_spectrogram_torchaudio``: center=True reflect padding, window
    zero-padded to ``n_fft``, power=2.0, HTK mel scale, no filterbank norm —
    the torchaudio ``MelSpectrogram`` defaults used by the Encodec/
    SoundStream reconstruction losses (reference models/encodec/loss.py:70).
  * ``mel_spectrogram_hifigan``: manual reflect pad of ``(n_fft-hop)/2``,
    center=False, magnitude ``sqrt(power + 1e-9)``, Slaney mel scale with
    Slaney normalization, ``log(clamp(x, 1e-5))`` compression — the
    HiFi-GAN convention (reference models/hificodec/meldataset.py:47-90).

The framing is a gather + window multiply + ``rfft`` (XLA lowers FFTs to
the TPU-optimized implementation); everything is static-shaped.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# mel filterbanks (numpy, cached — these are compile-time constants)
# ---------------------------------------------------------------------------


def _hz_to_mel(f, htk: bool):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f_safe = np.maximum(f, 1e-10)  # avoid log(0) in the unselected branch
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(f_safe / min_log_hz) / logstep, mel
    )


def _mel_to_hz(m, htk: bool):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


@functools.lru_cache(maxsize=64)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank ``[n_mels, n_fft//2 + 1]``.

    ``htk=False, norm='slaney'`` reproduces librosa defaults;
    ``htk=True, norm=None`` reproduces torchaudio defaults.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_min = _hz_to_mel(fmin, htk)
    mel_max = _hz_to_mel(fmax, htk)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb = fb * enorm[:, None]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=64)
def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """torch.hann_window(periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


# ---------------------------------------------------------------------------
# framing + STFT
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """``[B, T] -> [B, n_frames, frame_length]`` (no padding; drops tail)."""
    T = x.shape[-1]
    n_frames = 1 + (T - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


@functools.lru_cache(maxsize=16)
def _dft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-input DFT bases ``[n_fft, n_fft//2+1]`` (cos, -sin) so that
    ``frames @ cos + 1j * frames @ msin == rfft(frames)``."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rfft_frames(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """rfft over the last axis. On TPU the FFT op is unavailable/slow under
    some backends, and an explicit DFT matmul maps straight onto the MXU —
    n_fft <= 2048 makes the O(n^2) basis cheap."""
    if jax.default_backend() == "cpu":
        # XLA's RFFT only accepts f32/f64; bf16 frames (mixed-precision
        # training) upcast — matching the DFT-matmul branch, whose f32
        # bases promote bf16 frames the same way.
        if frames.dtype not in (jnp.float32, jnp.float64):
            frames = frames.astype(jnp.float32)
        return jnp.fft.rfft(frames, n=n_fft, axis=-1)
    cos_b, sin_b = _dft_basis(n_fft)
    re = jnp.dot(frames, jnp.asarray(cos_b), precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, jnp.asarray(sin_b), precision=jax.lax.Precision.HIGHEST)
    return jax.lax.complex(re, im)


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[np.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    normalized: bool = False,
) -> jnp.ndarray:
    """Complex STFT of ``[B, T]`` -> ``[B, n_fft//2+1, n_frames]``.

    torch.stft semantics: a ``win_length`` window is zero-padded symmetrically
    to ``n_fft``; ``center=True`` reflect-pads the signal by ``n_fft//2``;
    ``normalized=True`` divides by ``sqrt(sum(window^2))`` (the torchaudio
    ``Spectrogram(normalized=True)`` window norm).
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    window = jnp.asarray(window, x.dtype)

    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)

    frames = frame_signal(x, n_fft, hop_length) * window
    spec = _rfft_frames(frames, n_fft)  # [B, n_frames, F]
    if normalized:
        spec = spec / jnp.sqrt(jnp.sum(window**2))
    return jnp.swapaxes(spec, -1, -2)  # [B, F, n_frames]


def spectrogram(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    power: Optional[float] = 2.0,
    center: bool = True,
    pad_mode: str = "reflect",
    normalized: bool = False,
) -> jnp.ndarray:
    """Power/magnitude/complex spectrogram with torchaudio semantics."""
    s = stft(
        x,
        n_fft,
        hop_length,
        win_length,
        center=center,
        pad_mode=pad_mode,
        normalized=normalized,
    )
    if power is None:
        return s
    mag2 = jnp.real(s) ** 2 + jnp.imag(s) ** 2
    if power == 2.0:
        return mag2
    return mag2 ** (power / 2.0)


def mel_spectrogram_torchaudio(
    x: jnp.ndarray,
    sr: int,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    n_mels: int = 64,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    power: float = 2.0,
) -> jnp.ndarray:
    """torchaudio ``MelSpectrogram`` defaults: HTK scale, no norm, center=True.

    ``[B, T] -> [B, n_mels, n_frames]``.
    """
    spec = spectrogram(x, n_fft, hop_length, win_length, power=power, center=True)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=True, norm=None))
    return jnp.einsum("mf,bft->bmt", fb, spec)


def mel_spectrogram_hifigan(
    x: jnp.ndarray,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: Optional[float],
) -> jnp.ndarray:
    """HiFi-GAN mel (reference meldataset.py:47-90): manual reflect pad of
    ``(n_fft - hop)/2``, center=False, ``sqrt(|S|^2 + 1e-9)``, Slaney mel,
    ``log(clamp(., 1e-5))``. ``[B, T] -> [B, num_mels, n_frames]``."""
    pad = int((n_fft - hop_size) / 2)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    s = stft(xp, n_fft, hop_size, win_size, center=False)
    mag = jnp.sqrt(jnp.real(s) ** 2 + jnp.imag(s) ** 2 + 1e-9)
    fb = jnp.asarray(
        mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax, htk=False, norm="slaney")
    )
    mel = jnp.einsum("mf,bft->bmt", fb, mag)
    return jnp.log(jnp.clip(mel, min=1e-5))
