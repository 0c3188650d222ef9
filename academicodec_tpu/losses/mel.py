"""Multi-scale mel reconstruction losses.

Two variants, matching the two reference trainers:

  * ``mel_reconstruction_loss`` — the Encodec/SoundStream loss
    (reference models/encodec/loss.py:60-84, models/soundstream/loss.py:64-91):
    ``λ_wav * MSE(x, y) + Σ_s [ L1(mel_s) + sqrt(s/2) * logRMSE(mel_s) ]``
    over scales ``s = 2^i``. Encodec uses ``i in 6..11``, SoundStream
    ``i in 6..10``.
  * ``hifigan_mel_losses`` — the HiFi-Codec generator mel terms
    (reference models/hificodec/train.py:219-275): L1 on the config mel plus
    two fixed smaller-resolution mels.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from academicodec_tpu.ops.stft import mel_spectrogram_hifigan, mel_spectrogram_torchaudio


def mel_reconstruction_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    sr: int,
    scale_powers: Sequence[int] = range(6, 12),
    lambda_wav: float = 100.0,
    n_mels: int = 64,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """``x, y: [B, T]`` waveforms -> scalar loss."""
    loss = lambda_wav * jnp.mean(jnp.square(x - y))
    for i in scale_powers:
        s = 2**i
        sx = mel_spectrogram_torchaudio(
            x, sr, n_fft=max(s, 512), hop_length=s // 4, win_length=s, n_mels=n_mels
        )
        sy = mel_spectrogram_torchaudio(
            y, sr, n_fft=max(s, 512), hop_length=s // 4, win_length=s, n_mels=n_mels
        )
        l1 = jnp.mean(jnp.abs(sx - sy))
        # sqrt of the per-(batch,time) mean over the mel axis, then mean
        # (reference loss.py:80)
        l2 = jnp.mean(
            jnp.sqrt(jnp.mean(jnp.square(jnp.log(jnp.abs(sx) + eps) - jnp.log(jnp.abs(sy) + eps)), axis=-2))
        )
        alpha = (s / 2) ** 0.5
        loss = loss + l1 + alpha * l2
    return loss


def hifigan_mel_losses(
    y: jnp.ndarray,
    y_hat: jnp.ndarray,
    y_mel: Optional[jnp.ndarray],
    *,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax_for_loss: Optional[float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(loss_mel_total, mel_error)``.

    ``loss_mel_total = 45 * L1(mel(y), mel(y_hat)) + L1(mel_512) + L1(mel_256)``
    (reference train.py:219-275; the third small-scale mel is computed in
    the reference but unused in the total). ``mel_error`` is the plain L1 on
    the config mel, the reference's logged metric. ``y_mel`` lets callers
    pass a precomputed ground-truth mel (the reference dataset does); if
    None it is computed here.
    """
    mel_cfg = dict(
        n_fft=n_fft,
        num_mels=num_mels,
        sampling_rate=sampling_rate,
        hop_size=hop_size,
        win_size=win_size,
        fmin=fmin,
        fmax=fmax_for_loss,
    )
    if y_mel is None:
        y_mel = mel_spectrogram_hifigan(y, **mel_cfg)
    y_hat_mel = mel_spectrogram_hifigan(y_hat, **mel_cfg)
    mel_error = jnp.mean(jnp.abs(y_mel - y_hat_mel))

    def small(sig, nf, hop):
        return mel_spectrogram_hifigan(
            sig,
            n_fft=nf,
            num_mels=num_mels,
            sampling_rate=sampling_rate,
            hop_size=hop,
            win_size=nf,
            fmin=fmin,
            fmax=fmax_for_loss,
        )

    loss_mel1 = jnp.mean(jnp.abs(small(y, 512, 120) - small(y_hat, 512, 120)))
    loss_mel2 = jnp.mean(jnp.abs(small(y, 256, 60) - small(y_hat, 256, 60)))
    total = mel_error * 45.0 + loss_mel1 + loss_mel2
    return total, mel_error
