"""Numeric parity for the torchaudio-convention paths, without torchaudio.

torchaudio is absent in this image, so these tests pin loss-level numerics
with independently-derived oracles built from primitives that ARE available:

* ``mel_spectrogram_torchaudio`` vs torch.stft + a NumPy HTK filterbank
  implementing torchaudio ``MelSpectrogram``'s documented algorithm
  (Spectrogram(center=True, reflect, power=2) -> melscale_fbanks(htk,
  norm=None)) — at every (n_fft, win, hop) the encodec loss actually uses
  (reference loss.py:60-84: s=2^i, i=6..11, n_fft=max(s,512), hop=s//4).
* The MS-STFT discriminator vs a torch replica assembled from the
  REFERENCE's own NormConv2d (modules/conv.py, torch-only import) with the
  exact msstftd.py:27-134 topology and torchaudio's
  Spectrogram(power=None, normalized=True, center=False) semantics
  (window-norm: divide by sqrt(sum(window^2))) — full logits + feature-map
  parity through the weight importer.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from academicodec_tpu.ops.stft import mel_spectrogram_torchaudio


def _htk_fbanks_numpy(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """torchaudio.functional.melscale_fbanks(htk, norm=None): ``[n_freqs,
    n_mels]`` triangular filters over linspace(0, sr//2)."""
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    f_min, f_max = 0.0, float(sr // 2)
    m = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    m_pts = np.linspace(m(f_min), m(f_max), n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up))


def _mel_oracle(x: np.ndarray, sr: int, n_fft: int, win: int, hop: int,
                n_mels: int) -> np.ndarray:
    """torchaudio MelSpectrogram defaults via torch.stft + NumPy fb."""
    import torch

    spec = torch.stft(
        torch.from_numpy(x), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    power = (spec.abs() ** 2).numpy()  # [B, F, T']
    fb = _htk_fbanks_numpy(sr, n_fft, n_mels)  # [F, n_mels]
    return np.einsum("fm,bft->bmt", fb, power)


@pytest.mark.parametrize("sr", [16000, 24000])
def test_mel_torchaudio_convention_matches_oracle(sr):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 4096)) * 0.2).astype(np.float32)
    for i in range(6, 12):  # the loss's operating points (loss.py:66-76)
        s = 2 ** i
        n_fft, win, hop = max(s, 512), s, s // 4
        ours = np.asarray(
            mel_spectrogram_torchaudio(
                jnp.asarray(x), sr, n_fft, hop, win_length=win, n_mels=64
            )
        )
        ref = _mel_oracle(x, sr, n_fft, win, hop, 64)
        assert ours.shape == ref.shape, (i, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3, err_msg=f"s=2^{i}")


@requires_reference
def test_msstft_discriminator_numeric_parity():
    """Full-stack numeric parity of one STFT sub-discriminator vs a torch
    replica built from the reference's NormConv2d with the exact
    msstftd.py:27-134 wiring (torchaudio Spectrogram semantics hand-rolled:
    power=None, normalized=True -> /= sqrt(sum(win^2)), center=False)."""
    import torch
    from academicodec.modules.conv import NormConv2d

    from academicodec_tpu.nn.discriminators import STFTDiscriminator
    from tests.test_discriminators import _import_torch_convs

    filters, n_fft, hop, win = 8, 256, 64, 256
    ks, dilations, stride = (3, 9), (1, 2, 4), (1, 2)

    def pad2d(kernel_size, dilation=(1, 1)):
        return (
            ((kernel_size[0] - 1) * dilation[0]) // 2,
            ((kernel_size[1] - 1) * dilation[1]) // 2,
        )

    class TorchSTFTDisc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = torch.nn.ModuleList()
            self.convs.append(
                NormConv2d(2, filters, kernel_size=ks, padding=pad2d(ks))
            )
            in_chs = filters
            for i, d in enumerate(dilations):
                out_chs = min((2 ** 0) * filters * (1 ** i), 1024)  # filters_scale=1
                self.convs.append(
                    NormConv2d(in_chs, out_chs, kernel_size=ks, stride=stride,
                               dilation=(d, 1), padding=pad2d(ks, (d, 1)),
                               norm="weight_norm")
                )
                in_chs = out_chs
            sq = (ks[0], ks[0])
            self.convs.append(
                NormConv2d(in_chs, filters, kernel_size=sq, padding=pad2d(sq),
                           norm="weight_norm")
            )
            self.conv_post = NormConv2d(filters, 1, kernel_size=sq,
                                        padding=pad2d(sq), norm="weight_norm")
            self.act = torch.nn.LeakyReLU(0.2)

        def forward(self, x):
            window = torch.hann_window(win)
            spec = torch.stft(x, n_fft, hop_length=hop, win_length=win,
                              window=window, center=False, normalized=False,
                              onesided=True, return_complex=True)
            spec = spec / window.pow(2).sum().sqrt()  # torchaudio normalized=True
            z = torch.stack([spec.real, spec.imag], dim=1)  # [B, 2, F, T']
            z = z.permute(0, 1, 3, 2)  # b c w t -> b c t w (msstftd.py:126)
            fmap = []
            for layer in self.convs:
                z = self.act(layer(z))
                fmap.append(z)
            return self.conv_post(z), fmap

    torch.manual_seed(5)
    ref = TorchSTFTDisc()
    ref.eval()
    x = torch.randn(2, 2000) * 0.3
    with torch.no_grad():
        y_ref, fmap_ref = ref(x)

    params = _import_torch_convs(ref)
    mod = STFTDiscriminator(filters=filters, n_fft=n_fft, hop_length=hop,
                            win_length=win)
    y, fmap = mod.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(y), y_ref.numpy().reshape(2, -1), atol=2e-4, rtol=1e-3
    )
    assert len(fmap) == len(fmap_ref) == 5
    for ours_f, ref_f in zip(fmap, fmap_ref):
        # ours [B, T', F, C] vs torch [B, C, T', F]
        np.testing.assert_allclose(
            np.asarray(ours_f).transpose(0, 3, 1, 2), ref_f.numpy(),
            atol=2e-4, rtol=1e-3,
        )
