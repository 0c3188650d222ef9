"""Discriminator invariants + parity vs the torch reference where importable.

The reference MS-STFT discriminator needs torchaudio (absent), so it gets
shape/count invariants (mirroring the reference self-test,
msstftd.py:181-194); the HiFi-GAN-style discriminators get full numerical
parity through the weight importer.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from academicodec_tpu.nn.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    MultiScaleSTFTDiscriminator,
)
from academicodec_tpu.utils.torch_import import _conv_param, _set


def test_msstft_shape_invariants():
    disc = MultiScaleSTFTDiscriminator(filters=8, n_ffts=(256, 128), hop_lengths=(64, 32), win_lengths=(256, 128))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4000))
    variables = disc.init({"params": rng}, x)
    logits, fmaps = disc.apply(variables, x)
    assert len(logits) == len(fmaps) == 2
    assert all(len(fm) == 5 for fm in fmaps)  # 1 stem + 3 dilated + 1 square
    assert all(l.ndim == 2 and l.shape[0] == 2 for l in logits)
    # feature maps carry the filter count on the channel axis
    assert all(fm[0].shape[-1] == 8 for fm in fmaps)


@pytest.mark.parametrize("flavor,nfmap", [("soundstream", 6), ("hificodec", 6)])
def test_mpd_shape_invariants(flavor, nfmap):
    disc = MultiPeriodDiscriminator(flavor=flavor, periods=(2, 3))
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 3001))  # odd length exercises the pad path
    variables = disc.init({"params": rng}, x)
    logits, fmaps = disc.apply(variables, x)
    assert len(logits) == 2
    assert all(len(fm) == nfmap for fm in fmaps)


def _import_torch_convs(ref, transposed=False):
    """Walk a reference HiFi-GAN-style discriminator state dict."""
    params = {}
    for key, val in ref.state_dict().items():
        parts = key.split(".")
        if parts[0] == "convs":
            _conv_param((f"convs_{parts[1]}",), params, parts[-1], val, transposed)
        elif parts[0] == "conv_post":
            _conv_param(("conv_post",), params, parts[-1], val, transposed)
        elif parts[-1] in ("weight_u", "weight_v") and "conv" in parts[0]:
            continue
        else:
            raise KeyError(key)
    return params


@requires_reference
def test_hificodec_period_discriminator_parity():
    import torch
    from academicodec.models.hificodec.models import DiscriminatorP as TorchP

    from academicodec_tpu.nn.discriminators import PeriodDiscriminator

    torch.manual_seed(0)
    ref = TorchP(3)
    ref.eval()
    x = torch.randn(2, 1, 3000)
    with torch.no_grad():
        y_ref, fmap_ref = ref(x)

    params = _import_torch_convs(ref)
    mod = PeriodDiscriminator(
        period=3, channels=(32, 128, 512, 1024, 1024), norm="weight_norm",
        activation_slope=0.1,
    )
    y, fmap = mod.apply({"params": params}, jnp.asarray(x.numpy()[:, 0, :]))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-4, rtol=1e-3)
    assert len(fmap) == len(fmap_ref)
    # compare a mid-stack feature map (channels-last vs torch [B,C,H,W])
    ours = np.asarray(fmap[2]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, fmap_ref[2].numpy(), atol=2e-4, rtol=1e-3)


@requires_reference
def test_hificodec_scale_discriminator_parity_weightnorm():
    import torch
    from academicodec.models.hificodec.models import DiscriminatorS as TorchS

    from academicodec_tpu.nn.discriminators import ScaleDiscriminator, _HC_SCALE_SPECS

    torch.manual_seed(1)
    ref = TorchS(use_spectral_norm=False)
    ref.eval()
    x = torch.randn(1, 1, 4000)
    with torch.no_grad():
        y_ref, _ = ref(x)

    params = _import_torch_convs(ref)
    mod = ScaleDiscriminator(specs=_HC_SCALE_SPECS, norm="weight_norm", activation_slope=0.1)
    y, _ = mod.apply({"params": params}, jnp.asarray(x.numpy()[:, 0, :]))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-4, rtol=1e-3)


def test_spectral_norm_normalizes():
    """After power iterations, the effective weight's top singular value ~1."""
    from academicodec_tpu.nn.conv import Conv1d

    mod = Conv1d(in_channels=8, out_channels=16, kernel_size=3, padding=(1, 1), norm="spectral_norm")
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (1, 32, 8))
    variables = mod.init({"params": rng}, x)
    params, spectral = variables["params"], variables["spectral"]
    for _ in range(30):
        _, updated = mod.apply(
            {"params": params, "spectral": spectral}, x, mutable=["spectral"]
        )
        spectral = updated["spectral"]
    # reconstruct the effective weight by probing with identity-ish input is
    # overkill; instead check sigma of raw kernel vs normalized output scale
    w = np.asarray(params["kernel"])
    u = np.asarray(spectral["kernel_u"])
    w_mat = np.moveaxis(w, -1, 0).reshape(16, -1)
    sigma_true = np.linalg.svd(w_mat, compute_uv=False)[0]
    # power-iteration estimate via u
    v = w_mat.T @ u / (np.linalg.norm(w_mat.T @ u) + 1e-12)
    sigma_est = u @ w_mat @ v
    assert abs(sigma_est - sigma_true) / sigma_true < 0.05
