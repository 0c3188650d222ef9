"""Numerical parity of conv/LSTM/SEANet layers vs the torch reference.

Random reference modules are exported via their state_dict and imported with
the same translation rules as real checkpoints, then outputs are compared in
float32.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from academicodec_tpu.nn.conv import SConv1d, SConvTranspose1d
from academicodec_tpu.nn.lstm import SLSTM
from academicodec_tpu.nn.seanet import SEANetEncoder, SEANetDecoder
from academicodec_tpu.utils import torch_import as ti


def _to_jax_in(x_torch):
    # torch conv layout [B, C, T] -> ours [B, T, C]
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 1))


def _from_jax_out(y):
    return np.asarray(y).transpose(0, 2, 1)


@requires_reference
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "cin,cout,k,s,d", [(4, 8, 7, 1, 1), (8, 16, 16, 8, 1), (8, 8, 3, 1, 2), (4, 4, 1, 1, 1)]
)
def test_sconv1d_parity(causal, cin, cout, k, s, d):
    import torch
    from academicodec.modules.conv import SConv1d as TorchSConv1d

    torch.manual_seed(0)
    ref = TorchSConv1d(cin, cout, k, stride=s, dilation=d, causal=causal, norm="weight_norm")
    ref.eval()
    x = torch.randn(2, cin, 101)
    with torch.no_grad():
        y_ref = ref(x)

    params = {}
    for key, val in ref.state_dict().items():
        # keys: conv.conv.weight_g / weight_v / bias (strip the module nesting)
        tail = key.split(".")[-1]
        ti._conv_param(("conv",), params, tail, val, is_transposed=False)

    mod = SConv1d(
        in_channels=cin,
        out_channels=cout,
        kernel_size=k,
        stride=s,
        dilation=d,
        causal=causal,
        norm="weight_norm",
    )
    y = mod.apply({"params": params}, _to_jax_in(x))
    np.testing.assert_allclose(_from_jax_out(y), y_ref.numpy(), atol=2e-5, rtol=1e-4)


@requires_reference
@pytest.mark.parametrize("causal,trim", [(False, 1.0), (True, 1.0), (True, 0.5)])
@pytest.mark.parametrize("cin,cout,k,s", [(8, 4, 16, 8), (8, 8, 4, 2), (6, 3, 10, 5)])
def test_sconvtranspose1d_parity(causal, trim, cin, cout, k, s):
    import torch
    from academicodec.modules.conv import SConvTranspose1d as TorchSConvT

    torch.manual_seed(1)
    ref = TorchSConvT(cin, cout, k, stride=s, causal=causal, trim_right_ratio=trim, norm="weight_norm")
    ref.eval()
    x = torch.randn(2, cin, 25)
    with torch.no_grad():
        y_ref = ref(x)

    params = {}
    for key, val in ref.state_dict().items():
        tail = key.split(".")[-1]
        ti._conv_param(("convtr",), params, tail, val, is_transposed=True)

    mod = SConvTranspose1d(
        in_channels=cin,
        out_channels=cout,
        kernel_size=k,
        stride=s,
        causal=causal,
        trim_right_ratio=trim,
        norm="weight_norm",
    )
    y = mod.apply({"params": params}, _to_jax_in(x))
    np.testing.assert_allclose(_from_jax_out(y), y_ref.numpy(), atol=2e-5, rtol=1e-4)


@requires_reference
def test_slstm_parity():
    import torch
    from academicodec.modules.lstm import SLSTM as TorchSLSTM

    torch.manual_seed(2)
    dim = 16
    ref = TorchSLSTM(dim, num_layers=2)
    ref.eval()
    x = torch.randn(3, dim, 37)
    with torch.no_grad():
        y_ref = ref(x)

    params = {}
    for key, val in ref.state_dict().items():
        # lstm.weight_ih_l0 etc.
        m = ti._LSTM_RE.fullmatch(key.split(".")[-1])
        assert m
        ti._set(params, (f"l{m.group(2)}", m.group(1)), val.numpy())

    mod = SLSTM(dimension=dim, num_layers=2)
    y = mod.apply({"params": params}, _to_jax_in(x))
    np.testing.assert_allclose(_from_jax_out(y), y_ref.numpy(), atol=3e-5, rtol=1e-4)


def _import_seanet_tower(ref_module, tower: str):
    sd = {f"{tower}.{k}": v for k, v in ref_module.state_dict().items()}
    full = {}
    for key, value in sd.items():
        parts = key.split(".")
        prefix = (parts[0], f"model_{parts[2]}")
        rest = parts[3:]
        if rest[0] == "lstm":
            m = ti._LSTM_RE.fullmatch(rest[1])
            ti._set(full, prefix + (f"l{m.group(2)}", m.group(1)), value.numpy())
        elif rest[0] == "block":
            ti._conv_param(prefix + ("block_" + rest[1], "conv"), full, rest[-1], value, False)
        elif rest[0] == "shortcut":
            ti._conv_param(prefix + ("shortcut", "conv"), full, rest[-1], value, False)
        elif rest[0] == "conv":
            ti._conv_param(prefix + ("conv",), full, rest[-1], value, False)
        elif rest[0] == "convtr":
            ti._conv_param(prefix + ("convtr",), full, rest[-1], value, True)
        else:
            raise KeyError(key)
    return full[tower]


@requires_reference
@pytest.mark.parametrize("ratios", [(8, 5, 4, 2), (2, 2, 2, 4)])
def test_seanet_encoder_parity(ratios):
    import torch
    from academicodec.modules.seanet import SEANetEncoder as TorchEnc

    torch.manual_seed(3)
    ref = TorchEnc(n_filters=4, dimension=16, ratios=list(ratios))
    ref.eval()
    x = torch.randn(2, 1, 1600)
    with torch.no_grad():
        y_ref = ref(x)

    params = _import_seanet_tower(ref, "encoder")
    mod = SEANetEncoder(n_filters=4, dimension=16, ratios=ratios)
    y = mod.apply({"params": params}, _to_jax_in(x))
    np.testing.assert_allclose(_from_jax_out(y), y_ref.numpy(), atol=5e-5, rtol=1e-3)


@requires_reference
def test_seanet_decoder_parity():
    import torch
    from academicodec.modules.seanet import SEANetDecoder as TorchDec

    torch.manual_seed(4)
    ratios = (8, 5, 4, 2)
    ref = TorchDec(n_filters=4, dimension=16, ratios=list(ratios))
    ref.eval()
    z = torch.randn(2, 16, 5)
    with torch.no_grad():
        y_ref = ref(z)

    params = _import_seanet_tower(ref, "decoder")
    mod = SEANetDecoder(n_filters=4, dimension=16, ratios=ratios)
    y = mod.apply({"params": params}, _to_jax_in(z))
    np.testing.assert_allclose(_from_jax_out(y), y_ref.numpy(), atol=5e-5, rtol=1e-3)


@pytest.mark.parametrize("k,u", [(4, 2), (8, 4), (11, 5), (16, 8), (3, 1)])
def test_conv_transpose1d_subpixel_matches(k, u):
    """Phase-major ("sub-pixel") convT lowering == the lhs-dilation form
    for the HiFi-GAN symmetric-crop padding family (ops/conv.py)."""
    from academicodec_tpu.ops.conv import conv_transpose1d, conv_transpose1d_subpixel

    rng = np.random.default_rng(k * 100 + u)
    B, T, Ci, Co = 2, 37, 6, 5
    x = jnp.asarray(rng.standard_normal((B, T, Ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, Ci, Co)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Co) * 0.1, jnp.float32)
    pad = ((k - u) // 2,) * 2
    ref = conv_transpose1d(x, w, b, stride=u, padding=pad)
    out = conv_transpose1d_subpixel(x, w, b, stride=u, padding=pad)
    assert out.shape == ref.shape == (B, T * u, Co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
