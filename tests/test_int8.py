"""W8A8 int8 quantized serving (ops/int8.py + Conv1d(w8a8=True)).

Beyond-reference serving mode for the MXU compute-bound wide HiFi-Codec
stages. Contracts pinned here:
  * conv1d_w8a8 == the exact f32 conv of the DEQUANTIZED operands (int32
    accumulation is exact, so quantization is the only error source);
  * calibrate -> serve roundtrip stays numerically close to the
    full-precision model (loose tolerance — it IS 8-bit);
  * the param tree is untouched (torch checkpoint importer contract) —
    quantization state lives in the separate 'quant' collection;
  * serving without calibration fails loudly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from academicodec_tpu.models.hificodec import VQVAE, calibrate_quant
from academicodec_tpu.nn.hifigan import HiFiCodecConfig
from academicodec_tpu.ops.int8 import (
    conv1d_w8a8,
    quantize_act,
    quantize_kernel_per_cout,
)

CFG = HiFiCodecConfig(
    upsample_rates=(2, 2, 2),
    upsample_kernel_sizes=(4, 4, 4),
    upsample_initial_channel=64,
    resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 2), (1, 3)),
    encoder_base_channels=8,
    n_code_groups=2,
    n_codes=32,
    sampling_rate=16000,
)
# stages with channels >= 16: encoder s1 (16), s2 (32); generator s0 (32),
# s1 (16) — several quantized sites plus untouched narrow ones
INT8_MIN_CH = 16


def test_conv1d_w8a8_matches_dequantized_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 50, 24)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 24, 16)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)
    act_scale = jnp.float32(float(jnp.max(jnp.abs(x))) / 127.0)

    y = conv1d_w8a8(x, w, b, act_scale, dilation=2, padding=(4, 4))

    # reference: f32 conv of the dequantized operands
    from academicodec_tpu.ops.conv import conv1d

    xi = quantize_act(x, act_scale)
    ki, sw = quantize_kernel_per_cout(w)
    y_ref = conv1d(
        xi.astype(jnp.float32) * act_scale,
        ki.astype(jnp.float32) * sw,
        b,
        dilation=2,
        padding=((4, 4),),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    # the quantization error itself is small for well-scaled inputs
    y_fp = conv1d(x, w, b, dilation=2, padding=((4, 4),),
                  precision=jax.lax.Precision.HIGHEST)
    rel = np.linalg.norm(np.asarray(y - y_fp)) / np.linalg.norm(np.asarray(y_fp))
    assert rel < 0.02, rel


def test_quantize_kernel_per_cout_scales():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 8, 4)).astype(np.float32))
    ki, s = quantize_kernel_per_cout(w)
    assert ki.dtype == jnp.int8 and s.shape == (4,)
    # each out-channel's max quantizes to exactly +-127
    assert int(np.max(np.abs(np.asarray(ki)), axis=(0, 1)).min()) == 127
    np.testing.assert_allclose(
        np.asarray(ki * s), np.asarray(w), atol=float(s.max()) / 2 + 1e-7
    )


@pytest.fixture(scope="module")
def fp_and_int8():
    model_fp = VQVAE(config=CFG)
    model_q = VQVAE(config=CFG, int8_min_channels=INT8_MIN_CH)
    wav = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 480)).astype(np.float32) * 0.3
    )
    variables = model_fp.init({"params": jax.random.PRNGKey(0)}, wav)
    return model_fp, model_q, variables, wav


def test_param_tree_unchanged_and_calibration_collection(fp_and_int8):
    model_fp, model_q, variables, wav = fp_and_int8
    # int8 flag declares the exact same params (importer contract)
    v_q = model_q.init({"params": jax.random.PRNGKey(0)}, wav)
    assert jax.tree_util.tree_structure(
        variables["params"]
    ) == jax.tree_util.tree_structure(v_q["params"])
    assert "quant" not in v_q  # no quant state until calibration

    v_cal = calibrate_quant(model_q, variables, wav)
    leaves = jax.tree_util.tree_leaves(v_cal["quant"])
    assert leaves and all(float(a) > 0 for a in leaves)


def test_int8_serving_close_to_fp_and_tokens_exact_on_decode(fp_and_int8):
    model_fp, model_q, variables, wav = fp_and_int8
    v_cal = calibrate_quant(model_q, variables, wav)

    toks = model_fp.apply(variables, wav, method=VQVAE.encode)
    y_fp = model_fp.apply(variables, toks, method=VQVAE.decode)
    y_q = model_q.apply(v_cal, toks, method=VQVAE.decode)
    rel = np.linalg.norm(np.asarray(y_q - y_fp)) / np.linalg.norm(np.asarray(y_fp))
    assert rel < 0.12, rel  # 8-bit resblocks on a random-init net

    # full roundtrip (int8 encoder too) stays finite and close
    y2, loss_q, codes = model_q.apply(v_cal, wav)
    assert np.all(np.isfinite(np.asarray(y2)))
    assert codes.shape == toks.shape


def test_uncalibrated_serving_fails_loudly(fp_and_int8):
    _, model_q, variables, wav = fp_and_int8
    with pytest.raises(Exception, match="act_amax|quant"):
        model_q.apply(variables, wav, method=VQVAE.encode)
