"""Lanes-packed HiFi-Codec == unpacked HiFi-Codec (ops/packed.py plumbing).

The HiFi-GAN encoder head and generator tail run at C=32..64 over waveform
rate — the same lane-starved region lanes-packing fixes for SEANet. These
tests pin exactness: same params, packed_conv on/off, identical tokens and
matching audio at full reference width (upsample_rates (8,5,4,2), 512-dim
latent; reference egs/HiFi-Codec-24k-320d/config_24k_320d.json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from academicodec_tpu.models.hificodec import VQVAE
from academicodec_tpu.nn.hifigan import HiFiCodecConfig, HiFiGANEncoder, HiFiGANGenerator


def _wav(batch, n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 24000.0
    base = np.sin(2 * np.pi * 220.0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t))
    x = 0.4 * base + 0.1 * rng.standard_normal((batch, n))
    return jnp.asarray(x, jnp.float32)


CFG = HiFiCodecConfig()  # 24k_320d defaults: rates (8,5,4,2), latent 512


@pytest.fixture(scope="module")
def vqvae_pair():
    plain = VQVAE(config=CFG)
    packed = VQVAE(config=CFG, packed_conv=True)
    x = _wav(2, 16000)
    variables = plain.init({"params": jax.random.PRNGKey(0)}, x)
    return plain, packed, variables, x


def test_encoder_packed_matches(vqvae_pair):
    _, _, variables, x = vqvae_pair
    enc_vars = {"params": variables["params"]["encoder"]}
    plain = HiFiGANEncoder(config=CFG).apply(enc_vars, x[..., None])
    packed = HiFiGANEncoder(config=CFG, packed_conv=True).apply(enc_vars, x[..., None])
    assert plain.shape == packed.shape
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain), rtol=2e-5, atol=2e-5)


def test_generator_packed_matches(vqvae_pair):
    _, _, variables, _ = vqvae_pair
    gen_vars = {"params": variables["params"]["generator"]}
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 50, CFG.latent_dim)) * 0.3
    plain = HiFiGANGenerator(config=CFG).apply(gen_vars, lat)
    packed = HiFiGANGenerator(config=CFG, packed_conv=True).apply(gen_vars, lat)
    assert plain.shape == packed.shape
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain), rtol=1e-5, atol=1e-5)


def test_vqvae_tokens_identical_and_decode_close(vqvae_pair):
    plain, packed, variables, x = vqvae_pair
    codes_plain = plain.apply(variables, x, method=VQVAE.encode)
    codes_packed = packed.apply(variables, x, method=VQVAE.encode)
    np.testing.assert_array_equal(np.asarray(codes_packed), np.asarray(codes_plain))
    wav_plain = plain.apply(variables, codes_plain, method=VQVAE.decode)
    wav_packed = packed.apply(variables, codes_packed, method=VQVAE.decode)
    np.testing.assert_allclose(
        np.asarray(wav_packed), np.asarray(wav_plain), rtol=1e-5, atol=1e-5
    )


def test_odd_length_and_240d_rates():
    """Non-divisible lengths exercise the junk-slot masking; the 240d rate
    set (8,5,3,2) exercises a different packing factor chain."""
    cfg = HiFiCodecConfig(upsample_rates=(8, 5, 3, 2), upsample_kernel_sizes=(16, 11, 7, 4))
    x = _wav(1, 12001, seed=3)
    plain = VQVAE(config=cfg)
    variables = plain.init({"params": jax.random.PRNGKey(2)}, _wav(1, 12000))
    y_plain, _, codes_plain = plain.apply(variables, x)
    y_packed, _, codes_packed = VQVAE(config=cfg, packed_conv=True).apply(variables, x)
    np.testing.assert_array_equal(np.asarray(codes_packed), np.asarray(codes_plain))
    np.testing.assert_allclose(
        np.asarray(y_packed), np.asarray(y_plain), rtol=2e-5, atol=2e-5
    )


def test_odd_kernel_minus_stride_crop():
    """Generator stage with odd k-u (kernel 5, rate 2): the torch crop is
    asymmetric, the true output outgrows the packed rows, and the packed
    path must fall back instead of silently truncating the last sample."""
    cfg = HiFiCodecConfig(
        upsample_rates=(2, 2, 2, 2),
        upsample_kernel_sizes=(4, 4, 4, 5),  # last stage: k-u = 3 (odd)
        upsample_initial_channel=128,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        encoder_base_channels=16,
    )
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 40, cfg.latent_dim)) * 0.3
    plain_m = HiFiGANGenerator(config=cfg)
    variables = plain_m.init({"params": jax.random.PRNGKey(6)}, lat)
    plain = plain_m.apply(variables, lat)
    packed = HiFiGANGenerator(config=cfg, packed_conv=True).apply(variables, lat)
    assert plain.shape == packed.shape
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("entry,p0", [(2, 1), (3, 2), (2, 2), (3, 1)])
def test_generator_entry_policies_match(vqvae_pair, entry, p0):
    """Every packed entry point / initial packing factor is exact (the knobs
    behind benchmarks/hifigen_entry_probe.py)."""
    _, _, variables, _ = vqvae_pair
    gen_vars = {"params": variables["params"]["generator"]}
    lat = jax.random.normal(jax.random.PRNGKey(2), (2, 37, CFG.latent_dim)) * 0.3
    plain = HiFiGANGenerator(config=CFG).apply(gen_vars, lat)
    got = HiFiGANGenerator(
        config=CFG, packed_conv=True, packed_entry=entry, packed_p0=p0
    ).apply(gen_vars, lat)
    assert got.shape == plain.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(plain), rtol=1e-5, atol=1e-5)
