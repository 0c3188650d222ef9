"""Fused Pallas resblock tower vs the plain conv path.

The kernel (ops/pallas/resblock.py) must reproduce XLA's zero-"same" conv
semantics exactly — including conv bias NOT bleeding past the sequence
edge — for both ResBlock flavors, at f32 (exact) and bf16 (reduction-order
tolerance), across tile boundaries, and through the HiFiGANGenerator
integration with an unchanged parameter tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

import academicodec_tpu.ops.pallas.resblock as rb
from academicodec_tpu.nn.hifigan import HiFiCodecConfig, HiFiGANGenerator
from academicodec_tpu.ops.conv import DN_1D


def _lrelu(v):
    return jnp.where(v >= 0, v, 0.1 * v)


def _conv(x, w, b, d):
    k = w.shape[0]
    p = (k - 1) // 2 * d
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), ((p, p),), rhs_dilation=(d,),
        dimension_numbers=DN_1D,
    )
    return y + b.astype(x.dtype)


def _ref_tower(x, weights, biases, ks, dss, resblock):
    acc = 0
    for g, (k, ds) in enumerate(zip(ks, dss)):
        cur = x
        if resblock == "1":
            for pi, d in enumerate(ds):
                y1 = _conv(_lrelu(cur), weights[g][2 * pi], biases[g][2 * pi], d)
                y2 = _conv(_lrelu(y1), weights[g][2 * pi + 1], biases[g][2 * pi + 1], 1)
                cur = cur + y2
        else:
            for pi, d in enumerate(ds):
                cur = cur + _conv(_lrelu(cur), weights[g][pi], biases[g][pi], d)
        acc = acc + cur
    return acc / len(ks)


def _rand_tower(rng, ks, dss, C, n_convs):
    weights, biases = [], []
    for k, ds in zip(ks, dss):
        wg = tuple(
            jnp.asarray(rng.standard_normal((k, C, C)) * 0.1, jnp.float32)
            for _ in range(n_convs)
        )
        bg = tuple(
            jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
            for _ in range(n_convs)
        )
        weights.append(wg)
        biases.append(bg)
    return tuple(weights), tuple(biases)


@pytest.mark.parametrize(
    "resblock,ks,dss,n_convs",
    [
        ("1", (3, 7, 11), ((1, 3, 5),) * 3, 6),
        ("2", (3, 7), ((1, 3), (1, 3)), 2),
    ],
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_tower_matches_plain(resblock, ks, dss, n_convs, dtype):
    rng = np.random.default_rng(0)
    B, T, C = 2, 700, 32
    x = jnp.asarray(rng.standard_normal((B, T, C)), dtype) * 0.5
    weights, biases = _rand_tower(rng, ks, dss, C, n_convs)
    ref = np.asarray(_ref_tower(x, weights, biases, ks, dss, resblock), np.float32)
    out = np.asarray(
        rb.resblock_tower(
            x, weights, biases, kernel_sizes=ks, dilation_sizes=dss,
            resblock=resblock, interpret=True,
        ),
        np.float32,
    )
    tol = 1e-5 if dtype == jnp.float32 else 1.5e-2 * np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=float(tol))


def test_tower_multi_tile_edges_exact(monkeypatch):
    """Tile boundaries and sequence edges (bias masking) stay exact."""
    monkeypatch.setattr(rb, "_pick_tile", lambda C, H, u=1: 256)
    rng = np.random.default_rng(1)
    ks, dss = (3, 7, 11), ((1, 3, 5),) * 3
    B, T, C = 1, 1000, 32  # T deliberately not a multiple of the tile
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32) * 0.5
    weights, biases = _rand_tower(rng, ks, dss, C, 6)
    ref = np.asarray(_ref_tower(x, weights, biases, ks, dss, "1"), np.float32)
    out = np.asarray(
        rb.resblock_tower(
            x, weights, biases, kernel_sizes=ks, dilation_sizes=dss,
            resblock="1", interpret=True,
        ),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # the first/last halo-width samples are where bias masking matters
    np.testing.assert_allclose(out[:, :70], ref[:, :70], atol=2e-5)
    np.testing.assert_allclose(out[:, -70:], ref[:, -70:], atol=2e-5)


def test_tower_pre_post_multi_tile(monkeypatch):
    """ConvT prologue + conv_post epilogue, across tile boundaries."""
    monkeypatch.setattr(rb, "_pick_tile", lambda C, H, u=1: 256)
    rng = np.random.default_rng(3)
    ks, dss = (3, 7, 11), ((1, 3, 5),) * 3
    B, T_in, C_in, C, u, kT = 1, 500, 16, 32, 4, 8
    z = jnp.asarray(rng.standard_normal((B, T_in, C_in)), jnp.float32) * 0.5
    weights, biases = _rand_tower(rng, ks, dss, C, 6)
    wT = jnp.asarray(rng.standard_normal((kT, C_in, C)) * 0.1, jnp.float32)
    bT = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((7, C, 1)) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.standard_normal(1) * 0.1, jnp.float32)

    from academicodec_tpu.ops.conv import conv_transpose1d

    a = _lrelu(z)
    y = conv_transpose1d(a, wT, bT, stride=u, padding=((kT - u) // 2,) * 2)
    tower = _ref_tower(y, weights, biases, ks, dss, "1")
    ref = jnp.tanh(_conv(_lrelu(tower), wp, bp, 1))

    out = rb.resblock_tower(
        z, weights, biases, kernel_sizes=ks, dilation_sizes=dss, resblock="1",
        pre_kernel=wT, pre_bias=bT, pre_stride=u, pre_pad=(kT - u) // 2,
        post_kernel=wp, post_bias=bp, post_tanh=True, interpret=True,
    )
    assert out.shape == (B, T_in * u, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vqvae_fused_tokens_and_decode_parity():
    """Whole-model check: fused encoder chains + fused generator stages
    produce bit-identical tokens and ~exact f32 decode vs the plain model,
    with and without the packed encoder head.

    Runs subprocess-isolated: this 3-model compile sequence late in the
    suite hit the state-dependent XLA:CPU compiler segfault (r4 suite log;
    same class as the test_train/test_mixed_precision isolations)."""
    from conftest import reinvoke_isolated

    if not reinvoke_isolated(__file__, "test_vqvae_fused_tokens_and_decode_parity",
                             "ACT_PALLAS_VQVAE_INNER"):
        return
    from academicodec_tpu.models.hificodec import VQVAE

    cfg = HiFiCodecConfig(
        upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
        upsample_initial_channel=128, encoder_base_channels=16,
    )
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 3200), jnp.float32) * 0.1
    ref_c = ref_o = None
    for fused, packed in ((False, False), (True, False), (True, True)):
        m = VQVAE(
            config=cfg, fused_resblock=fused, fused_encoder=fused,
            packed_conv=packed,
        )
        v = jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, wav[:1, :640])
        codes = np.asarray(m.apply(v, wav, method=VQVAE.encode))
        out = np.asarray(m.apply(v, codes, method=VQVAE.decode))
        if ref_c is None:
            ref_c, ref_o = codes, out
        else:
            assert np.array_equal(codes, ref_c)
            np.testing.assert_allclose(out, ref_o, atol=1e-6)


def test_generator_fused_parity_and_tree():
    """fused_resblock=True: identical param tree, near-identical f32 output."""
    cfg = HiFiCodecConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=64,
    )
    z = (
        jax.random.normal(jax.random.PRNGKey(1), (2, 50, cfg.latent_dim), jnp.float32)
        * 0.1
    )
    gen_p = HiFiGANGenerator(config=cfg, dtype=jnp.float32)
    gen_f = HiFiGANGenerator(config=cfg, dtype=jnp.float32, fused_resblock=True)
    v = gen_p.init(jax.random.PRNGKey(0), z[:1, :8])
    vf = gen_f.init(jax.random.PRNGKey(0), z[:1, :8])
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)
    y0 = np.asarray(gen_p.apply(v, z))
    y1 = np.asarray(gen_f.apply(v, z))
    np.testing.assert_allclose(y1, y0, atol=1e-6)


def _ref_gn_bundle(x, weights, biases, scs, gbs, ks, dss, num_groups, eps=1e-6):
    """Unfused encoder bundle: xs_g = GN_g(xs_{g-1} + r_g), out = xs_last/G
    (reference models.py:405-416 accumulated-sum normalization)."""
    B, T, C = x.shape
    xs = None
    for g, (k, ds) in enumerate(zip(ks, dss)):
        cur = x
        for pi, d in enumerate(ds):
            y1 = _conv(_lrelu(cur), weights[g][2 * pi], biases[g][2 * pi], d)
            y2 = _conv(_lrelu(y1), weights[g][2 * pi + 1], biases[g][2 * pi + 1], 1)
            cur = cur + y2
        xs = cur if xs is None else xs + cur
        xg = xs.reshape(B, T, num_groups, C // num_groups)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + eps)
        xs = xg.reshape(B, T, C) * scs[g] + gbs[g]
    return xs / len(ks)


@pytest.mark.parametrize("T", [575, 1024])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gn_tower_matches_unfused(T, dtype):
    """resblock_tower_gn == chains + interleaved accumulated-sum GroupNorms,
    including the moments-derived statistics, at odd/junk-tail lengths."""
    rng = np.random.default_rng(11)
    ks, dss = (3, 7), ((1, 3), (1, 3))
    C, G = 32, 2
    weights, biases = _rand_tower(rng, ks, dss, C, 4)
    scs = jnp.asarray(rng.standard_normal((G, C)) * 0.3 + 1.0, jnp.float32)
    gbs = jnp.asarray(rng.standard_normal((G, C)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, T, C)) * 0.3, jnp.float32)

    ref = _ref_gn_bundle(x, weights, biases, scs, gbs, ks, dss, num_groups=C // 16)
    out = rb.resblock_tower_gn(
        x.astype(dtype), weights, biases, scs, gbs,
        kernel_sizes=ks, dilation_sizes=dss, resblock="1",
        num_groups=C // 16, interpret=True,
    )
    assert out.shape == x.shape and out.dtype == dtype
    atol = 3e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=atol
    )


def test_encoder_fused_bundle_parity_and_tree():
    """Encoder fused_resblock: identical param tree, ~exact f32 output vs
    the unfused accumulated-GroupNorm path.

    Subprocess-isolated (conftest.reinvoke_isolated): in round 5 this
    compile segfaulted at ~65% of the full suite inside the XLA
    compilation-cache read — the known state-dependent XLA:CPU crash
    class (CLAUDE.md); it passes in any fresh process."""
    from conftest import reinvoke_isolated

    if not reinvoke_isolated(__file__, "test_encoder_fused_bundle_parity_and_tree",
                             "ACT_ENC_FUSED_INNER"):
        return
    from academicodec_tpu.nn.hifigan import HiFiGANEncoder

    cfg = HiFiCodecConfig(encoder_base_channels=16)
    x = (jax.random.normal(jax.random.PRNGKey(0), (2, 3200, 1)) * 0.1).astype(
        jnp.float32
    )
    enc_p = HiFiGANEncoder(config=cfg, dtype=jnp.float32)
    enc_f = HiFiGANEncoder(config=cfg, dtype=jnp.float32, fused_resblock=True)
    v = enc_p.init(jax.random.PRNGKey(1), x[:1, :640])
    vf = enc_f.init(jax.random.PRNGKey(1), x[:1, :640])
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)
    y0 = np.asarray(enc_p.apply(v, x))
    y1 = np.asarray(enc_f.apply(v, x))
    np.testing.assert_allclose(y1, y0, atol=5e-6)
