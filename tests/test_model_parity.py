"""End-to-end model parity: SoundStream and HiFi-Codec VQVAE vs reference.

Random reference models are exported through the same importer used for real
checkpoints; tokens must be bit-exact, waveforms float32-close.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.models.hificodec import VQVAE
from academicodec_tpu.nn.hifigan import HiFiCodecConfig
from academicodec_tpu.utils import torch_import as ti


def _make_ref_soundstream(ratios, sr, bws, seed=0, n_filters=4, D=32):
    import torch
    from academicodec.models.encodec.net3 import SoundStream as TorchSS

    torch.manual_seed(seed)
    ref = TorchSS(
        n_filters=n_filters, D=D, ratios=list(ratios), sample_rate=sr,
        target_bandwidths=list(bws),
    )
    # fill codebooks with random values and mark inited so encode is nontrivial
    with torch.no_grad():
        for layer in ref.quantizer.vq.layers:
            cb = layer._codebook
            cb.embed.normal_()
            cb.embed_avg.copy_(cb.embed)
            cb.cluster_size.fill_(1.0)
            cb.inited.fill_(True)
    ref.eval()
    return ref


@requires_reference
@pytest.mark.parametrize(
    "ratios,sr,bws",
    [
        ((8, 5, 4, 2), 16000, (1, 1.5, 2, 4, 6, 12)),
        ((6, 5, 4, 2), 24000, (1, 2, 4, 8, 12)),
        ((2, 2, 2, 4), 24000, (7.5, 15)),
    ],
)
def test_soundstream_token_and_decode_parity(ratios, sr, bws):
    import torch

    ref = _make_ref_soundstream(ratios, sr, bws)
    model = SoundStream(
        n_filters=4, dimension=32, ratios=ratios, sample_rate=sr, target_bandwidths=bws
    )
    assert model.n_q == ref.quantizer.n_q
    variables = ti.import_soundstream(ref.state_dict(), n_q=model.n_q)

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 4800)) * 0.1).astype(np.float32)

    with torch.no_grad():
        codes_ref = ref.encode(torch.from_numpy(wav).unsqueeze(1), target_bw=bws[-1]).numpy()
        out_ref = ref.decode(torch.from_numpy(codes_ref)).numpy()

    enc_fn = jax.jit(lambda v, w: model.apply(v, w, target_bw=bws[-1], method=SoundStream.encode))
    codes = enc_fn(variables, jnp.asarray(wav))
    np.testing.assert_array_equal(np.asarray(codes), codes_ref)

    dec_fn = jax.jit(lambda v, c: model.apply(v, c, method=SoundStream.decode))
    out = dec_fn(variables, codes)
    np.testing.assert_allclose(
        np.asarray(out), out_ref[:, 0, :], atol=1e-4, rtol=1e-3
    )


@requires_reference
@pytest.mark.slow
def test_soundstream_full_size_parity():
    """Flagship inference width (n_filters=32, D=512 — reference
    test.py:165-170): token bit-exactness and decode closeness must hold at
    full width, pinning width-dependent paths (H=512 LSTM, deep channel
    doubling) the tiny-width tests can't reach."""
    import torch

    ratios, sr, bws = (6, 5, 4, 2), 24000, (1, 2, 4, 8, 12)
    ref = _make_ref_soundstream(ratios, sr, bws, n_filters=32, D=512)
    model = SoundStream(
        n_filters=32, dimension=512, ratios=ratios, sample_rate=sr,
        target_bandwidths=bws,
    )
    assert model.n_q == ref.quantizer.n_q == 12
    variables = ti.import_soundstream(ref.state_dict(), n_q=model.n_q)

    rng = np.random.default_rng(5)
    wav = (rng.standard_normal((2, 7200)) * 0.1).astype(np.float32)

    with torch.no_grad():
        codes_ref = ref.encode(
            torch.from_numpy(wav).unsqueeze(1), target_bw=bws[-1]
        ).numpy()
        out_ref = ref.decode(torch.from_numpy(codes_ref)).numpy()

    enc_fn = jax.jit(
        lambda v, w: model.apply(v, w, target_bw=bws[-1], method=SoundStream.encode)
    )
    codes = enc_fn(variables, jnp.asarray(wav))
    np.testing.assert_array_equal(np.asarray(codes), codes_ref)

    dec_fn = jax.jit(lambda v, c: model.apply(v, c, method=SoundStream.decode))
    out = dec_fn(variables, codes)
    np.testing.assert_allclose(np.asarray(out), out_ref[:, 0, :], atol=2e-4, rtol=1e-3)


@requires_reference
def test_soundstream_partial_stack_encode():
    """st/n_q offsets (SpearTTS-style partial token extraction) match."""
    import torch

    ratios, sr, bws = (8, 5, 4, 2), 16000, (1, 1.5, 2, 4, 6, 12)
    ref = _make_ref_soundstream(ratios, sr, bws)
    model = SoundStream(
        n_filters=4, dimension=32, ratios=ratios, sample_rate=sr, target_bandwidths=bws
    )
    variables = ti.import_soundstream(ref.state_dict(), n_q=model.n_q)
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((1, 4800)) * 0.1).astype(np.float32)
    with torch.no_grad():
        codes_ref = ref.encode(torch.from_numpy(wav).unsqueeze(1), target_bw=6, st=2).numpy()
    codes = jax.jit(
        lambda v, w: model.apply(v, w, target_bw=6, st=2, method=SoundStream.encode)
    )(variables, jnp.asarray(wav))
    np.testing.assert_array_equal(np.asarray(codes), codes_ref)


@requires_reference
def test_vqvae_token_and_decode_parity():
    import torch
    from academicodec.models.hificodec.models import Encoder as TorchEncoder
    from academicodec.models.hificodec.models import Generator as TorchGenerator
    from academicodec.models.hificodec.models import Quantizer as TorchQuantizer

    class H:
        resblock = "1"
        upsample_rates = [8, 5, 4, 2]
        upsample_kernel_sizes = [16, 11, 8, 4]
        upsample_initial_channel = 512
        resblock_kernel_sizes = [3, 7, 11]
        resblock_dilation_sizes = [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
        n_code_groups = 2
        n_codes = 1024
        codebook_loss_lambda = 1.0
        commitment_loss_lambda = 0.25

    torch.manual_seed(7)
    enc, gen, quant = TorchEncoder(H()), TorchGenerator(H()), TorchQuantizer(H())
    enc.eval(), gen.eval(), quant.eval()

    cfg = HiFiCodecConfig()
    model = VQVAE(config=cfg)
    variables = ti.import_hificodec(
        {
            "encoder": enc.state_dict(),
            "generator": gen.state_dict(),
            "quantizer": quant.state_dict(),
        }
    )

    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((1, 4800)) * 0.1).astype(np.float32)

    with torch.no_grad():
        c = enc(torch.from_numpy(wav).unsqueeze(1))
        q_ref, _, codes_list = quant(c)
        codes_ref = torch.stack([cc.reshape(1, -1) for cc in codes_list], -1).numpy()
        wav_ref = gen(quant.embed(torch.from_numpy(codes_ref.astype(np.int64)))).numpy()

    codes = jax.jit(lambda v, w: model.apply(v, w, method=VQVAE.encode))(
        variables, jnp.asarray(wav)
    )
    np.testing.assert_array_equal(np.asarray(codes), codes_ref)

    out = jax.jit(lambda v, c: model.apply(v, c, method=VQVAE.decode))(
        variables, jnp.asarray(codes_ref)
    )
    np.testing.assert_allclose(np.asarray(out), wav_ref[:, 0, :], atol=2e-4, rtol=1e-3)


def test_soundstream_forward_shapes():
    """Jitted training forward: shape contract + finite losses, no reference needed."""
    model = SoundStream(
        n_filters=4, dimension=32, ratios=(8, 5, 4, 2), sample_rate=16000,
        target_bandwidths=(1, 2, 4),
    )
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 3200)) * 0.1
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "rvq": rng}, wav, n_q=model.n_q, training=False
    )
    out, commit, codes = jax.jit(model.apply, static_argnames=("training",))(
        variables, wav, n_q=2, training=False
    )
    assert out.shape == (2, 3200)
    assert codes.shape == (model.n_q, 2, 10)
    assert np.isfinite(np.asarray(out)).all()
