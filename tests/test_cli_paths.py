"""User-facing checkpoint-loading and file-compression paths."""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from academicodec_tpu.codec.compress import SoundStreamCompressor
from academicodec_tpu.models.soundstream import SoundStream


@requires_reference
def test_compress_cli_loads_torch_pth_and_roundtrips(tmp_path):
    import torch
    from academicodec.models.encodec.net3 import SoundStream as TorchSS

    from academicodec_tpu.cli.compress import load_model_variables

    torch.manual_seed(3)
    ratios, sr, bws = (8, 5, 4, 2), 16000, (1, 1.5, 2, 4, 6, 12)
    ref = TorchSS(n_filters=4, D=32, ratios=list(ratios), sample_rate=sr,
                  target_bandwidths=list(bws))
    with torch.no_grad():
        for layer in ref.quantizer.vq.layers:
            cb = layer._codebook
            cb.embed.normal_()
            cb.embed_avg.copy_(cb.embed)
            cb.cluster_size.fill_(1.0)
            cb.inited.fill_(True)
    ref.eval()
    # save with DDP-style 'module.' prefixes, like the public checkpoints
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    pth = str(tmp_path / "model.pth")
    torch.save(sd, pth)

    model = SoundStream(n_filters=4, dimension=32, ratios=ratios, sample_rate=sr,
                        target_bandwidths=bws)
    variables = load_model_variables(pth, model)

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(4800) * 0.1).astype(np.float32)
    comp = SoundStreamCompressor(model, variables, target_bw=6)
    blob = comp.compress(wav)
    out, out_sr = comp.decompress(blob)
    assert out_sr == sr
    assert out.shape == wav.shape  # original length restored

    # tokens embedded in the stream match the reference encode
    with torch.no_grad():
        codes_ref = ref.encode(
            torch.from_numpy(wav[None, None, :]), target_bw=6
        ).numpy()
    from academicodec_tpu.codec.compress import decompress_codes

    codes, meta = decompress_codes(blob)
    np.testing.assert_array_equal(codes, codes_ref[:, 0, :])
    assert meta["model"] == "soundstream"
    # bw=6 kbps at 50 Hz frames, 0.5 kbps/codebook -> 12 codebooks
    assert codes.shape[0] == 12


def test_fold_weight_norm_preserves_outputs():
    """remove_weight_norm equivalent: folded model == weight-normed model."""
    from academicodec_tpu.utils.fold import fold_soundstream

    model = SoundStream(
        n_filters=4, dimension=32, ratios=(8, 5, 4, 2), sample_rate=16000,
        target_bandwidths=(1, 2, 4),
    )
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 3200)) * 0.1
    variables = model.init(
        {"params": rng, "rvq": rng}, wav, n_q=model.n_q, training=False
    )
    out_ref, _, codes_ref = model.apply(variables, wav, n_q=2, training=False)

    folded_model, folded_vars = fold_soundstream(model, variables)
    assert folded_model.norm == "none"
    out, _, codes = folded_model.apply(folded_vars, wav, n_q=2, training=False)
    np.testing.assert_array_equal(np.asarray(codes[:2]), np.asarray(codes_ref[:2]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5, rtol=1e-4)


def test_fold_vqvae_preserves_outputs():
    """HiFi-Codec remove_weight_norm equivalent (reference
    models.py:112-124,177-188): folded VQVAE == weight-normed VQVAE —
    identical tokens, float-close waveform."""
    from academicodec_tpu.models.hificodec import VQVAE
    from academicodec_tpu.nn.hifigan import HiFiCodecConfig
    from academicodec_tpu.utils.fold import fold_vqvae

    cfg = HiFiCodecConfig(
        upsample_rates=(5, 4, 2, 2),
        upsample_kernel_sizes=(11, 8, 4, 4),
        segment_size=4000,
    )
    model = VQVAE(config=cfg)
    rng = jax.random.PRNGKey(1)
    wav = jax.random.normal(rng, (2, 4000)) * 0.1
    variables = model.init(rng, wav, training=False)
    codes_ref = model.apply(variables, wav, method=VQVAE.encode)
    out_ref = model.apply(variables, codes_ref, method=VQVAE.decode)

    folded_model, folded_vars = fold_vqvae(model, variables)
    assert folded_model.norm == "none"
    # folded tree must contain no weight-norm params anywhere
    flat = jax.tree_util.tree_leaves_with_path(folded_vars["params"])
    assert not any("kernel_v" in jax.tree_util.keystr(p) for p, _ in flat)
    codes = folded_model.apply(folded_vars, wav, method=VQVAE.encode)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_ref))
    out = folded_model.apply(folded_vars, codes, method=VQVAE.decode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5, rtol=1e-4)
