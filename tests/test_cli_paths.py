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
    # 12 codebooks? no: bw=6 at 50 Hz frames -> 12 q? bw_per_q=0.5 -> n_q=12
    assert codes.shape[0] == 12
