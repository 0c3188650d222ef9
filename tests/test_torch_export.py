"""Torch checkpoint EXPORT (utils/torch_export.py) — reference interop.

Contracts pinned here:
  * export is the exact inverse of the importer: ``export(import(sd))``
    reproduces a real reference state_dict bit-for-bit, key-for-key
    (both families, weight-norm parametrized);
  * a model initialized HERE exports to a checkpoint the reference stack
    loads with ``load_state_dict(strict=True)`` and then produces the SAME
    tokens/audio as our forward (the actual user contract: train on TPU,
    serve on the torch stack);
  * the export CLI writes a ``torch.load``-able ``.pth`` from a framework
    orbax checkpoint.

Reference surfaces: test.py:172-178 (SoundStream load), vqvae.py:13-29
(g_* load), main_launch.py:431-451 / hificodec train.py:303-313 (save).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import requires_reference

from academicodec_tpu.models.hificodec import VQVAE
from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.nn.hifigan import HiFiCodecConfig
from academicodec_tpu.utils import torch_export as te
from academicodec_tpu.utils import torch_import as ti

# smallest config the reference stack can load: its Encoder hardcodes base
# 32 channels (models.py:370) and its Quantizer a 512 latent (models.py:448),
# so 4 stages of 2x keep latent_dim = 32 * 2^4 = 512; ResBlock1 hardcodes 3
# dilations (models.py:27-45). Generator width stays tiny.
TINY_HIFI = HiFiCodecConfig(
    upsample_rates=(2, 2, 2, 2), upsample_kernel_sizes=(4, 4, 4, 4),
    upsample_initial_channel=32, resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)), encoder_base_channels=32,
    n_code_groups=2, n_codes=32, sampling_rate=16000,
)


def _torch_hifi_modules(cfg: HiFiCodecConfig):
    import torch  # noqa: F401
    from academicodec.models.hificodec.models import (
        Encoder,
        Generator,
        Quantizer,
    )

    class H(dict):
        __getattr__ = dict.__getitem__

    h = H(
        resblock=cfg.resblock,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        n_code_groups=cfg.n_code_groups,
        n_codes=cfg.n_codes,
        codebook_loss_lambda=cfg.codebook_loss_lambda,
        commitment_loss_lambda=cfg.commitment_loss_lambda,
    )
    return Generator(h), Encoder(h), Quantizer(h)


@requires_reference
def test_soundstream_roundtrip_bit_exact():
    """export(import(sd)) == sd on a real reference state_dict."""
    import torch
    from academicodec.models.encodec.net3 import SoundStream as TorchSS

    torch.manual_seed(3)
    ref = TorchSS(
        n_filters=4, D=64, ratios=[6, 5, 4, 2], target_bandwidths=[1, 2, 4]
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    n_q = len(ref.quantizer.vq.layers)

    sd2 = te.export_soundstream(ti.import_soundstream(sd, n_q=n_q))

    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(
            np.asarray(sd[k], np.float32).reshape(np.shape(sd2[k])), sd2[k], err_msg=k
        )


@requires_reference
def test_hificodec_roundtrip_bit_exact():
    import torch

    torch.manual_seed(4)
    gen, enc, quant = _torch_hifi_modules(TINY_HIFI)
    ck = {
        "generator": {k: v.detach().numpy() for k, v in gen.state_dict().items()},
        "encoder": {k: v.detach().numpy() for k, v in enc.state_dict().items()},
        "quantizer": {k: v.detach().numpy() for k, v in quant.state_dict().items()},
    }
    ck2 = te.export_hificodec(ti.import_hificodec(ck, n_groups=2))
    for part in ("generator", "encoder", "quantizer"):
        assert set(ck2[part]) == set(ck[part]), part
        for k in ck[part]:
            np.testing.assert_array_equal(
                np.asarray(ck[part][k], np.float32), ck2[part][k],
                err_msg=f"{part}.{k}",
            )


@requires_reference
def test_our_hificodec_loads_and_matches_in_reference_stack():
    """Our random-init VQVAE -> export -> reference load_state_dict(strict)
    -> identical tokens and near-identical audio from the torch stack."""
    import torch

    model = VQVAE(config=TINY_HIFI)
    rng = np.random.default_rng(11)
    wav = (rng.standard_normal((2, 640)) * 0.2).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(5), jnp.asarray(wav))

    ck = te.export_hificodec(variables)
    gen, enc, quant = _torch_hifi_modules(TINY_HIFI)
    gen.load_state_dict(te.to_torch(ck["generator"]), strict=True)
    enc.load_state_dict(te.to_torch(ck["encoder"]), strict=True)
    quant.load_state_dict(te.to_torch(ck["quantizer"]), strict=True)
    gen.eval(), enc.eval(), quant.eval()

    codes = np.asarray(
        jax.jit(lambda v, w: model.apply(v, w, method=VQVAE.encode))(
            variables, jnp.asarray(wav)
        )
    )
    out = np.asarray(
        jax.jit(lambda v, c: model.apply(v, c, method=VQVAE.decode))(
            variables, jnp.asarray(codes)
        )
    )

    with torch.no_grad():
        c = enc(torch.from_numpy(wav).unsqueeze(1))
        _, _, codes_list = quant(c)
        codes_ref = (
            torch.stack([cc.reshape(2, -1) for cc in codes_list], -1).numpy()
        )
        wav_ref = gen(
            quant.embed(torch.from_numpy(codes.astype(np.int64)))
        ).numpy()

    np.testing.assert_array_equal(codes, codes_ref)
    np.testing.assert_allclose(out, wav_ref[:, 0, :], atol=2e-4, rtol=1e-3)


@requires_reference
def test_our_soundstream_loads_and_matches_in_reference_stack():
    import torch
    from academicodec.models.encodec.net3 import SoundStream as TorchSS

    ratios, sr, bws = (8, 5, 4, 2), 16000, (1, 2, 4)
    model = SoundStream(
        n_filters=4, dimension=32, ratios=ratios, sample_rate=sr,
        target_bandwidths=bws,
    )
    rng = np.random.default_rng(13)
    wav = (rng.standard_normal((2, 3200)) * 0.2).astype(np.float32)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(2), "rvq": jax.random.PRNGKey(3)},
        jnp.asarray(wav), n_q=model.n_q, training=False,
    )
    # make the codebooks nontrivial/tie-free on BOTH sides: random embeds,
    # marked initialized (EMA state is exported like any other buffer)
    vq = variables["codebook"]["quantizer"]["vq"]
    embed = rng.standard_normal(np.shape(vq["embed"])).astype(np.float32)
    variables = {
        **variables,
        "codebook": {"quantizer": {"vq": {
            "embed": jnp.asarray(embed),
            "embed_avg": jnp.asarray(embed),
            "cluster_size": jnp.ones_like(jnp.asarray(vq["cluster_size"])),
            "inited": jnp.ones(np.shape(vq["inited"]), bool),
        }}},
    }

    sd = te.export_soundstream(variables)
    ref = TorchSS(
        n_filters=4, D=32, ratios=list(ratios), sample_rate=sr,
        target_bandwidths=list(bws),
    )
    ref.load_state_dict(te.to_torch(sd), strict=True)
    ref.eval()

    enc_fn = jax.jit(
        lambda v, w: model.apply(v, w, target_bw=bws[-1], method=SoundStream.encode)
    )
    codes = np.asarray(enc_fn(variables, jnp.asarray(wav)))
    out = np.asarray(
        jax.jit(lambda v, c: model.apply(v, c, method=SoundStream.decode))(
            variables, jnp.asarray(codes)
        )
    )

    with torch.no_grad():
        codes_ref = ref.encode(
            torch.from_numpy(wav).unsqueeze(1), target_bw=bws[-1]
        ).numpy()
        out_ref = ref.decode(torch.from_numpy(codes)).numpy()

    np.testing.assert_array_equal(codes, codes_ref)
    np.testing.assert_allclose(out, out_ref[:, 0, :], atol=1e-4, rtol=1e-3)


@requires_reference
def test_export_cli_writes_loadable_pth(tmp_path, monkeypatch):
    import sys

    import torch

    from academicodec_tpu.cli import export_torch as cli
    from academicodec_tpu.utils.checkpoint import save_checkpoint

    model = VQVAE(config=TINY_HIFI)
    wav = jnp.asarray(
        (np.random.default_rng(0).standard_normal((1, 320)) * 0.2).astype(np.float32)
    )
    v = model.init(jax.random.PRNGKey(0), wav)
    g_extra = {k: vv for k, vv in v.items() if k != "params"}
    save_checkpoint(
        str(tmp_path), "g", 0,
        {"g_params": jax.device_get(v["params"]),
         "g_extra": jax.device_get(g_extra)},
    )
    out = str(tmp_path / "g_export.pth")
    monkeypatch.setattr(
        sys, "argv",
        ["export_torch", "--family", "hificodec",
         "--ckpt", str(tmp_path / "g_00000000"), "--out", out],
    )
    cli.main()

    ck = torch.load(out, map_location="cpu", weights_only=True)
    assert set(ck) == {"generator", "encoder", "quantizer"}
    gen, enc, quant = _torch_hifi_modules(TINY_HIFI)
    gen.load_state_dict(ck["generator"], strict=True)
    enc.load_state_dict(ck["encoder"], strict=True)
    quant.load_state_dict(ck["quantizer"], strict=True)
