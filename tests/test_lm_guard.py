"""Per-stream LM expansion guard + GRVQ (HiFi-Codec) token entropy coding.

The measured failure mode this guards: an LM fed streams longer than its
training crop codes at MORE bits/token than raw packing (a 1 s-crop LM hit
11.0 bits/token on 5 s streams vs 10-bit raw — BENCHMARKS.md "LM entropy
coding"). ``compress_tokens_guarded`` must therefore never emit a blob
larger than raw packing, and mixed raw/LM outputs must stay decodable via
the per-blob header's ``lm`` flag.

GRVQ coverage: the token-LM stack (cli/train_lm.py --family hificodec +
cli/extract_tokens.py --tokens_ecdc --lm) over the HiFi-Codec 4-stream
[B,T,4] token contract (reference vqvae.py:43-45).
"""

import glob
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from academicodec_tpu.codec.compress import (
    compress_codes,
    compress_tokens_guarded,
    decompress_tokens,
)
from academicodec_tpu.models.lm import RVQTokenLM


def _untrained_lm(n_q=2, bins=64):
    lm = RVQTokenLM(n_q=n_q, bins=bins, dim=16, num_heads=2, num_layers=1,
                    past_context=32)
    variables = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, n_q), jnp.int32))
    return lm, variables


def test_guard_plumbing_selects_smaller(monkeypatch):
    import academicodec_tpu.codec.lm_compress as lmc

    codes = np.random.default_rng(0).integers(0, 64, (2, 50)).astype(np.int32)
    sentinel = object()
    monkeypatch.setattr(
        lmc, "compress_tokens_with_lm",
        lambda lm, v, c, metadata=None: b"tiny-lm-blob",
    )
    out = compress_tokens_guarded(
        codes, bits_per_codebook=6, metadata={}, lm=sentinel, lm_variables=None
    )
    assert out == b"tiny-lm-blob"
    # an expanding LM coding loses to raw packing
    raw = compress_codes(codes, bits_per_codebook=6, metadata={})
    monkeypatch.setattr(
        lmc, "compress_tokens_with_lm",
        lambda lm, v, c, metadata=None: b"\0" * (len(raw) + 1),
    )
    out = compress_tokens_guarded(
        codes, bits_per_codebook=6, metadata={}, lm=sentinel, lm_variables=None
    )
    assert out == raw


def test_untrained_lm_falls_back_to_raw_and_decodes_without_lm():
    """An untrained LM on uniform-random codes cannot beat raw packing
    (coded rate >= the stream entropy = the packed width), so the guard
    must emit the raw blob — which then decodes WITHOUT any LM at all."""
    lm, variables = _untrained_lm()
    codes = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (2, 60), 0, 64), np.int32
    )
    blob = compress_tokens_guarded(
        codes, bits_per_codebook=6, metadata={"sr": 16000},
        lm=lm, lm_variables=variables,
    )
    raw = compress_codes(codes, bits_per_codebook=6, metadata={"sr": 16000})
    assert blob == raw  # the guard refused the expanding LM coding
    out, meta = decompress_tokens(blob)  # no lm passed: raw path
    np.testing.assert_array_equal(out, codes)
    assert not meta.get("lm")
    # ... and a reader configured WITH the LM handles it identically
    out2, _ = decompress_tokens(blob, lm=lm, lm_variables=variables)
    np.testing.assert_array_equal(out2, codes)


def test_winning_lm_coding_is_kept():
    """When the LM genuinely compresses (peaked heads, predictable stream)
    the guard keeps the LM blob and the header flag routes decoding."""
    n_q, bins, T = 2, 32, 64
    lm = RVQTokenLM(n_q=n_q, bins=bins, dim=32, num_heads=4, num_layers=1,
                    past_context=64)
    variables = lm.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, n_q), jnp.int32))
    params = dict(variables["params"])
    for q in range(n_q):
        b = np.array(params[f"head_{q}"]["bias"])
        b[0] += 8.0
        params[f"head_{q}"]["bias"] = jnp.asarray(b)
    variables = {"params": params}

    codes = np.zeros((n_q, T), np.int32)
    blob = compress_tokens_guarded(
        codes, bits_per_codebook=5, metadata={}, lm=lm, lm_variables=variables
    )
    raw = compress_codes(codes, bits_per_codebook=5, metadata={})
    assert len(blob) < len(raw)
    out, meta = decompress_tokens(blob, lm=lm, lm_variables=variables)
    np.testing.assert_array_equal(out, codes)
    assert meta["lm"] is True
    with pytest.raises(ValueError, match="LM-entropy-coded"):
        decompress_tokens(blob)


@pytest.mark.slow
def test_grvq_lm_e2e(tmp_path, monkeypatch):
    """train_lm --family hificodec -> extract_tokens --tokens_ecdc --lm:
    the GRVQ 4-stream LM pipeline end to end on a tiny VQVAE.

    Runs subprocess-isolated: the VQVAE + LM-trainer + CLI compile chain
    adds enough in-process XLA:CPU state to tip later big-graph compiles
    into the known state-dependent segfault (CLAUDE.md isolation note)."""
    from conftest import reinvoke_isolated

    if not reinvoke_isolated(__file__, "test_grvq_lm_e2e", "ACT_GRVQ_E2E_INNER"):
        return
    from academicodec_tpu.cli import extract_tokens as et_cli
    from academicodec_tpu.cli import train_lm
    from academicodec_tpu.data.wavio import write_wav
    from academicodec_tpu.models.hificodec import VQVAE
    from academicodec_tpu.nn.hifigan import HiFiCodecConfig
    from academicodec_tpu.utils.checkpoint import save_checkpoint

    sr = 16000
    cfg_dict = dict(
        upsample_rates=[5, 4, 2, 2], upsample_kernel_sizes=[11, 8, 4, 4],
        encoder_base_channels=8, upsample_initial_channel=128, n_codes=64,
        sampling_rate=sr, segment_size=3200,
    )
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg_dict, fh)
    cfg = HiFiCodecConfig.from_json(cfg_dict)
    model = VQVAE(config=cfg)
    rng = jax.random.PRNGKey(2)
    variables = model.init(rng, jax.random.normal(rng, (1, 3200)) * 0.1,
                           training=False)
    ckpt_dir = str(tmp_path / "codec")
    save_checkpoint(ckpt_dir, "g", 1, jax.device_get(variables))
    ckpt = glob.glob(os.path.join(ckpt_dir, "g_*"))[0]

    data_dir = tmp_path / "wavs"
    data_dir.mkdir()
    t = np.arange(3200) / sr
    for i in range(6):
        wav = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
        write_wav(str(data_dir / f"tone{i}.wav"), wav, sr)

    lm_dir = str(tmp_path / "lm")
    monkeypatch.setattr(sys, "argv", [
        "train_lm", "--family", "hificodec", "--hifi_config", cfg_path,
        "--train_data_path", str(data_dir), "--resume_path", ckpt,
        "--lm_dim", "32", "--lm_heads", "4", "--lm_layers", "1",
        "--past_context", "64", "--steps", "25", "--batch_size", "4",
        "--segment_seconds", "0.2", "--checkpoint_interval", "1000",
        "--path", lm_dir,
    ])
    train_lm.main()
    lm_cfg = json.load(open(os.path.join(lm_dir, "lm_config.json")))
    assert lm_cfg["family"] == "hificodec"
    assert lm_cfg["n_q"] == 4 and lm_cfg["bins"] == 64
    assert lm_cfg["trained_frames"] == 3200 // 80  # hop = prod(upsample_rates)

    out_dir = str(tmp_path / "out")
    ecdc_dir = str(tmp_path / "ecdc")
    npz_path = str(tmp_path / "tokens.npz")
    monkeypatch.setattr(sys, "argv", [
        "extract_tokens", "--config", cfg_path, "--model_path", ckpt,
        "--input", str(data_dir), "--outputdir", out_dir, "--no_synth",
        "--tokens_out", npz_path, "--tokens_ecdc", ecdc_dir, "--lm", lm_dir,
        "--sample_rate", str(sr),
    ])
    et_cli.main()

    # every blob decodes back to the exact [T, 4]->[4, T] token stream
    from academicodec_tpu.cli.train_lm import load_lm

    lm, lm_vars, _ = load_lm(lm_dir)
    tokens = np.load(npz_path)
    for fid in tokens.files:
        blob = open(os.path.join(ecdc_dir, fid + ".ecdc"), "rb").read()
        codes, meta = decompress_tokens(blob, lm=lm, lm_variables=lm_vars)
        np.testing.assert_array_equal(codes, tokens[fid][0].T)
        assert meta["model"] == "hificodec"
        # guard invariant: never larger than raw 6-bit packing
        raw = compress_codes(tokens[fid][0].T.astype(np.int32),
                             bits_per_codebook=6,
                             metadata=dict(model="hificodec", sr=sr))
        assert len(blob) <= len(raw)


@pytest.mark.slow
def test_extract_tokens_lm_mismatch_exits(tmp_path, monkeypatch):
    """A family-mismatched LM checkpoint is rejected with a clear error."""
    from academicodec_tpu.cli import extract_tokens as et_cli

    lm_dir = tmp_path / "lm"
    lm_dir.mkdir()
    with open(lm_dir / "lm_config.json", "w") as fh:
        json.dump(dict(n_q=3, bins=64, dim=16, num_heads=2, num_layers=1,
                       past_context=32, family="encodec"), fh)
    # a dummy orbax ckpt so load_lm finds one
    from academicodec_tpu.models.lm import RVQTokenLM
    from academicodec_tpu.utils.checkpoint import save_checkpoint

    lm = RVQTokenLM(n_q=3, bins=64, dim=16, num_heads=2, num_layers=1,
                    past_context=32)
    v = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 3), jnp.int32))
    save_checkpoint(str(lm_dir), "lm", 1, jax.device_get(v))

    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as fh:
        json.dump(dict(upsample_rates=[5, 4, 2, 2],
                       upsample_kernel_sizes=[11, 8, 4, 4],
                       encoder_base_channels=8, upsample_initial_channel=128,
                       n_codes=64, sampling_rate=16000), fh)
    monkeypatch.setattr(sys, "argv", [
        "extract_tokens", "--config", cfg_path, "--model_path", "unused",
        "--input", "unused", "--outputdir", str(tmp_path / "o"), "--no_synth",
        "--tokens_ecdc", str(tmp_path / "e"), "--lm", str(lm_dir),
    ])
    with pytest.raises(SystemExit, match="encodec"):
        et_cli.main()
