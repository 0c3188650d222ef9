"""extract_tokens CLI e2e with --packed_conv: packed serving produces the
same token .npz and synthesized wavs as the plain path (tiny config)."""

from __future__ import annotations

import json
import os
import sys

import jax
import numpy as np

from academicodec_tpu.data.wavio import write_wav


def _run_cli(argv, monkeypatch):
    from academicodec_tpu.cli import extract_tokens

    monkeypatch.setattr(sys, "argv", ["extract_tokens"] + argv)
    extract_tokens.main()


def test_extract_tokens_packed_matches_plain(tmp_path, monkeypatch):
    cfg = {
        "resblock": "1",
        "upsample_rates": [2, 2, 2, 2],
        "upsample_kernel_sizes": [4, 4, 4, 4],
        "upsample_initial_channel": 256,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 2]],
        "encoder_base_channels": 16,
        "n_code_groups": 2,
        "n_codes": 64,
        "sampling_rate": 16000,
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    # a trained-checkpoint stand-in: random init saved via the orbax helper
    from academicodec_tpu.models.hificodec import VQVAE
    from academicodec_tpu.nn.hifigan import HiFiCodecConfig
    from academicodec_tpu.utils.checkpoint import save_checkpoint

    model = VQVAE(config=HiFiCodecConfig.from_json(cfg))
    wav0 = np.random.default_rng(0).standard_normal(800).astype(np.float32) * 0.3
    variables = model.init({"params": jax.random.PRNGKey(0)}, wav0[None, :])
    ckpt_dir = tmp_path / "ckpt"
    save_checkpoint(str(ckpt_dir), "g", 0, dict(variables))

    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir)
    for i in range(2):
        w = np.random.default_rng(i + 1).standard_normal(1203).astype(np.float32) * 0.4
        write_wav(str(wav_dir / f"u{i}.wav"), w, 16000)

    outs = {}
    for tag, extra in (("plain", []), ("packed", ["--packed_conv"])):
        outdir = tmp_path / f"out_{tag}"
        _run_cli(
            [
                "--config", str(cfg_path),
                "--model_path", str(ckpt_dir / "g_00000000"),
                "--input", str(wav_dir),
                "--outputdir", str(outdir),
                "--tokens_out", str(tmp_path / f"tok_{tag}.npz"),
                "--sample_rate", "16000",
            ]
            + extra,
            monkeypatch,
        )
        outs[tag] = np.load(tmp_path / f"tok_{tag}.npz")

    for fid in outs["plain"].files:
        np.testing.assert_array_equal(outs["packed"][fid], outs["plain"][fid])
        from academicodec_tpu.data.wavio import read_wav

        a, _ = read_wav(str(tmp_path / "out_plain" / f"{fid}.wav"), sr=16000)
        b, _ = read_wav(str(tmp_path / "out_packed" / f"{fid}.wav"), sr=16000)
        np.testing.assert_allclose(b, a, atol=2e-4)  # through int16 wav IO

    # --int8_min_channels: W8A8 serving e2e (calibrates on the first file);
    # output is 8-bit-quantized so tokens/wavs may differ — assert it runs,
    # shapes match, and the synthesized audio stays close to full precision
    outdir = tmp_path / "out_int8"
    _run_cli(
        [
            "--config", str(cfg_path),
            "--model_path", str(ckpt_dir / "g_00000000"),
            "--input", str(wav_dir),
            "--outputdir", str(outdir),
            "--tokens_out", str(tmp_path / "tok_int8.npz"),
            "--sample_rate", "16000",
            "--int8_min_channels", "32",
        ],
        monkeypatch,
    )
    toks_q = np.load(tmp_path / "tok_int8.npz")
    for fid in outs["plain"].files:
        assert toks_q[fid].shape == outs["plain"][fid].shape
        from academicodec_tpu.data.wavio import read_wav

        a, _ = read_wav(str(tmp_path / "out_plain" / f"{fid}.wav"), sr=16000)
        b, _ = read_wav(str(outdir / f"{fid}.wav"), sr=16000)
        assert np.all(np.isfinite(b))
        rel = np.linalg.norm(b - a) / max(np.linalg.norm(a), 1e-9)
        assert rel < 0.5, rel  # random-init net, 8-bit path; loose sanity
