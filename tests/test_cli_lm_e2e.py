"""End-to-end LM-compression CLI path: train a tiny token LM with
``cli.train_lm``, then round-trip wavs through ``cli.compress --lm``.

The API layer (codec/lm_compress.py) is covered in tests/test_lm_compress.py;
this pins the user-facing surface: LM checkpoint format (orbax dir +
lm_config.json), header ``lm`` flag interop, and the exact-token round trip
through both CLIs.
"""

import glob
import os
import sys

import numpy as np
import pytest

from academicodec_tpu.data.wavio import read_wav, write_wav


@pytest.mark.slow
def test_train_lm_then_compress_with_lm(tmp_path, monkeypatch):
    import jax

    from academicodec_tpu.cli import compress as compress_cli
    from academicodec_tpu.cli import train_lm
    from academicodec_tpu.models.soundstream import SoundStream
    from academicodec_tpu.utils.checkpoint import save_checkpoint

    # --- a tiny random codec checkpoint the CLIs can load ---
    ratios, sr, bws = (8, 5, 4, 2), 16000, (1.0, 2.0)
    model = SoundStream(
        n_filters=4, dimension=32, ratios=ratios, sample_rate=sr,
        target_bandwidths=bws, bins=64,
    )
    rng = jax.random.PRNGKey(0)
    wav0 = np.zeros((1, 3200), np.float32)
    variables = model.init({"params": rng, "rvq": rng}, wav0, n_q=model.n_q,
                           training=False)
    codec_dir = str(tmp_path / "codec")
    save_checkpoint(codec_dir, "best", 1, jax.device_get(variables))
    codec_ckpt = glob.glob(os.path.join(codec_dir, "best_*"))[0]

    # --- training data: predictable tones so the LM learns something ---
    data_dir = tmp_path / "wavs"
    data_dir.mkdir()
    t = np.arange(3200) / sr
    for i in range(8):
        wav = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
        write_wav(str(data_dir / f"tone{i}.wav"), wav, sr)

    lm_dir = str(tmp_path / "lm")
    common_codec = [
        "--sr", str(sr), "--ratios", "8", "5", "4", "2",
        "--target_bandwidths", "1", "2",
        "--n_filters", "4", "--dimension", "32", "--bins", "64",
        "--target_bw", "2",
    ]
    monkeypatch.setattr(sys, "argv", [
        "train_lm", "--train_data_path", str(data_dir),
        "--resume_path", codec_ckpt, *common_codec,
        "--lm_dim", "32", "--lm_heads", "4", "--lm_layers", "1",
        "--past_context", "32", "--steps", "30", "--batch_size", "4",
        "--segment_seconds", "0.2", "--checkpoint_interval", "1000",
        "--path", lm_dir,
    ])
    train_lm.main()
    assert os.path.exists(os.path.join(lm_dir, "lm_config.json"))
    assert glob.glob(os.path.join(lm_dir, "lm_*0030"))
    log = open(os.path.join(lm_dir, "logs", "log.txt")).read()
    assert "bits/token" in log

    # --- compress CLI with --lm: round-trip + smaller than raw packing ---
    out_lm = str(tmp_path / "out_lm")
    monkeypatch.setattr(sys, "argv", [
        "compress", "--input", str(data_dir), "--output", out_lm,
        "--resume_path", codec_ckpt, *common_codec, "--ecdc", "--lm", lm_dir,
    ])
    compress_cli.main()
    out_raw = str(tmp_path / "out_raw")
    monkeypatch.setattr(sys, "argv", [
        "compress", "--input", str(data_dir), "--output", out_raw,
        "--resume_path", codec_ckpt, *common_codec, "--ecdc",
    ])
    compress_cli.main()

    # reconstructions decode and match between the two coding paths exactly
    # (same tokens, same decoder — only the bitstream coding differs)
    w_lm, _ = read_wav(os.path.join(out_lm, "tone0.wav"))
    w_raw, _ = read_wav(os.path.join(out_raw, "tone0.wav"))
    np.testing.assert_array_equal(w_lm, w_raw)

    # the trained LM beats raw 6-bit packing on this predictable stream
    sz_lm = os.path.getsize(os.path.join(out_lm, "tone0.ecdc"))
    sz_raw = os.path.getsize(os.path.join(out_raw, "tone0.ecdc"))
    assert sz_lm < sz_raw, (sz_lm, sz_raw)

    # and the LM-coded file decodes through a fresh compressor given the LM
    from academicodec_tpu.cli.train_lm import load_lm
    from academicodec_tpu.codec.compress import SoundStreamCompressor

    lm, lm_vars, lm_meta = load_lm(lm_dir)
    # 0.2 s crops at hop 320 = 10 frames, recorded for the length warning
    assert lm_meta.get("trained_frames") == 10, lm_meta
    variables2 = compress_cli.load_model_variables(codec_ckpt, model)
    comp = SoundStreamCompressor(model, variables2, target_bw=2,
                                 lm=lm, lm_variables=lm_vars)
    blob = open(os.path.join(out_lm, "tone0.ecdc"), "rb").read()
    wav_out, sr_out = comp.decompress(blob)
    assert sr_out == sr and wav_out.shape == (3200,)

    # raw-path compressor refuses LM streams with a clear error
    comp_raw = SoundStreamCompressor(model, variables2, target_bw=2)
    with pytest.raises(ValueError, match="LM-entropy-coded"):
        comp_raw.decompress(blob)
