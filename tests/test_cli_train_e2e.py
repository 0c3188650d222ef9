"""End-to-end training CLI smoke: synthetic wavs -> 1 epoch -> checkpoints.

Runs the real ``cli.train_encodec.main()`` in-process with the debug-tiny
configuration (same trainer config and batch shapes as tests/test_train.py,
so the jitted steps hit the persistent compile cache).
"""

import glob
import os
import sys

import numpy as np
import pytest

from academicodec_tpu.data.wavio import write_wav


def test_train_encodec_cli_one_epoch(tmp_path, monkeypatch):
    from academicodec_tpu.cli import train_encodec

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "wavs"
    data_dir.mkdir()
    for i in range(16):
        t = np.arange(6400) / 16000.0
        wav = (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        write_wav(str(data_dir / f"tone{i}.wav"), wav, 16000)

    out_dir = str(tmp_path / "ckpt")
    argv = [
        "train_encodec",
        "--train_data_path", str(data_dir),
        "--valid_data_path", str(data_dir),
        "--path", out_dir,
        "--sr", "16000",
        "--ratios", "8", "5", "4", "2",
        "--target_bandwidths", "1", "2", "4",
        "--batch_size", "8",  # divisible over the 8 virtual devices
        "--segment_seconds", "0.2",  # 3200 samples — matches test_train shapes
        "--n_epochs", "0",  # single epoch (range is start..n_epochs inclusive)
        "--n_filters", "4",
        "--dimension", "32",
        "--bins", "64",
        "--discriminator_iter_start", "1",
        "--debug_tiny_discs",
        "--print_freq", "1",
        "--checkpoint_interval", "1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train_encodec.main()

    # checkpoints + logs exist
    assert glob.glob(os.path.join(out_dir, "latest_*")), "no checkpoint written"
    log = open(os.path.join(out_dir, "logs", "log.txt")).read()
    assert "loss_g" in log and "valid" in log
