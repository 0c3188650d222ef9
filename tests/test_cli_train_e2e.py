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

    # the latest checkpoint carries the epoch in sidecar metadata
    from academicodec_tpu.utils.checkpoint import (
        load_checkpoint_meta,
        scan_checkpoint,
    )

    latest = scan_checkpoint(out_dir, "latest")
    assert load_checkpoint_meta(latest) == {"epoch": 1}

    # ---- resume: restart mid-training, continue at the recorded epoch with
    # the decayed lr and that epoch's data order (VERDICT r2 #8) ----
    steps_before = int(os.path.basename(latest).split("_")[-1])
    argv_resume = list(argv)
    argv_resume[argv_resume.index("--n_epochs") + 1] = "1"
    monkeypatch.setattr(sys, "argv", argv_resume + ["--resume"])
    train_encodec.main()
    log = open(os.path.join(out_dir, "logs", "log.txt")).read()
    assert ", epoch 1" in log  # resumed at the NEXT epoch, not a replay
    assert "epoch 1 step" in log  # and actually trained in it
    latest2 = scan_checkpoint(out_dir, "latest")
    assert int(os.path.basename(latest2).split("_")[-1]) > steps_before
    assert load_checkpoint_meta(latest2) == {"epoch": 2}
