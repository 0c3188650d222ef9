"""Preset factory: every named operating point builds and has the expected
derived quantities (frame rates, n_q, token rates — BASELINE.md table)."""

import numpy as np
import pytest

from academicodec_tpu.models import presets
from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.models.hificodec import VQVAE


def test_preset_names_cover_all_recipes():
    assert set(presets.names()) == {
        "encodec_16k_320d",
        "encodec_24k_240d",
        "encodec_24k_32d",
        "soundstream_24k_240d",
        "hificodec_24k_320d",
        "hificodec_16k_320d",
        "hificodec_24k_240d",
    }


@pytest.mark.parametrize(
    "name,hop,frame_rate,n_q",
    [
        ("encodec_16k_320d", 320, 50, 24),
        ("encodec_24k_240d", 240, 100, 12),
        ("encodec_24k_32d", 32, 750, 2),
    ],
)
def test_encodec_operating_points(name, hop, frame_rate, n_q):
    m = presets.build(name)
    assert isinstance(m, SoundStream)
    assert m.hop_length == hop
    assert m.frame_rate == frame_rate
    assert m.n_q == n_q  # reference net3.py:25-26 derivation


@pytest.mark.parametrize(
    "name,hop", [("hificodec_24k_320d", 320), ("hificodec_24k_240d", 240)]
)
def test_hificodec_operating_points(name, hop):
    m = presets.build(name)
    assert isinstance(m, VQVAE)
    assert m.hop_length == hop
    # 4 token streams of 10 bits (readme.md:33: 4 codebooks)
    assert m.config.n_code_groups * 2 == 4
    assert int(np.log2(m.config.n_codes)) == 10
