"""Bandwidth/bitrate table coverage: every recipe operating point encodes
at every advertised bandwidth with the right code count and kbps math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from academicodec_tpu.models import presets
from academicodec_tpu.models.soundstream import SoundStream


@pytest.mark.parametrize(
    "name,bw_nq",
    [
        # BASELINE.md operating points: kbps -> expected n_q
        ("encodec_16k_320d", {1: 2, 1.5: 3, 2: 4, 4: 8, 6: 12, 12: 24}),
        ("encodec_24k_240d", {1: 1, 2: 2, 4: 4, 8: 8, 12: 12}),
        ("encodec_24k_32d", {7.5: 1, 15: 2}),
    ],
)
def test_bandwidth_to_nq_table(name, bw_nq):
    m = presets.build(name, n_filters=4, dimension=32)
    for bw, n_q in bw_nq.items():
        assert m.n_q_for_bandwidth(bw) == n_q, (bw, n_q)
        # kbps identity: n_q * 10 bits * frame_rate == bw * 1000
        assert n_q * 10 * m.frame_rate == bw * 1000


def test_encode_shapes_across_bandwidths():
    m = presets.build("encodec_16k_320d", n_filters=4, dimension=32)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (1, 3200)) * 0.1
    variables = m.init({"params": rng, "rvq": rng}, wav, n_q=m.n_q, training=False)
    for bw in (1, 2, 6):
        codes = m.apply(variables, wav, target_bw=bw, method=SoundStream.encode)
        assert codes.shape == (m.n_q_for_bandwidth(bw), 1, 10)


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        presets.build("nope")
