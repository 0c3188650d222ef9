"""Property tests for the streaming padding math (exact-length reconstruction)."""

import numpy as np
import jax.numpy as jnp
import pytest

from academicodec_tpu.ops import padding as P


RATIO_SETS = [(8, 5, 4, 2), (6, 5, 4, 2), (2, 2, 2, 4)]


@pytest.mark.parametrize("length", [7, 24000, 16000, 12345, 101])
@pytest.mark.parametrize("k,s", [(7, 1), (16, 8), (10, 5), (8, 4), (4, 2), (3, 1)])
def test_extra_padding_makes_last_window_full(length, k, s):
    padding_total = (k - 1) - (s - 1)
    extra = P.get_extra_padding_for_conv1d(length, k, s, padding_total)
    assert extra >= 0
    padded = length + padding_total + extra
    # framing is exact: (padded - k) divisible by stride
    assert (padded - k) % s == 0


@pytest.mark.parametrize("ratios", RATIO_SETS)
@pytest.mark.parametrize("length", [24000, 16000, 8192, 12001])
def test_downsample_frame_count_is_ceil(ratios, length):
    """The encoder produces ceil(T / hop) frames for every recipe ratio set."""
    hop = int(np.prod(ratios))
    t = length
    for r in reversed(ratios):
        k, s = 2 * r, r
        padding_total = (k - 1) - (s - 1)
        extra = P.get_extra_padding_for_conv1d(t, k, s, padding_total)
        t = (t + padding_total + extra - k) // s + 1
    assert t == -(-length // hop)


def test_pad1d_reflect_short_input_guard():
    x = jnp.arange(3.0).reshape(1, 3, 1)
    y = P.pad1d(x, (5, 5), mode="reflect")
    assert y.shape == (1, 13, 1)
    # matches torch reflect after zero-extension (verified against reference
    # conv.py:90-111 semantics in test_conv_parity)
    assert np.isfinite(np.asarray(y)).all()


def test_unpad1d():
    x = jnp.arange(10.0).reshape(1, 10, 1)
    y = P.unpad1d(x, (2, 3))
    assert y.shape == (1, 5, 1)
    assert np.allclose(np.asarray(y)[0, :, 0], [2, 3, 4, 5, 6])
