"""Fused Pallas RVQ kernel vs the scan-based reference path (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from academicodec_tpu.ops.pallas.rvq import rvq_encode_fused, rvq_encode_fused_btd
from academicodec_tpu.quant.core_vq import ResidualVQ


def _state(rng, n_q, bins, dim):
    embed = rng.standard_normal((n_q, bins, dim)).astype(np.float32)
    return {
        "embed": jnp.asarray(embed),
        "embed_avg": jnp.asarray(embed.copy()),
        "cluster_size": jnp.ones((n_q, bins), jnp.float32),
        "inited": jnp.ones((n_q,), bool),
    }


def test_fused_rvq_matches_scan_path():
    n_q, bins, dim = 4, 128, 64
    rng = np.random.default_rng(0)
    state = _state(rng, n_q, bins, dim)
    x = rng.standard_normal((2, 100, dim)).astype(np.float32)

    mod = ResidualVQ(num_quantizers=n_q, dim=dim, codebook_size=bins)
    ref_codes = mod.apply({"codebook": state}, jnp.asarray(x), method=ResidualVQ.encode)

    codes = rvq_encode_fused_btd(
        jnp.asarray(x), state["embed"], tile=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref_codes))


def test_fused_rvq_pads_ragged_n():
    n_q, bins, dim = 2, 64, 32
    rng = np.random.default_rng(1)
    state = _state(rng, n_q, bins, dim)
    x = rng.standard_normal((75, dim)).astype(np.float32)  # not a tile multiple
    codes = rvq_encode_fused(jnp.asarray(x), state["embed"], tile=32, interpret=True)
    assert codes.shape == (n_q, 75)

    mod = ResidualVQ(num_quantizers=n_q, dim=dim, codebook_size=bins)
    ref = mod.apply(
        {"codebook": state}, jnp.asarray(x)[None], method=ResidualVQ.encode
    )[:, 0, :]
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref))
