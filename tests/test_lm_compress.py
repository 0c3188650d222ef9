"""LM-based entropy coding: exact token round-trip with carried LM state."""

import numpy as np
import jax
import jax.numpy as jnp

from academicodec_tpu.codec.lm_compress import (
    compress_tokens_with_lm,
    decompress_tokens_with_lm,
)
from academicodec_tpu.models.lm import RVQTokenLM


def test_lm_entropy_roundtrip():
    n_q, bins, T = 4, 32, 23
    lm = RVQTokenLM(n_q=n_q, bins=bins, dim=32, num_heads=4, num_layers=2,
                    past_context=64)
    rng = jax.random.PRNGKey(0)
    variables = lm.init(rng, jnp.zeros((1, 3, n_q), jnp.int32))

    codes = np.asarray(
        jax.random.randint(rng, (n_q, T), 0, bins), dtype=np.int32
    )
    blob = compress_tokens_with_lm(lm, variables, codes, metadata={"sr": 16000})
    out, meta = decompress_tokens_with_lm(lm, variables, blob)
    np.testing.assert_array_equal(out, codes)
    assert meta["sr"] == 16000 and meta["lm"] is True


def test_lm_compresses_predictable_streams():
    """A peaked (trained-like) distribution should beat raw 5-bit packing.
    We fake 'trained' by biasing the LM head toward symbol 0 and feeding a
    mostly-zero stream."""
    n_q, bins, T = 2, 32, 64
    lm = RVQTokenLM(n_q=n_q, bins=bins, dim=32, num_heads=4, num_layers=1,
                    past_context=64)
    rng = jax.random.PRNGKey(1)
    variables = lm.init(rng, jnp.zeros((1, 2, n_q), jnp.int32))
    # bias both heads strongly toward symbol 0
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    for q in range(n_q):
        b = np.array(params[f"head_{q}"]["bias"])
        b[0] += 8.0
        params[f"head_{q}"]["bias"] = jnp.asarray(b)
    variables = {"params": params}

    codes = np.zeros((n_q, T), np.int32)  # perfectly predictable stream
    blob = compress_tokens_with_lm(lm, variables, codes)
    out, _ = decompress_tokens_with_lm(lm, variables, blob)
    np.testing.assert_array_equal(out, codes)
    raw_bits = n_q * T * 5  # 5-bit raw packing
    # payload (minus ~60-byte header) must be well under raw size
    assert (len(blob) - 60) * 8 < raw_bits
