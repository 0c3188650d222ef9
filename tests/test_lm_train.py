"""LM trainer: cross-entropy decreases on a learnable token distribution,
and the trained LM compresses better than the raw 10-bit packing bound."""

import numpy as np
import jax
import jax.numpy as jnp

from academicodec_tpu.train.lm import LMTrainConfig, LMTrainer


def test_lm_training_reduces_ce_and_beats_raw_packing():
    cfg = LMTrainConfig(n_q=2, bins=16, dim=32, num_heads=4, num_layers=1,
                        past_context=32)
    trainer = LMTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    # highly predictable stream: tokens cycle 0,1,2,3
    T, B = 32, 4
    base = jnp.arange(T) % 4
    codes = jnp.stack([jnp.stack([base, (base + 1) % 4], axis=-1)] * B).astype(jnp.int32)
    state = trainer.init_state(rng, codes)

    losses = []
    for _ in range(60):
        state, metrics = trainer.train_step(state, codes)
        losses.append(float(metrics["ce_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    # entropy bound: trained bits/token must be far below raw log2(16)=4
    assert float(metrics["bits_per_token"]) < 2.0

    # and the arithmetic coder realizes the gain end to end
    from academicodec_tpu.codec.lm_compress import (
        compress_tokens_with_lm,
        decompress_tokens_with_lm,
    )

    stream = np.asarray(codes[0].T)  # [n_q, T]
    blob = compress_tokens_with_lm(trainer.model, {"params": state.params}, stream)
    out, _ = decompress_tokens_with_lm(trainer.model, {"params": state.params}, blob)
    np.testing.assert_array_equal(out, stream)
    raw_bits = 2 * T * 4  # n_q * T * log2(bins)
    assert (len(blob) - 60) * 8 < raw_bits
