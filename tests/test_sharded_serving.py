"""Data-parallel SERVING equivalence: sharding the batch over the device
mesh must not change tokens or waveforms (the multi-chip deployment mode
for batch tokenization/synthesis; training DP is covered in test_train)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.parallel import make_mesh, shard_batch


def test_sharded_encode_decode_equals_unsharded():
    model = SoundStream(
        n_filters=4, dimension=32, ratios=(8, 5, 4, 2), sample_rate=16000,
        target_bandwidths=(1, 2, 4), bins=64,
    )
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (8, 16000)) * 0.1
    variables = model.init(
        {"params": rng, "rvq": rng}, wav[:1], n_q=model.n_q, training=False
    )

    codes_ref = model.apply(variables, wav, target_bw=4, method=SoundStream.encode)
    out_ref = model.apply(variables, codes_ref, method=SoundStream.decode)

    mesh = make_mesh()
    assert np.prod(list(mesh.shape.values())) == 8  # conftest: 8 virtual devices
    wav_sharded = shard_batch(np.asarray(wav), mesh)
    enc = jax.jit(
        lambda v, w: model.apply(v, w, target_bw=4, method=SoundStream.encode)
    )
    dec = jax.jit(lambda v, c: model.apply(v, c, method=SoundStream.decode))
    codes = enc(variables, wav_sharded)
    out = dec(variables, codes)

    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_ref))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), atol=1e-5, rtol=1e-5
    )
