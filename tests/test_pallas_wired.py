"""rvq_use_pallas flag: kernel-backed encode matches the scan path
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from academicodec_tpu.models.soundstream import SoundStream


def test_rvq_use_pallas_flag_encode_matches():
    kw = dict(
        n_filters=4, dimension=32, ratios=(8, 5, 4, 2), sample_rate=16000,
        target_bandwidths=(1, 2, 4),
    )
    base = SoundStream(**kw)
    fast = SoundStream(**kw, rvq_use_pallas=True)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 3200)) * 0.1
    variables = base.init(
        {"params": rng, "rvq": rng}, wav, n_q=base.n_q, training=False
    )
    cb = variables["codebook"]["quantizer"]["vq"]
    emb = jax.random.normal(rng, cb["embed"].shape)
    variables = {
        "params": variables["params"],
        "codebook": {"quantizer": {"vq": {
            "embed": emb, "embed_avg": emb,
            "cluster_size": jnp.ones_like(cb["cluster_size"]),
            "inited": jnp.ones_like(cb["inited"]),
        }}},
    }
    c_ref = base.apply(variables, wav, target_bw=4, method=SoundStream.encode)
    # on CPU the kernel runs via pallas CPU lowering (exact); on TPU it is the
    # DEFAULT-precision serving path
    c_fast = fast.apply(variables, wav, target_bw=4, method=SoundStream.encode)
    np.testing.assert_array_equal(np.asarray(c_fast), np.asarray(c_ref))
