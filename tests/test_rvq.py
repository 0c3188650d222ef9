"""RVQ / GRVQ parity and invariants vs the torch reference."""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from academicodec_tpu.quant.core_vq import ResidualVQ
from academicodec_tpu.quant.grvq import GroupResidualVQ


def _rand_codebook_state(rng, n_q, bins, dim):
    embed = rng.standard_normal((n_q, bins, dim)).astype(np.float32)
    return {
        "embed": jnp.asarray(embed),
        "embed_avg": jnp.asarray(embed.copy()),
        "cluster_size": jnp.ones((n_q, bins), jnp.float32),
        "inited": jnp.ones((n_q,), bool),
    }


@requires_reference
def test_rvq_encode_decode_token_parity():
    """Bit-exact codebook indices + decode parity vs reference RVQ."""
    import torch
    from academicodec.quantization.core_vq import ResidualVectorQuantization as TorchRVQ

    n_q, bins, dim = 4, 64, 16
    rng = np.random.default_rng(0)
    state = _rand_codebook_state(rng, n_q, bins, dim)

    ref = TorchRVQ(num_quantizers=n_q, dim=dim, codebook_size=bins)
    with torch.no_grad():
        for i, layer in enumerate(ref.layers):
            cb = layer._codebook
            cb.embed.copy_(torch.from_numpy(np.asarray(state["embed"][i])))
            cb.embed_avg.copy_(torch.from_numpy(np.asarray(state["embed_avg"][i])))
            cb.cluster_size.fill_(1.0)
            cb.inited.fill_(True)
    ref.eval()

    x = rng.standard_normal((2, dim, 50)).astype(np.float32)  # torch layout [B,D,T]
    with torch.no_grad():
        codes_ref = ref.encode(torch.from_numpy(x), n_q=n_q).numpy()
        decoded_ref = ref.decode(torch.from_numpy(codes_ref)).numpy()

    mod = ResidualVQ(num_quantizers=n_q, dim=dim, codebook_size=bins)
    variables = {"codebook": state}
    x_j = jnp.asarray(x.transpose(0, 2, 1))  # [B,T,D]
    codes = mod.apply(variables, x_j, method=ResidualVQ.encode)
    np.testing.assert_array_equal(np.asarray(codes), codes_ref)

    decoded = mod.apply(variables, codes, method=ResidualVQ.decode)
    np.testing.assert_allclose(
        np.asarray(decoded).transpose(0, 2, 1), decoded_ref, atol=1e-5, rtol=1e-5
    )


@requires_reference
def test_rvq_forward_eval_parity():
    """Eval-mode forward (quantized output) matches the reference.

    Subprocess-isolated (conftest.reinvoke_isolated): on the round-5 host
    this test's FIRST tiny compile (jnp.ones via broadcast_in_dim)
    segfaulted inside backend_compile_and_load ~77 min into the full
    suite — the same state-dependent XLA:CPU crash class CLAUDE.md
    documents for big-graph compiles; the victim is simply whichever
    test compiles next once the process state is poisoned. Passes in any
    fresh process."""
    from tests.conftest import reinvoke_isolated

    if not reinvoke_isolated(
        "tests/test_rvq.py", "test_rvq_forward_eval_parity",
        "ACADEMICODEC_ISOLATED_RVQ_FWD",
    ):
        return
    import torch
    from academicodec.quantization.core_vq import ResidualVectorQuantization as TorchRVQ

    n_q, bins, dim = 3, 32, 8
    rng = np.random.default_rng(1)
    state = _rand_codebook_state(rng, n_q, bins, dim)

    ref = TorchRVQ(num_quantizers=n_q, dim=dim, codebook_size=bins)
    with torch.no_grad():
        for i, layer in enumerate(ref.layers):
            cb = layer._codebook
            cb.embed.copy_(torch.from_numpy(np.asarray(state["embed"][i])))
            cb.inited.fill_(True)
    ref.eval()

    x = rng.standard_normal((2, dim, 20)).astype(np.float32)
    with torch.no_grad():
        q_ref, codes_ref, _ = ref(torch.from_numpy(x), n_q=n_q)

    mod = ResidualVQ(num_quantizers=n_q, dim=dim, codebook_size=bins)
    q, codes, _losses = mod.apply(
        {"codebook": state}, jnp.asarray(x.transpose(0, 2, 1)), n_q=n_q, training=False
    )
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(q).transpose(0, 2, 1), q_ref.numpy(), atol=1e-5, rtol=1e-5
    )


@requires_reference
def test_rvq_ema_update_parity():
    """One training step's EMA codebook update matches the reference
    (expiry disabled on both sides: threshold=0)."""
    import torch
    from academicodec.quantization.core_vq import ResidualVectorQuantization as TorchRVQ

    n_q, bins, dim = 2, 16, 8
    rng = np.random.default_rng(2)
    state = _rand_codebook_state(rng, n_q, bins, dim)

    ref = TorchRVQ(
        num_quantizers=n_q, dim=dim, codebook_size=bins, threshold_ema_dead_code=0
    )
    with torch.no_grad():
        for i, layer in enumerate(ref.layers):
            cb = layer._codebook
            cb.embed.copy_(torch.from_numpy(np.asarray(state["embed"][i])))
            cb.embed_avg.copy_(torch.from_numpy(np.asarray(state["embed_avg"][i])))
            cb.cluster_size.fill_(1.0)
            cb.inited.fill_(True)
    ref.train()

    x = rng.standard_normal((2, dim, 40)).astype(np.float32)
    q_ref, codes_ref, losses_ref = ref(torch.from_numpy(x), n_q=n_q)

    mod = ResidualVQ(
        num_quantizers=n_q, dim=dim, codebook_size=bins, threshold_ema_dead_code=0.0
    )
    (q, codes, losses), updated = mod.apply(
        {"codebook": state},
        jnp.asarray(x.transpose(0, 2, 1)),
        n_q=n_q,
        training=True,
        mutable=["codebook"],
        rngs={"rvq": jax.random.PRNGKey(0)},
    )
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(losses), losses_ref.detach().numpy().reshape(-1), atol=1e-6
    )
    for i, layer in enumerate(ref.layers):
        cb = layer._codebook
        np.testing.assert_allclose(
            np.asarray(updated["codebook"]["embed"][i]), cb.embed.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(updated["codebook"]["cluster_size"][i]),
            cb.cluster_size.numpy(),
            atol=1e-5,
        )


def test_rvq_nq_masking():
    """Layers >= n_q contribute nothing; codes for active layers unchanged."""
    n_q, bins, dim = 4, 32, 8
    rng = np.random.default_rng(3)
    state = _rand_codebook_state(rng, n_q, bins, dim)
    mod = ResidualVQ(num_quantizers=n_q, dim=dim, codebook_size=bins)
    x = jnp.asarray(rng.standard_normal((2, 10, dim)).astype(np.float32))

    q2, codes2, losses2 = mod.apply({"codebook": state}, x, n_q=2, training=False)
    q4, codes4, _ = mod.apply({"codebook": state}, x, n_q=4, training=False)
    # first-two-layer codes identical between the two bandwidths
    np.testing.assert_array_equal(np.asarray(codes2[:2]), np.asarray(codes4[:2]))
    assert not np.allclose(np.asarray(q2), np.asarray(q4))
    # masked losses are zero
    assert np.all(np.asarray(losses2)[2:] == 0)


@requires_reference
def test_grvq_parity():
    """GRVQ forward + embed parity and token-order golden vs reference."""
    import torch
    from academicodec.models.hificodec.models import Quantizer as TorchQuantizer

    class H:
        n_code_groups = 2
        n_codes = 64
        codebook_loss_lambda = 1.0
        commitment_loss_lambda = 0.25

    torch.manual_seed(5)
    ref = TorchQuantizer(H())
    ref.eval()
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 512, 9)).astype(np.float32)
    with torch.no_grad():
        q_ref, loss_ref, codes_ref = ref(torch.from_numpy(x))
    # reference codes: list of 4 [B*T] tensors in order [l0g0, l0g1, l1g0, l1g1]
    codes_ref = torch.stack([c.reshape(2, -1) for c in codes_ref], -1).numpy()

    # import codebooks
    cb0 = np.stack([ref.quantizer_modules[g].embedding.weight.detach().numpy() for g in range(2)])
    cb1 = np.stack([ref.quantizer_modules2[g].embedding.weight.detach().numpy() for g in range(2)])
    codebooks = jnp.asarray(np.stack([cb0, cb1]))

    mod = GroupResidualVQ(dim=512, n_codes=64, n_groups=2, n_residual=2)
    variables = {"params": {"codebooks": codebooks}}
    q, loss, codes = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 1)), training=False)
    np.testing.assert_array_equal(np.asarray(codes), codes_ref)
    np.testing.assert_allclose(
        np.asarray(q).transpose(0, 2, 1), q_ref.numpy(), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(loss), loss_ref.numpy(), atol=1e-5, rtol=1e-4)

    # embed (decode) path
    with torch.no_grad():
        emb_ref = ref.embed(torch.from_numpy(codes_ref.astype(np.int64))).numpy()
    emb = mod.apply(variables, jnp.asarray(codes_ref), method=GroupResidualVQ.embed)
    np.testing.assert_allclose(
        np.asarray(emb).transpose(0, 2, 1), emb_ref, atol=1e-5, rtol=1e-4
    )
