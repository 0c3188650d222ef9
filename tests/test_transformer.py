"""Streaming transformer parity vs the torch reference + streaming invariance."""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from academicodec_tpu.nn.transformer import StreamingTransformerEncoder
from academicodec_tpu.utils.torch_import import _set


def _import_transformer(ref):
    params = {}
    for key, val in ref.state_dict().items():
        parts = key.split(".")
        v = val.numpy()
        if parts[0] == "norm_in":
            _set(params, ("norm_in", "scale" if parts[1] == "weight" else "bias"), v)
            continue
        assert parts[0] == "layers"
        layer = f"layers_{parts[1]}"
        rest = parts[2:]
        if rest[0] == "self_attn":
            if rest[1] == "in_proj_weight":
                _set(params, (layer, "self_attn", "in_proj_weight"), v)
            elif rest[1] == "in_proj_bias":
                _set(params, (layer, "self_attn", "in_proj_bias"), v)
            elif rest[1] == "out_proj":
                name = "out_proj_kernel" if rest[2] == "weight" else "out_proj_bias"
                _set(params, (layer, "self_attn", name), v)
        elif rest[0] in ("linear1", "linear2"):
            if rest[1] == "weight":
                _set(params, (layer, rest[0], "kernel"), v.T)
            else:
                _set(params, (layer, rest[0], "bias"), v)
        elif rest[0] in ("norm1", "norm2"):
            _set(
                params,
                (layer, rest[0], "scale" if rest[1] == "weight" else "bias"),
                v,
            )
        else:
            raise KeyError(key)
    return params


@requires_reference
def test_streaming_transformer_parity():
    import torch
    from academicodec.modules.transformer import StreamingTransformerEncoder as TorchST

    torch.manual_seed(0)
    dim, heads, layers = 32, 4, 2
    ref = TorchST(dim=dim, num_heads=heads, num_layers=layers, past_context=16)
    ref.eval()
    x = torch.randn(2, 21, dim)
    with torch.no_grad():
        y_ref, states_ref, off_ref = ref(x)

    params = _import_transformer(ref)
    mod = StreamingTransformerEncoder(
        dim=dim, num_heads=heads, num_layers=layers, past_context=16
    )
    y, states, off = mod.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=3e-5, rtol=1e-4)
    assert off == off_ref
    for s, sr in zip(states, states_ref):
        np.testing.assert_allclose(np.asarray(s), sr.numpy(), atol=3e-5, rtol=1e-4)


@requires_reference
def test_streaming_transformer_chunked_equals_full():
    """Feeding two chunks with carried state == one full pass (within the
    causal band)."""
    import torch
    from academicodec.modules.transformer import StreamingTransformerEncoder as TorchST

    torch.manual_seed(1)
    dim, heads, layers, ctx = 32, 4, 2, 64
    ref = TorchST(dim=dim, num_heads=heads, num_layers=layers, past_context=ctx)
    ref.eval()
    params = _import_transformer(ref)
    mod = StreamingTransformerEncoder(
        dim=dim, num_heads=heads, num_layers=layers, past_context=ctx
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 24, dim)).astype(np.float32))
    y_full, _, _ = mod.apply({"params": params}, x)

    y1, st, off = mod.apply({"params": params}, x[:, :12])
    y2, _, _ = mod.apply({"params": params}, x[:, 12:], states=st, offset=off)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=1)),
        np.asarray(y_full),
        atol=1e-4,
        rtol=1e-3,
    )
