"""Post-conv norm modes (layer_norm / time_group_norm) vs torch."""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from academicodec_tpu.nn.conv import Conv1d


@requires_reference
def test_time_group_norm_matches_torch_groupnorm():
    import torch

    C = 16
    gn = torch.nn.GroupNorm(1, C)
    gn.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, C, 50)).astype(np.float32)
    with torch.no_grad():
        y_ref = gn(torch.from_numpy(x)).numpy()

    from academicodec_tpu.nn.norm import TimeGroupNorm

    mod = TimeGroupNorm(channels=C)
    variables = {
        "params": {
            "scale": jnp.asarray(gn.weight.detach().numpy()),
            "bias": jnp.asarray(gn.bias.detach().numpy()),
        }
    }
    y = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, atol=2e-5, rtol=1e-4
    )


def test_conv_with_norm_modes_run():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 40, 8))
    for norm in ("layer_norm", "time_group_norm"):
        mod = Conv1d(in_channels=8, out_channels=12, kernel_size=3, padding=(1, 1), norm=norm)
        v = mod.init({"params": rng}, x)
        y = mod.apply(v, x)
        assert y.shape == (2, 40, 12)
        # normalized output: near-zero mean per conv output
        assert abs(float(jnp.mean(y))) < 0.2
