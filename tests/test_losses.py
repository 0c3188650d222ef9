"""Loss-function parity vs reference formulas (hand-checked + torch where
importable without torchaudio)."""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax.numpy as jnp

from academicodec_tpu.losses.gan import (
    absolute_feature_loss,
    adopt_weight,
    hinge_adversarial_g_loss,
    hinge_discriminator_loss,
    ls_discriminator_loss,
    ls_generator_loss,
    relative_feature_loss,
    sim_loss,
)
from academicodec_tpu.losses.mel import mel_reconstruction_loss


def _rand_lists(rng, n, shapes):
    return [jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in shapes[:n]]


@requires_reference
def test_hifigan_losses_match_reference():
    import torch
    from academicodec.models.hificodec.models import (
        discriminator_loss as ref_d,
        feature_loss as ref_f,
        generator_loss as ref_g,
    )

    rng = np.random.default_rng(0)
    shapes = [(2, 30), (2, 50), (2, 17)]
    lr = _rand_lists(rng, 3, shapes)
    lg = _rand_lists(rng, 3, shapes)
    lr_t = [torch.from_numpy(np.asarray(x)) for x in lr]
    lg_t = [torch.from_numpy(np.asarray(x)) for x in lg]

    ours, _, _ = ls_discriminator_loss(lr, lg)
    theirs, _, _ = ref_d(lr_t, lg_t)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)

    ours_g, _ = ls_generator_loss(lg)
    theirs_g, _ = ref_g(lg_t)
    np.testing.assert_allclose(float(ours_g), float(theirs_g), rtol=1e-6)

    fmap_shapes = [[(2, 8, 10), (2, 4, 6)], [(2, 3, 9), (2, 2, 2)]]
    fr = [[jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in fs] for fs in fmap_shapes]
    fg = [[jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in fs] for fs in fmap_shapes]
    fr_t = [[torch.from_numpy(np.asarray(x)) for x in f] for f in fr]
    fg_t = [[torch.from_numpy(np.asarray(x)) for x in f] for f in fg]
    np.testing.assert_allclose(
        float(absolute_feature_loss(fr, fg)), float(ref_f(fr_t, fg_t)), rtol=1e-6
    )


def test_hinge_losses_formulas():
    rng = np.random.default_rng(1)
    lr = _rand_lists(rng, 2, [(2, 5), (2, 7)])
    lg = _rand_lists(rng, 2, [(2, 5), (2, 7)])
    # manual formula checks (reference loss.py:6-12, 95-107)
    expect_g = np.mean([np.maximum(1 - np.asarray(x), 0).mean() for x in lg])
    np.testing.assert_allclose(float(hinge_adversarial_g_loss(lg)), expect_g, rtol=1e-6)
    expect_d = np.mean(
        [
            np.maximum(1 - np.asarray(r), 0).mean() + np.maximum(1 + np.asarray(g), 0).mean()
            for r, g in zip(lr, lg)
        ]
    )
    np.testing.assert_allclose(float(hinge_discriminator_loss(lr, lg)), expect_d, rtol=1e-6)


def test_relative_feature_and_sim():
    rng = np.random.default_rng(2)
    fr = [[jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32)) for _ in range(2)]]
    fg = [[jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32)) for _ in range(2)]]
    expect = np.mean(
        [
            (np.abs(np.asarray(r) - np.asarray(g)) / np.abs(np.asarray(r)).mean()).mean()
            for r, g in zip(fr[0], fg[0])
        ]
    )
    np.testing.assert_allclose(float(relative_feature_loss(fr, fg)), expect, rtol=1e-6)
    expect_sim = np.mean(
        [np.square(np.asarray(r) - np.asarray(g)).mean() for r, g in zip(fr[0], fg[0])]
    )
    # sim over logits lists
    np.testing.assert_allclose(float(sim_loss(fr[0], fg[0])), expect_sim, rtol=1e-6)


def test_adopt_weight_gate():
    assert float(adopt_weight(1.0, 10, threshold=500)) == 0.0
    assert float(adopt_weight(1.0, 600, threshold=500)) == 1.0


def test_mel_reconstruction_loss_finite_and_zero_at_identity():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32) * 0.2)
    same = mel_reconstruction_loss(x, x, 16000, scale_powers=(6, 7))
    assert float(same) < 1e-5
    y = x + 0.05 * jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    diff = mel_reconstruction_loss(x, y, 16000, scale_powers=(6, 7))
    assert float(diff) > float(same)
    assert np.isfinite(float(diff))
