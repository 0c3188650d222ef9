"""GAN losses over discriminator outputs.

Discriminators return ``(logits, fmaps)`` where ``logits`` is a list (one
per sub-discriminator) and ``fmaps`` a list of lists of feature maps.

Two adversarial families, matching the two reference trainers:
  * hinge (Encodec/SoundStream; reference models/encodec/loss.py:6-12,87-108)
  * least-squares (HiFi-Codec; reference models/hificodec/models.py:339-361)
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def hinge_adversarial_g_loss(logits_gen: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """mean_i relu(1 - D_i(G(x))) (reference loss.py:6-12)."""
    loss = 0.0
    for lg in logits_gen:
        loss += jnp.mean(jnp.maximum(1.0 - lg, 0.0))
    return loss / len(logits_gen)


def hinge_discriminator_loss(
    logits_real: Sequence[jnp.ndarray], logits_gen: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """sum_i relu(1 - D_i(x)) + relu(1 + D_i(G(x))), normalized by count
    (one family's share of reference criterion_d, loss.py:87-108)."""
    loss = 0.0
    for lr, lg in zip(logits_real, logits_gen):
        loss += jnp.mean(jnp.maximum(1.0 - lr, 0.0)) + jnp.mean(jnp.maximum(1.0 + lg, 0.0))
    return loss / len(logits_real)


def relative_feature_loss(
    fmap_real: Sequence[Sequence[jnp.ndarray]],
    fmap_gen: Sequence[Sequence[jnp.ndarray]],
) -> jnp.ndarray:
    """mean over (i, j) of mean(|r - g| / mean|r|) (reference loss.py:15-22)."""
    loss = 0.0
    for fr, fg in zip(fmap_real, fmap_gen):
        for r, g in zip(fr, fg):
            loss += jnp.mean(jnp.abs(r - g) / jnp.mean(jnp.abs(r)))
    return loss / (len(fmap_real) * len(fmap_real[0]))


def absolute_feature_loss(
    fmap_real: Sequence[Sequence[jnp.ndarray]],
    fmap_gen: Sequence[Sequence[jnp.ndarray]],
) -> jnp.ndarray:
    """2 * sum mean|r - g| (HiFi-GAN flavor; reference models.py:330-336)."""
    loss = 0.0
    for fr, fg in zip(fmap_real, fmap_gen):
        for r, g in zip(fr, fg):
            loss += jnp.mean(jnp.abs(r - g))
    return loss * 2.0


def sim_loss(
    logits_real: Sequence[jnp.ndarray], logits_gen: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """mean_i MSE(D_i(x), D_i(G(x))) (reference loss.py:25-29)."""
    loss = 0.0
    for lr, lg in zip(logits_real, logits_gen):
        loss += jnp.mean(jnp.square(lr - lg))
    return loss / len(logits_real)


def ls_generator_loss(
    logits_gen: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """LS-GAN generator loss: sum mean((1 - D_i)^2) (reference models.py:353-361)."""
    losses = [jnp.mean(jnp.square(1.0 - lg)) for lg in logits_gen]
    return sum(losses), losses


def ls_discriminator_loss(
    logits_real: Sequence[jnp.ndarray], logits_gen: Sequence[jnp.ndarray]
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """LS-GAN discriminator loss (reference models.py:339-350)."""
    r_losses = [jnp.mean(jnp.square(1.0 - lr)) for lr in logits_real]
    g_losses = [jnp.mean(jnp.square(lg)) for lg in logits_gen]
    return sum(r_losses) + sum(g_losses), r_losses, g_losses


def adopt_weight(weight: float, global_step, threshold: int = 0, value: float = 0.0):
    """Warm-up gate: 0 until ``global_step >= threshold`` (loss.py:124-127).
    ``global_step`` may be traced; returns a traced scalar."""
    return jnp.where(global_step < threshold, value, weight)
