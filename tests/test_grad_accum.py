"""Gradient accumulation (``accum_steps``) — microbatched optimizer steps.

Beyond-reference capability: the reference reaches its effective batches
(80 for HiFi-Codec, 128 for Encodec) by spreading over 8 GPUs; here one
chip reproduces them by scanning microbatches and applying the averaged
gradient once, with peak activation memory ~B/k of the monolithic step.

Contracts pinned:
  * HiFi-Codec: the accumulated step is numerically EQUIVALENT to the
    monolithic step (every loss is a batch mean, GRVQ codebooks are
    gradient-trained, and the spectral-norm power iteration is
    input-independent so each microbatch derives the same advanced u).
  * Encodec: the accumulated step runs, produces finite losses matching
    the monolithic step closely (the RVQ codebook EMA threads the
    microbatches sequentially — the documented deviation — so equality is
    approximate once EMA substeps shift assignments).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.nn.hifigan import HiFiCodecConfig
from academicodec_tpu.train.encodec import EncodecTrainConfig, EncodecTrainer
from academicodec_tpu.train.hificodec import HiFiCodecTrainConfig, HiFiCodecTrainer

TINY_DISCS = dict(
    stft_filters=4, stft_n_ffts=(256, 128), mpd_periods=(2, 3), msd_scales=2
)


def _fresh(state):
    """Deep-copy a train state: train_step donates its state argument, so
    feeding the SAME state to two trainers needs fresh buffers."""
    return jax.tree_util.tree_map(jnp.array, state)


def _tree_max_rel(a, b):
    def rel(x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        denom = np.maximum(np.abs(x), 1e-6)
        return float(np.max(np.abs(x - y) / denom))

    return max(
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(rel, a, b)) or [0.0]
    )


def test_hificodec_accum_matches_monolithic():
    cfg_model = HiFiCodecConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), encoder_base_channels=8,
        n_code_groups=2, n_codes=16, sampling_rate=16000,
    )
    cfg1 = HiFiCodecTrainConfig(model=cfg_model, **TINY_DISCS)
    cfg2 = dataclasses.replace(cfg1, accum_steps=2)
    tr1, tr2 = HiFiCodecTrainer(cfg1), HiFiCodecTrainer(cfg2)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32) * 0.3)
    state = tr1.init_state(jax.random.PRNGKey(0), y)

    s1, m1 = tr1.train_step(_fresh(state), y)
    s2, m2 = tr2.train_step(state, y)

    assert np.isfinite(float(m2["loss_gen_all"]))
    # identical math up to reduction order (f32 HIGHEST on the CPU backend)
    assert abs(float(m1["loss_gen_all"]) - float(m2["loss_gen_all"])) < 1e-3
    assert abs(float(m1["loss_disc_all"]) - float(m2["loss_disc_all"])) < 1e-3
    assert _tree_max_rel(s1.g_params, s2.g_params) < 5e-2  # post-Adam updates
    assert _tree_max_rel(s1.d_params, s2.d_params) < 5e-2
    # spectral u advanced identically (input-independent power iteration)
    assert _tree_max_rel(s1.d_extra["spectral"], s2.d_extra["spectral"]) < 1e-4

    # gradient-level check, tighter than post-Adam params: one more step
    # from the SAME state keeps trajectories together if gradients match
    s1b, _ = tr1.train_step(s1, y)
    s2b, _ = tr2.train_step(s2, y)
    assert _tree_max_rel(s1b.g_params, s2b.g_params) < 1e-1


def test_encodec_accum_runs_and_tracks_monolithic():
    cfg1 = EncodecTrainConfig(
        sr=16000, ratios=(4, 4, 2), target_bandwidths=(1, 2), n_filters=4,
        dimension=32, bins=16, discriminator_iter_start=0, **TINY_DISCS
    )
    cfg2 = dataclasses.replace(cfg1, accum_steps=2)
    tr1, tr2 = EncodecTrainer(cfg1), EncodecTrainer(cfg2)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 640)).astype(np.float32) * 0.3)
    state0 = tr1.init_state(jax.random.PRNGKey(1), x)
    # warmup monolithic step initializes the codebooks from a full batch so
    # both variants then start from identical, inited EMA state
    state, _ = tr1.train_step(state0, x)

    s1, m1 = tr1.train_step(_fresh(state), x)
    s2, m2 = tr2.train_step(state, x)

    for k in ("loss_g", "loss_d", "rec_loss", "commit_loss"):
        assert np.isfinite(float(m2[k])), k
    # EMA threads sequentially (documented deviation) -> approximate match
    assert abs(float(m1["loss_g"]) - float(m2["loss_g"])) < 0.05 * (
        1.0 + abs(float(m1["loss_g"]))
    )
    assert np.isfinite(
        float(
            jnp.max(
                jnp.asarray(
                    [jnp.max(jnp.abs(l)) for l in jax.tree_util.tree_leaves(s2.g_params)]
                )
            )
        )
    )


def test_encodec_accum_rejects_indivisible_batch():
    cfg = EncodecTrainConfig(
        sr=16000, ratios=(4, 4, 2), target_bandwidths=(1,), n_filters=4,
        dimension=32, bins=16, accum_steps=3, **TINY_DISCS
    )
    tr = EncodecTrainer(cfg)
    x = jnp.zeros((4, 640), jnp.float32)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    try:
        tr.train_step(state, x)
        raised = False
    except AssertionError:
        raised = True
    assert raised
