"""Trainer smoke tests: finite losses, state updates, data-parallel mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from academicodec_tpu.nn.hifigan import HiFiCodecConfig
from academicodec_tpu.parallel import make_mesh, replicate, shard_batch
from academicodec_tpu.train.encodec import EncodecTrainConfig, EncodecTrainer
from academicodec_tpu.train.hificodec import HiFiCodecTrainConfig, HiFiCodecTrainer


def _tiny_encodec_cfg():
    return EncodecTrainConfig(
        sr=16000,
        ratios=(8, 5, 4, 2),
        target_bandwidths=(1, 2, 4),
        n_filters=4,
        dimension=32,
        bins=64,
        discriminator_iter_start=1,
        mel_scale_powers=(6, 7),
        stft_filters=8,
        stft_n_ffts=(256,),
        mpd_periods=(2, 3),
        msd_scales=1,
    )


def test_encodec_train_step_runs():
    trainer = EncodecTrainer(_tiny_encodec_cfg())
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3200)) * 0.1
    state = trainer.init_state(rng, x)
    step0 = int(state.step)
    for _ in range(2):
        state, metrics = trainer.train_step(state, x)
    assert int(state.step) == step0 + 2
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k
    ev = trainer.eval_step(state, x)
    assert np.isfinite(np.asarray(ev["valid_loss_g"]))


def test_encodec_train_step_sharded():
    """Same step compiled over an 8-device data mesh."""
    trainer = EncodecTrainer(_tiny_encodec_cfg())
    mesh = make_mesh()
    assert len(jax.devices()) == 8
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 3200)) * 0.1
    state = trainer.init_state(rng, x)
    state = replicate(state, mesh)
    xs = shard_batch(x, mesh)
    state, metrics = trainer.train_step(state, xs)
    assert np.isfinite(np.asarray(metrics["loss_g"]))
    # codebook EMA state must remain replicated-identical across devices
    emb = state.g_extra["codebook"]["quantizer"]["vq"]["embed"]
    assert np.isfinite(np.asarray(emb)).all()


def test_encodec_lr_schedule():
    trainer = EncodecTrainer(_tiny_encodec_cfg())
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3200)) * 0.1
    state = trainer.init_state(rng, x)
    state = trainer.set_epoch_lr(state, 10)
    lr = float(state.g_opt_state.hyperparams["learning_rate"])
    assert np.isclose(lr, 3e-4 * 0.999**10)


@pytest.mark.slow
def test_hificodec_train_step_runs():
    cfg = HiFiCodecTrainConfig(
        model=HiFiCodecConfig(segment_size=3200),
        stft_filters=8,
        stft_n_ffts=(256,),
        mpd_periods=(2,),
        msd_scales=1,
    )
    trainer = HiFiCodecTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    y = jax.random.normal(rng, (2, 3200)) * 0.1
    state = trainer.init_state(rng, y)
    state, metrics = trainer.train_step(state, y)
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k
    ev = trainer.eval_step(state, y)
    assert np.isfinite(np.asarray(ev["val_mel_error"]))
