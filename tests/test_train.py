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


@pytest.fixture(scope="module")
def tiny_trainer():
    return EncodecTrainer(_tiny_encodec_cfg())


def test_encodec_train_step_runs(tiny_trainer):
    trainer = tiny_trainer
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
    """Same step compiled over an 8-device data mesh.

    Runs in a FRESH subprocess (same isolation as
    test_sharded_step_matches_unsharded): executing this sharded graph late
    in a long pytest process aborts inside XLA:CPU (state-dependent upstream
    crash, observed at ~91% of the full suite fetching loss_g; passes in any
    fresh process). Constructs its own trainer — the module fixture's jit
    cache can't cross the process boundary anyway."""
    import os
    import subprocess
    import sys

    if os.environ.get("ACT_SHARDED_SMOKE_INNER") != "1":
        env = {**os.environ, "ACT_SHARDED_SMOKE_INNER": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             __file__ + "::test_encodec_train_step_sharded"],
            env=env, capture_output=True, text=True, timeout=3000,
        )
        assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-1500:])
        return

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


def test_encodec_lr_schedule(tiny_trainer):
    trainer = tiny_trainer
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3200)) * 0.1
    state = trainer.init_state(rng, x)
    state = trainer.set_epoch_lr(state, 10)
    lr = float(state.g_opt_state.hyperparams["learning_rate"])
    assert np.isclose(lr, 3e-4 * 0.999**10)


@pytest.mark.slow
def test_hificodec_train_step_runs():
    # NOTE: the sharded variant of this full-width graph aborts inside
    # XLA:CPU when compiled IN-PROCESS after other large sharded graphs
    # (state-dependent upstream crash, not a framework bug) — a FRESH
    # process compiles+executes it cleanly at 4 and 8 virtual devices
    # (benchmarks/hifi_fullwidth_dryrun.py, run subprocess-isolated by
    # __graft_entry__.dryrun_multichip). The data-parallel path here is
    # covered by the encodec sharded + equivalence tests, and the
    # full-size HiFi-Codec step runs on real TPU (BENCHMARKS.md:
    # 400.8 ms/step).
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


@pytest.mark.slow
def test_hificodec_sharded_step_matches_unsharded():
    """HiFi-Codec analogue of test_sharded_step_matches_unsharded, covering
    the family-specific distributed state: spectral-norm ``u`` vectors
    (mutated in the D phase) and gradient-trained GRVQ codebooks. Uses a
    narrow width (encoder_base_channels=8) — the full-width sharded graph
    aborts inside XLA:CPU (virtual-device backend crash, not a framework
    bug); the DP semantics are width-independent.

    Runs in a FRESH subprocess (same isolation as
    test_sharded_step_matches_unsharded): once the suite grew past ~260
    tests this compile started segfaulting in the XLA:CPU compilation-cache
    read late in a long pytest process; it passes in any fresh process."""
    import os
    import subprocess
    import sys

    if os.environ.get("ACT_HIFI_SHARDED_EQ_INNER") != "1":
        env = {**os.environ, "ACT_HIFI_SHARDED_EQ_INNER": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             __file__ + "::test_hificodec_sharded_step_matches_unsharded"],
            env=env, capture_output=True, text=True, timeout=3000,
        )
        assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-1500:])
        return
    cfg = HiFiCodecTrainConfig(
        model=HiFiCodecConfig(
            segment_size=3200, encoder_base_channels=8, upsample_initial_channel=128
        ),
        stft_filters=8,
        stft_n_ffts=(256,),
        mpd_periods=(2,),
        msd_scales=1,
    )
    trainer = HiFiCodecTrainer(cfg)
    mesh = make_mesh()
    rng = jax.random.PRNGKey(3)
    y = jax.random.normal(rng, (8, 3200)) * 0.1

    state_a = trainer.init_state(rng, y)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    state_a, metrics_a = trainer.train_step(state_a, y)
    state_b = replicate(state_b, mesh)
    state_b, metrics_b = trainer.train_step(state_b, shard_batch(y, mesh))

    np.testing.assert_allclose(
        float(metrics_a["loss_gen_all"]), float(metrics_b["loss_gen_all"]), rtol=1e-4
    )
    # generator params (incl. GRVQ codebooks, gradient-trained). Tolerance:
    # Adam amplifies cross-layout reduction-order float noise on tiny-grad
    # elements up to ~lr/5 (observed max 4e-5 at lr=2e-4); a genuine
    # divergence (e.g. an argmin code flip) shifts whole rows by the full
    # 2e-4 step and still fails.
    for xa, xb in zip(
        jax.tree_util.tree_leaves(state_a.g_params),
        jax.tree_util.tree_leaves(state_b.g_params),
    ):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-4, rtol=1e-3)
    # spectral-norm power-iteration state advanced identically
    for xa, xb in zip(
        jax.tree_util.tree_leaves(state_a.d_extra["spectral"]),
        jax.tree_util.tree_leaves(state_b.d_extra["spectral"]),
    ):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-4, rtol=1e-3)
    # discriminator params
    da = jax.tree_util.tree_leaves(state_a.d_params)[0]
    db = jax.tree_util.tree_leaves(state_b.d_params)[0]
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-4, rtol=1e-3)


def test_encodec_training_reduces_reconstruction_loss(tiny_trainer):
    """Overfit a fixed tone batch: rec loss after 30 steps < at start.
    (The 'training works' smoke the reference never had, SURVEY §4.)"""
    trainer = tiny_trainer
    rng = jax.random.PRNGKey(42)
    t = jnp.arange(3200) / 16000.0
    tone = 0.4 * jnp.sin(2 * np.pi * 220.0 * t) + 0.2 * jnp.sin(2 * np.pi * 880.0 * t)
    x = jnp.stack([tone, 0.5 * tone])
    state = trainer.init_state(rng, x)
    losses = []
    for _ in range(30):
        state, metrics = trainer.train_step(state, x)
        losses.append(float(metrics["rec_loss"]))
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert late < early, (early, late)


def test_train_state_checkpoint_roundtrip(tiny_trainer, tmp_path):
    from academicodec_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        scan_checkpoint,
    )

    trainer = tiny_trainer
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3200)) * 0.1
    state = trainer.init_state(rng, x)
    state, _ = trainer.train_step(state, x)

    d = str(tmp_path)
    for step in (1, 2, 3):
        save_checkpoint(d, "state", step, state, num_ckpt_keep=2)
    latest = scan_checkpoint(d, "state")
    assert latest.endswith("00000003")
    import glob as _glob
    assert len(_glob.glob(str(tmp_path / "state_*"))) == 2  # rotation kept 2

    restored = load_checkpoint(latest, template=state)
    a = jax.tree_util.tree_leaves(state.g_params)
    b = jax.tree_util.tree_leaves(restored.g_params)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # a restored state steps without error
    state2, metrics = trainer.train_step(restored, x)
    assert np.isfinite(float(metrics["loss_g"]))


def test_sharded_step_matches_unsharded():
    """The flagship distributed-correctness claim: one data-parallel step
    over 8 devices produces the SAME parameter/EMA-codebook updates as the
    unsharded step on the identical global batch (GSPMD global-batch
    statistics — the reference's per-rank EMA drifts instead, SURVEY §2.8).

    Runs in a FRESH subprocess: compiling this graph late in a long pytest
    process segfaults inside XLA:CPU (state-dependent upstream compiler
    crash — reproduced with warm AND cold compilation caches, at default
    and reduced stack sizes; the identical test passes in any fresh
    process). Subprocess isolation gives it the fresh-process condition
    deterministically."""
    import os
    import subprocess
    import sys

    if os.environ.get("ACT_SHARDED_EQ_INNER") != "1":
        env = {**os.environ, "ACT_SHARDED_EQ_INNER": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             __file__ + "::test_sharded_step_matches_unsharded"],
            env=env, capture_output=True, text=True, timeout=3000,
        )
        assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-1500:])
        return

    trainer = EncodecTrainer(_tiny_encodec_cfg())
    mesh = make_mesh()
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (8, 3200)) * 0.1

    state_a = trainer.init_state(rng, x)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    state_a, metrics_a = trainer.train_step(state_a, x)

    state_b = replicate(state_b, mesh)
    state_b, metrics_b = trainer.train_step(state_b, shard_batch(x, mesh))

    np.testing.assert_allclose(
        float(metrics_a["loss_g"]), float(metrics_b["loss_g"]), rtol=1e-4
    )
    emb_a = np.asarray(state_a.g_extra["codebook"]["quantizer"]["vq"]["embed"])
    emb_b = np.asarray(state_b.g_extra["codebook"]["quantizer"]["vq"]["embed"])
    np.testing.assert_allclose(emb_a, emb_b, atol=1e-5, rtol=1e-4)
    ga = np.asarray(jax.tree_util.tree_leaves(state_a.g_params)[0])
    gb = np.asarray(jax.tree_util.tree_leaves(state_b.g_params)[0])
    np.testing.assert_allclose(ga, gb, atol=1e-5, rtol=1e-4)
