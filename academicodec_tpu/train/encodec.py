"""Encodec/SoundStream GAN trainer: jitted two-phase step on a data mesh.

Reproduces the reference training semantics (models/encodec/main_launch.py
:265-359) as a single compiled ``state -> state`` step:

  * per-phase generator forward with a fresh random bandwidth draw each time
    (the reference re-runs ``soundstream(x)`` for each optimizer index,
    net3.py:40-41 drawing a new bandwidth per call) — here a *traced* n_q,
    so all bandwidths share one executable;
  * G phase: hinge adversarial + relative feature + multi-scale mel
    reconstruction + commit, gated by ``discriminator_iter_start``
    (loss.py:151-219);
  * D phase on the (stop-gradient) regenerated output: hinge discriminator
    loss over the three families (loss.py:222-231);
  * EMA codebook updates happen inside both forwards, as in the reference;
    under the data mesh the statistics are global-batch (GSPMD reduces
    across chips), which *fixes* the reference's per-rank EMA drift
    (SURVEY §2.8).

The SoundStream recipe flavor differs only in mel scale range (6..10 vs
6..11) and in including ``sim_loss`` in the feature term
(models/soundstream/loss.py:151-219) — both config switches here.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from academicodec_tpu.losses.gan import (
    adopt_weight,
    hinge_adversarial_g_loss,
    hinge_discriminator_loss,
    relative_feature_loss,
    sim_loss,
)
from academicodec_tpu.losses.mel import mel_reconstruction_loss
from academicodec_tpu.models.soundstream import SoundStream
from academicodec_tpu.nn.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    MultiScaleSTFTDiscriminator,
)
from academicodec_tpu.train.state import (
    GANTrainState,
    f32_cast,
    make_optimizer,
    mp_cast,
    set_learning_rate,
)


@dataclasses.dataclass(frozen=True)
class EncodecTrainConfig:
    sr: int = 16000
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    target_bandwidths: Tuple[float, ...] = (1, 1.5, 2, 4, 6, 12)
    n_filters: int = 32
    dimension: int = 512
    bins: int = 1024
    # loss weights (reference main_launch.py arg defaults)
    lambda_wav: float = 100.0
    lambda_adv: float = 1.0
    lambda_feat: float = 1.0
    lambda_rec: float = 1.0
    lambda_com: float = 1000.0
    discriminator_iter_start: int = 500
    # soundstream-recipe switches
    mel_scale_powers: Tuple[int, ...] = tuple(range(6, 12))  # soundstream: 6..10
    feat_include_sim: bool = False  # soundstream loss_g includes sim_loss
    # optimization (reference main_launch.py:239-249)
    lr: float = 3e-4
    betas: Tuple[float, float] = (0.5, 0.9)
    lr_gamma: float = 0.999  # per-epoch exponential decay
    # discriminator topology (reference defaults; shrinkable for tests)
    stft_filters: int = 32
    stft_n_ffts: Tuple[int, ...] = (1024, 2048, 512, 256, 128)
    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    # lanes-packed generator convs in the train step (fwd AND bwd run the
    # block-Toeplitz lowering; exact, so tokens/EMA stats are unchanged)
    packed_conv: bool = False
    # gradient accumulation: split each [B, T] batch into this many
    # sequential microbatches per optimizer update (B % accum_steps == 0).
    # Reproduces the reference's 8-GPU effective batch (128 = 16 x 8,
    # main_launch.py:199) on fewer chips: peak activation memory scales
    # with B / accum_steps while gradients are the exact full-batch mean.
    # The RVQ codebook EMA sees the microbatches SEQUENTIALLY (k EMA
    # substeps per optimizer step, like BatchNorm under accumulation) —
    # the one deviation from the monolithic step; gradients for each
    # microbatch use the then-current codebook.
    accum_steps: int = 1
    # bf16 mixed-precision training: generator + discriminator forwards
    # (and their backwards) run in bfloat16 — params are cast at the loss
    # boundary (differentiable astype), so master weights, Adam moments,
    # RVQ codebook EMA state, and every loss reduction (mel/hinge/feature,
    # computed on f32-upcast outputs) stay float32. The reference has no
    # AMP path (trains f32 throughout); this is the TPU-native equivalent
    # of torch.cuda.amp for the MXU.
    mixed_precision: bool = False


class _Discriminators(nn.Module):
    """The encodec/soundstream discriminator bundle (main_launch.py:170-178)."""

    stft_filters: int = 32
    stft_n_ffts: Tuple[int, ...] = (1024, 2048, 512, 256, 128)
    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        self.stft_disc = MultiScaleSTFTDiscriminator(
            filters=self.stft_filters,
            n_ffts=self.stft_n_ffts,
            hop_lengths=tuple(n // 4 for n in self.stft_n_ffts),
            win_lengths=self.stft_n_ffts,
            dtype=self.dtype,
        )
        self.mpd = MultiPeriodDiscriminator(
            flavor="soundstream", periods=self.mpd_periods, dtype=self.dtype
        )
        self.msd = MultiScaleDiscriminator(
            flavor="soundstream", num_scales=self.msd_scales, dtype=self.dtype
        )

    def __call__(self, x: jnp.ndarray):
        return {
            "stft": self.stft_disc(x),
            "mpd": self.mpd(x),
            "msd": self.msd(x),
        }


class EncodecTrainer:
    """Builds model/discriminators and exposes jitted train/eval steps.

    Steps operate on global batches ``[B, T]``; shard them over a mesh with
    ``parallel.shard_batch`` and the compiled step runs data-parallel.
    """

    def __init__(self, config: EncodecTrainConfig):
        self.cfg = config
        self.model = SoundStream(
            n_filters=config.n_filters,
            dimension=config.dimension,
            ratios=config.ratios,
            sample_rate=config.sr,
            target_bandwidths=config.target_bandwidths,
            bins=config.bins,
            packed_conv=config.packed_conv,
        )
        self.discs = _Discriminators(
            stft_filters=config.stft_filters,
            stft_n_ffts=config.stft_n_ffts,
            mpd_periods=config.mpd_periods,
            msd_scales=config.msd_scales,
        )
        self.g_tx = make_optimizer("adamw", config.lr, *config.betas)
        self.d_tx = make_optimizer("adamw", config.lr, *config.betas)

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch: jnp.ndarray) -> GANTrainState:
        """Build the initial train state.

        Jitted on non-CPU backends: eager flax init dispatches (and, on
        remote backends like the axon relay, COMPILES) every op as its own
        executable — pathologically slow there. On CPU the one-op-at-a-time
        eager init is faster than compiling the monolithic init program.
        """
        if jax.default_backend() == "cpu":
            return self._init_state_impl(rng, jnp.asarray(example_batch))
        return self._init_state_jit(rng, jnp.asarray(example_batch))

    @partial(jax.jit, static_argnums=0)
    def _init_state_jit(self, rng, example_batch):
        return self._init_state_impl(rng, example_batch)

    def _init_state_impl(self, rng: jax.Array, example_batch: jnp.ndarray) -> GANTrainState:
        rg, rd, rq, rs = jax.random.split(rng, 4)
        g_vars = self.model.init(
            {"params": rg, "rvq": rq}, example_batch, n_q=self.model.n_q, training=False
        )
        d_vars = self.discs.init({"params": rd}, example_batch)
        return GANTrainState.create(g_vars, d_vars, self.g_tx, self.d_tx, rs)

    def set_epoch_lr(self, state: GANTrainState, epoch: int) -> GANTrainState:
        """ExponentialLR parity: lr = lr0 * gamma^epoch, stepped per epoch."""
        lr = self.cfg.lr * (self.cfg.lr_gamma**epoch)
        return state.replace(
            g_opt_state=set_learning_rate(state.g_opt_state, lr),
            d_opt_state=set_learning_rate(state.d_opt_state, lr),
        )

    # ------------------------------------------------------------------
    def _mp(self, tree):
        """bf16 view under ``mixed_precision`` (shared cast: train/state.py)."""
        return mp_cast(tree, self.cfg.mixed_precision)

    def _f32(self, tree):
        return f32_cast(tree, self.cfg.mixed_precision)

    def _gen_forward(self, params, extra, x, n_q, rng):
        # under mixed_precision the forward runs bf16 (params + waveform
        # cast in); outputs are upcast so every loss reduces in f32. The
        # codebook EMA collection (extra) is untouched — bf16 activations
        # promote against the f32 codebook inside the quantizer, keeping
        # distance/EMA arithmetic f32.
        (g_x, commit, _codes), new_extra = self.model.apply(
            {"params": self._mp(params), **extra},
            self._mp(x),
            n_q=n_q,
            training=True,
            mutable=["codebook"],
            rngs={"rvq": rng},
        )
        return self._f32(g_x), self._f32(commit), new_extra

    def _disc_all(self, d_params, x):
        return self._f32(
            self.discs.apply({"params": self._mp(d_params)}, self._mp(x))
        )

    def _g_loss(self, out_real, out_gen, x, g_x, commit, step):
        cfg = self.cfg
        adv = (
            hinge_adversarial_g_loss(out_gen["stft"][0])
            + hinge_adversarial_g_loss(out_gen["mpd"][0])
            + hinge_adversarial_g_loss(out_gen["msd"][0])
        ) / 3.0
        feat_terms = []
        for k in ("stft", "mpd", "msd"):
            t = relative_feature_loss(out_real[k][1], out_gen[k][1])
            if cfg.feat_include_sim:
                t = t + sim_loss(out_real[k][0], out_gen[k][0])
            feat_terms.append(t)
        feat = sum(feat_terms) / 3.0
        rec = mel_reconstruction_loss(
            x, g_x, cfg.sr, scale_powers=cfg.mel_scale_powers, lambda_wav=cfg.lambda_wav
        )
        disc_factor = adopt_weight(cfg.lambda_adv, step, cfg.discriminator_iter_start)
        fm_wt = jnp.where(disc_factor == 0.0, 0.0, cfg.lambda_feat)
        total = rec + disc_factor * adv + fm_wt * feat + cfg.lambda_com * commit
        return total, dict(rec_loss=rec, adv_g_loss=adv, feat_loss=feat, commit_loss=commit)

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: GANTrainState, x: jnp.ndarray
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        if self.cfg.accum_steps > 1:
            return self._train_step_accum(state, x)
        cfg = self.cfg
        rng, k_bw1, k_bw2, k_rvq1, k_rvq2 = jax.random.split(state.rng, 5)

        # ---- generator phase ----
        n_q1 = self.model.sample_n_q(k_bw1)

        def g_loss_fn(g_params):
            g_x, commit, new_extra = self._gen_forward(
                g_params, state.g_extra, x, n_q1, k_rvq1
            )
            out_real = self._disc_all(state.d_params, x)
            out_gen = self._disc_all(state.d_params, g_x)
            total, metrics = self._g_loss(out_real, out_gen, x, g_x, commit, state.step)
            return total, (new_extra, metrics)

        (loss_g_total, (g_extra1, g_metrics)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        g_updates, g_opt_state = self.g_tx.update(
            g_grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---- discriminator phase (fresh generator forward, as in the
        # reference loop over optimizer_idx; output detached) ----
        n_q2 = self.model.sample_n_q(k_bw2)
        g_x2, _, g_extra2 = self._gen_forward(g_params, g_extra1, x, n_q2, k_rvq2)
        g_x2 = jax.lax.stop_gradient(g_x2)

        def d_loss_fn(d_params):
            out_real = self._disc_all(d_params, x)
            out_gen = self._disc_all(d_params, g_x2)
            d = (
                hinge_discriminator_loss(out_real["stft"][0], out_gen["stft"][0])
                + hinge_discriminator_loss(out_real["mpd"][0], out_gen["mpd"][0])
                + hinge_discriminator_loss(out_real["msd"][0], out_gen["msd"][0])
            ) / 3.0
            disc_factor = adopt_weight(cfg.lambda_adv, state.step, cfg.discriminator_iter_start)
            return disc_factor * d

        loss_d, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt_state = self.d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics = dict(loss_g=loss_g_total, loss_d=loss_d, **g_metrics)
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            g_extra=g_extra2,
            g_opt_state=g_opt_state,
            d_params=d_params,
            d_opt_state=d_opt_state,
            rng=rng,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def _train_step_accum(
        self, state: GANTrainState, x: jnp.ndarray
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        """``train_step`` over ``accum_steps`` sequential microbatches.

        A ``lax.scan`` keeps one microbatch's activations live at a time
        (peak memory ~B/k of the monolithic step); per-phase gradients are
        the mean over microbatches, applied in ONE optimizer update — the
        exact full-batch gradient for every loss term (all are batch
        means). The quantizer EMA threads through the scan (see
        ``EncodecTrainConfig.accum_steps``). One bandwidth ``n_q`` draw per
        phase, like the monolithic step.
        """
        cfg = self.cfg
        k = cfg.accum_steps
        B = x.shape[0]
        assert B % k == 0, f"batch {B} not divisible by accum_steps {k}"
        xm = x.reshape(k, B // k, x.shape[1])
        rng, k_bw1, k_bw2, k_rvq1, k_rvq2 = jax.random.split(state.rng, 5)

        # ---- generator phase ----
        n_q1 = self.model.sample_n_q(k_bw1)

        def g_micro(carry, inp):
            extra, acc = carry
            xi, key = inp

            def g_loss_fn(g_params):
                g_x, commit, new_extra = self._gen_forward(
                    g_params, extra, xi, n_q1, key
                )
                out_real = self._disc_all(state.d_params, xi)
                out_gen = self._disc_all(state.d_params, g_x)
                total, metrics = self._g_loss(
                    out_real, out_gen, xi, g_x, commit, state.step
                )
                return total, (new_extra, metrics)

            (loss, (new_extra, metrics)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.g_params)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return (new_extra, acc), (loss, metrics)

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.g_params)
        (g_extra1, g_acc), (g_losses, g_metrics_k) = jax.lax.scan(
            g_micro, (state.g_extra, zero_g), (xm, jax.random.split(k_rvq1, k))
        )
        g_grads = jax.tree_util.tree_map(lambda t: t / k, g_acc)
        g_updates, g_opt_state = self.g_tx.update(
            g_grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---- discriminator phase ----
        n_q2 = self.model.sample_n_q(k_bw2)

        def d_micro(carry, inp):
            extra, acc = carry
            xi, key = inp
            g_x2, _, new_extra = self._gen_forward(g_params, extra, xi, n_q2, key)
            g_x2 = jax.lax.stop_gradient(g_x2)

            def d_loss_fn(d_params):
                out_real = self._disc_all(d_params, xi)
                out_gen = self._disc_all(d_params, g_x2)
                d = (
                    hinge_discriminator_loss(out_real["stft"][0], out_gen["stft"][0])
                    + hinge_discriminator_loss(out_real["mpd"][0], out_gen["mpd"][0])
                    + hinge_discriminator_loss(out_real["msd"][0], out_gen["msd"][0])
                ) / 3.0
                disc_factor = adopt_weight(
                    cfg.lambda_adv, state.step, cfg.discriminator_iter_start
                )
                return disc_factor * d

            loss_d, grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return (new_extra, acc), loss_d

        zero_d = jax.tree_util.tree_map(jnp.zeros_like, state.d_params)
        (g_extra2, d_acc), d_losses = jax.lax.scan(
            d_micro, (g_extra1, zero_d), (xm, jax.random.split(k_rvq2, k))
        )
        d_grads = jax.tree_util.tree_map(lambda t: t / k, d_acc)
        d_updates, d_opt_state = self.d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics = dict(
            loss_g=jnp.mean(g_losses),
            loss_d=jnp.mean(d_losses),
            **jax.tree_util.tree_map(jnp.mean, g_metrics_k),
        )
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            g_extra=g_extra2,
            g_opt_state=g_opt_state,
            d_params=d_params,
            d_opt_state=d_opt_state,
            rng=rng,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def eval_step(
        self, state: GANTrainState, x: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """Validation criterion (reference criterion_g/criterion_d +
        valid sweep, main_launch.py:365-429)."""
        cfg = self.cfg
        (g_x, commit, _codes) = self.model.apply(
            {"params": state.g_params, **state.g_extra},
            x,
            n_q=self.model.n_q,
            training=False,
        )
        out_real = self._disc_all(state.d_params, x)
        out_gen = self._disc_all(state.d_params, g_x)
        adv = (
            hinge_adversarial_g_loss(out_gen["stft"][0])
            + hinge_adversarial_g_loss(out_gen["mpd"][0])
            + hinge_adversarial_g_loss(out_gen["msd"][0])
        ) / 3.0
        feat = (
            relative_feature_loss(out_real["stft"][1], out_gen["stft"][1])
            + sim_loss(out_real["stft"][0], out_gen["stft"][0])
            + relative_feature_loss(out_real["mpd"][1], out_gen["mpd"][1])
            + sim_loss(out_real["mpd"][0], out_gen["mpd"][0])
            + relative_feature_loss(out_real["msd"][1], out_gen["msd"][1])
            + sim_loss(out_real["msd"][0], out_gen["msd"][0])
        ) / 3.0
        rec = mel_reconstruction_loss(
            x, g_x, cfg.sr, scale_powers=cfg.mel_scale_powers, lambda_wav=cfg.lambda_wav
        )
        total = (
            cfg.lambda_com * commit
            + cfg.lambda_adv * adv
            + cfg.lambda_feat * feat
            + cfg.lambda_rec * rec
        )
        d = (
            hinge_discriminator_loss(out_real["stft"][0], out_gen["stft"][0])
            + hinge_discriminator_loss(out_real["mpd"][0], out_gen["mpd"][0])
            + hinge_discriminator_loss(out_real["msd"][0], out_gen["msd"][0])
        ) / 3.0
        return dict(
            valid_loss_g=total, valid_loss_d=d, rec_loss=rec, adv_g_loss=adv,
            feat_loss=feat, commit_loss=commit,
        )
