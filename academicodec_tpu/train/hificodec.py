"""HiFi-Codec GAN trainer: D-then-G jitted step on a data mesh.

Reproduces the reference hot loop (models/hificodec/train.py:205-390):

  * one generator forward per step, reused detached for the D phase and
    with gradients for the G phase (opposite phase order vs encodec);
  * LS-GAN losses, absolute feature loss x2, mel terms
    ``45*L1(cfg mel) + L1(mel_512) + L1(mel_256)``, ``+ 10 * loss_q``;
  * spectral-norm power iteration (first MSD scale) advances once per step
    in the D phase.
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
    absolute_feature_loss,
    ls_discriminator_loss,
    ls_generator_loss,
)
from academicodec_tpu.losses.mel import hifigan_mel_losses
from academicodec_tpu.models.hificodec import VQVAE
from academicodec_tpu.nn.hifigan import HiFiCodecConfig
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
class HiFiCodecTrainConfig:
    model: HiFiCodecConfig = HiFiCodecConfig()
    learning_rate: float = 2e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.9
    lr_decay: float = 0.98  # per-epoch (config_24k_320d.json:8)
    lambda_q: float = 10.0  # loss_q weight (train.py:287)
    # discriminator topology (reference defaults; shrinkable for tests)
    stft_filters: int = 32
    stft_n_ffts: Tuple[int, ...] = (1024, 2048, 512, 256, 128)
    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    # gradient accumulation: split each [B, T] batch into this many
    # sequential microbatches per optimizer update (B % accum_steps == 0).
    # Reproduces the reference's 8-GPU effective batch (80, readme) on
    # fewer chips: peak activation memory scales with B / accum_steps. For
    # THIS family the accumulated step is numerically identical to the
    # monolithic one (up to reduction order): every loss is a batch mean,
    # the GRVQ codebooks are gradient-trained (no EMA), and the
    # spectral-norm power iteration is input-independent, so each
    # microbatch derives the same advanced `u` the full batch would
    # (tests/test_grad_accum.py pins this).
    accum_steps: int = 1
    # bf16 mixed-precision training: generator + discriminator forwards
    # (and their backwards) run in bfloat16 via differentiable param/input
    # casts at the loss boundary; master weights, Adam moments, spectral-u
    # state, and loss reductions (mel/LS-GAN/feature, on f32-upcast
    # outputs) stay float32. The GRVQ codebooks are gradient-trained
    # params, so under MP the code assignment runs bf16 while codebook
    # updates accumulate f32. No reference counterpart (trains f32).
    mixed_precision: bool = False


class _Discriminators(nn.Module):
    """mpd + msd (hificodec flavor) + MS-STFT (train.py:77-79)."""

    stft_filters: int = 32
    stft_n_ffts: Tuple[int, ...] = (1024, 2048, 512, 256, 128)
    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        self.mpd = MultiPeriodDiscriminator(
            flavor="hificodec", periods=self.mpd_periods, dtype=self.dtype
        )
        self.msd = MultiScaleDiscriminator(
            flavor="hificodec", num_scales=self.msd_scales, dtype=self.dtype
        )
        self.mstftd = MultiScaleSTFTDiscriminator(
            filters=self.stft_filters,
            n_ffts=self.stft_n_ffts,
            hop_lengths=tuple(n // 4 for n in self.stft_n_ffts),
            win_lengths=self.stft_n_ffts,
            dtype=self.dtype,
        )

    def __call__(self, x: jnp.ndarray):
        return {"mpd": self.mpd(x), "msd": self.msd(x), "mstftd": self.mstftd(x)}


class HiFiCodecTrainer:
    def __init__(self, config: HiFiCodecTrainConfig):
        self.cfg = config
        self.model = VQVAE(config=config.model)
        self.discs = _Discriminators(
            stft_filters=config.stft_filters,
            stft_n_ffts=config.stft_n_ffts,
            mpd_periods=config.mpd_periods,
            msd_scales=config.msd_scales,
        )
        self.g_tx = make_optimizer(
            "adam", config.learning_rate, config.adam_b1, config.adam_b2
        )
        self.d_tx = make_optimizer(
            "adam", config.learning_rate, config.adam_b1, config.adam_b2
        )

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
        rg, rd, rs = jax.random.split(rng, 3)
        g_vars = self.model.init({"params": rg}, example_batch, training=False)
        d_vars = self.discs.init({"params": rd}, example_batch)
        return GANTrainState.create(g_vars, d_vars, self.g_tx, self.d_tx, rs)

    def set_epoch_lr(self, state: GANTrainState, epoch: int) -> GANTrainState:
        lr = self.cfg.learning_rate * (self.cfg.lr_decay**epoch)
        return state.replace(
            g_opt_state=set_learning_rate(state.g_opt_state, lr),
            d_opt_state=set_learning_rate(state.d_opt_state, lr),
        )

    def _mel_cfg(self) -> dict:
        h = self.cfg.model
        return dict(
            n_fft=h.n_fft,
            num_mels=h.num_mels,
            sampling_rate=h.sampling_rate,
            hop_size=h.hop_size,
            win_size=h.win_size,
            fmin=h.fmin,
            fmax_for_loss=h.fmax_for_loss,
        )

    # ------------------------------------------------------------------
    def _mp(self, tree):
        """bf16 view under ``mixed_precision`` (shared cast: train/state.py)."""
        return mp_cast(tree, self.cfg.mixed_precision)

    def _f32(self, tree):
        return f32_cast(tree, self.cfg.mixed_precision)

    def _gen_apply(self, g_params, g_extra, y):
        """Generator forward, bf16 under ``mixed_precision`` with f32-upcast
        outputs (mel + quantizer losses then reduce in f32)."""
        y_hat, loss_q, codes = self.model.apply(
            {"params": self._mp(g_params), **g_extra}, self._mp(y), training=True
        )
        return self._f32(y_hat), self._f32(loss_q), codes

    def _disc_apply(self, d_params, extra, y, mutable=False):
        """Discriminator bundle forward, bf16 under ``mixed_precision``;
        logits/features upcast to f32 for the losses. The spectral-norm
        state stays f32 (its f32 ``u`` promotes the power iteration)."""
        variables = {"params": self._mp(d_params), **extra}
        if mutable:
            out, new_spec = self.discs.apply(
                variables, self._mp(y), mutable=["spectral"]
            )
            return self._f32(out), new_spec
        return self._f32(self.discs.apply(variables, self._mp(y)))

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: GANTrainState, y: jnp.ndarray
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        """``y: [B, T]`` ground-truth segments."""
        if self.cfg.accum_steps > 1:
            return self._train_step_accum(state, y)
        cfg = self.cfg

        # single generator forward (reference train.py:214-218)
        y_g_hat, loss_q, _codes = self._gen_apply(state.g_params, state.g_extra, y)
        y_g_det = jax.lax.stop_gradient(y_g_hat)

        # ---- discriminator phase first ----
        # spectral-norm `u` advances once per step, here in the D-real pass;
        # the D-fake and G passes below reuse it. Torch advances u on every
        # forward (3+/step) — a known intentional deviation, see
        # COMPONENTS.md "Known intentional deviations" #6.
        def d_loss_fn(d_params):
            out_real, new_spec = self._disc_apply(
                d_params, state.d_extra, y, mutable=True
            )
            out_gen = self._disc_apply(
                d_params, {"spectral": new_spec["spectral"]}, y_g_det
            )
            total = 0.0
            for k in ("msd", "mpd", "mstftd"):
                l, _, _ = ls_discriminator_loss(out_real[k][0], out_gen[k][0])
                total = total + l
            return total, new_spec

        (loss_d, new_spec), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        d_updates, d_opt_state = self.d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        d_extra = {**state.d_extra, "spectral": new_spec["spectral"]}

        # ---- generator phase (rebuild the graph so grads flow through
        # encoder/quantizer/generator; same per-step data) ----
        def g_loss_fn(g_params):
            y_hat, loss_q_g, _ = self._gen_apply(g_params, state.g_extra, y)
            loss_mel, mel_error = hifigan_mel_losses(y, y_hat, None, **self._mel_cfg())
            out_real = self._disc_apply(d_params, d_extra, y)
            out_gen = self._disc_apply(d_params, d_extra, y_hat)
            total = loss_mel + cfg.lambda_q * loss_q_g
            for k in ("msd", "mpd", "mstftd"):
                gen_l, _ = ls_generator_loss(out_gen[k][0])
                fm_l = absolute_feature_loss(out_real[k][1], out_gen[k][1])
                total = total + gen_l + fm_l
            return total, dict(loss_q=loss_q_g, mel_error=mel_error)

        (loss_g, g_metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        g_updates, g_opt_state = self.g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = dict(loss_gen_all=loss_g, loss_disc_all=loss_d, **g_metrics)
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            g_opt_state=g_opt_state,
            d_params=d_params,
            d_extra=d_extra,
            d_opt_state=d_opt_state,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def _train_step_accum(
        self, state: GANTrainState, y: jnp.ndarray
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        """``train_step`` over ``accum_steps`` sequential microbatches.

        Numerically identical to the monolithic step (up to reduction
        order) — see ``HiFiCodecTrainConfig.accum_steps``. Every microbatch
        computes the spectral-norm update from the SAME pre-step ``(W, u)``
        (the power iteration is input-independent), so the advanced ``u``
        equals the monolithic step's; the last scan iterate is kept.
        """
        cfg = self.cfg
        k = cfg.accum_steps
        B = y.shape[0]
        assert B % k == 0, f"batch {B} not divisible by accum_steps {k}"
        ym = y.reshape(k, B // k, y.shape[1])

        # ---- discriminator phase first (reference order) ----
        def d_micro(acc, yi):
            y_g_hat, _, _ = self._gen_apply(state.g_params, state.g_extra, yi)
            y_g_det = jax.lax.stop_gradient(y_g_hat)

            def d_loss_fn(d_params):
                out_real, new_spec = self._disc_apply(
                    d_params, state.d_extra, yi, mutable=True
                )
                out_gen = self._disc_apply(
                    d_params, {"spectral": new_spec["spectral"]}, y_g_det
                )
                total = 0.0
                for kk in ("msd", "mpd", "mstftd"):
                    l, _, _ = ls_discriminator_loss(out_real[kk][0], out_gen[kk][0])
                    total = total + l
                return total, new_spec

            (loss_d, new_spec), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.d_params)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return acc, (loss_d, new_spec)

        zero_d = jax.tree_util.tree_map(jnp.zeros_like, state.d_params)
        d_acc, (d_losses, specs) = jax.lax.scan(d_micro, zero_d, ym)
        d_grads = jax.tree_util.tree_map(lambda t: t / k, d_acc)
        d_updates, d_opt_state = self.d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)
        # every microbatch derived the same u from the same (W, u_old)
        new_spec = jax.tree_util.tree_map(lambda a: a[-1], specs)
        d_extra = {**state.d_extra, "spectral": new_spec["spectral"]}

        # ---- generator phase ----
        def g_micro(acc, yi):
            def g_loss_fn(g_params):
                y_hat, loss_q_g, _ = self._gen_apply(g_params, state.g_extra, yi)
                loss_mel, mel_error = hifigan_mel_losses(
                    yi, y_hat, None, **self._mel_cfg()
                )
                out_real = self._disc_apply(d_params, d_extra, yi)
                out_gen = self._disc_apply(d_params, d_extra, y_hat)
                total = loss_mel + cfg.lambda_q * loss_q_g
                for kk in ("msd", "mpd", "mstftd"):
                    gen_l, _ = ls_generator_loss(out_gen[kk][0])
                    fm_l = absolute_feature_loss(out_real[kk][1], out_gen[kk][1])
                    total = total + gen_l + fm_l
                return total, dict(loss_q=loss_q_g, mel_error=mel_error)

            (loss_g, metrics), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.g_params)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return acc, (loss_g, metrics)

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.g_params)
        g_acc, (g_losses, g_metrics_k) = jax.lax.scan(g_micro, zero_g, ym)
        g_grads = jax.tree_util.tree_map(lambda t: t / k, g_acc)
        g_updates, g_opt_state = self.g_tx.update(
            g_grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = dict(
            loss_gen_all=jnp.mean(g_losses),
            loss_disc_all=jnp.mean(d_losses),
            **jax.tree_util.tree_map(jnp.mean, g_metrics_k),
        )
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            g_opt_state=g_opt_state,
            d_params=d_params,
            d_extra=d_extra,
            d_opt_state=d_opt_state,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state: GANTrainState, y: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Validation mel error (reference train.py:340-386)."""
        y_hat, loss_q, _ = self.model.apply(
            {"params": state.g_params, **state.g_extra}, y, training=False
        )
        _, mel_error = hifigan_mel_losses(y, y_hat, None, **self._mel_cfg())
        return dict(val_mel_error=mel_error, loss_q=loss_q)
