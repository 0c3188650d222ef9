"""Token-LM trainer: teacher-forced cross-entropy over RVQ code streams.

Trains the entropy model (`models/lm.RVQTokenLM`) used by
``codec/lm_compress``. Codes come from a frozen codec's ``encode`` — the
standard two-stage pipeline (codec first, LM on its tokens). The loss is
mean cross-entropy over all ``n_q`` streams; exp(loss) bounds the achievable
compressed bitrate via the arithmetic coder.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from academicodec_tpu.models.lm import RVQTokenLM


@dataclasses.dataclass(frozen=True)
class LMTrainConfig:
    n_q: int = 8
    bins: int = 1024
    dim: int = 200
    num_heads: int = 8
    num_layers: int = 5
    past_context: int = 1000
    lr: float = 3e-4
    betas: Tuple[float, float] = (0.9, 0.95)
    # total steps for warmup+cosine lr decay; None = constant lr. A decayed
    # tail settles the final bits-per-token (the number that bounds the
    # achievable compressed bitrate) instead of leaving it bouncing at a
    # constant-lr noise floor.
    decay_steps: Optional[int] = None
    warmup_steps: int = 100


@flax.struct.dataclass
class LMTrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


class LMTrainer:
    def __init__(self, config: LMTrainConfig):
        self.cfg = config
        self.model = RVQTokenLM(
            n_q=config.n_q,
            bins=config.bins,
            dim=config.dim,
            num_heads=config.num_heads,
            num_layers=config.num_layers,
            past_context=config.past_context,
        )
        if config.decay_steps is not None:
            warmup = min(config.warmup_steps, config.decay_steps // 10)
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=config.lr,
                warmup_steps=warmup,
                decay_steps=config.decay_steps,
                end_value=0.05 * config.lr,
            )
        else:
            lr = config.lr
        self.tx = optax.adam(lr, b1=config.betas[0], b2=config.betas[1])

    def init_state(self, rng: jax.Array, example_codes: jnp.ndarray) -> LMTrainState:
        variables = self.model.init(rng, example_codes)
        return LMTrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=self.tx.init(variables["params"]),
        )

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: LMTrainState, codes: jnp.ndarray
    ) -> Tuple[LMTrainState, Dict[str, jnp.ndarray]]:
        """``codes [B, T, n_q]`` int32 -> next state + metrics."""
        bins = self.cfg.bins
        B, T, n_q = codes.shape
        bos = jnp.full((B, 1, n_q), bins, codes.dtype)
        prev = jnp.concatenate([bos, codes[:, :-1]], axis=1)

        def loss_fn(params):
            logits, _, _ = self.model.apply({"params": params}, prev)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ll = jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
            return -jnp.mean(ll)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        bits_per_token = loss / jnp.log(2.0)
        return (
            LMTrainState(step=state.step + 1, params=params, opt_state=opt_state),
            dict(ce_loss=loss, bits_per_token=bits_per_token),
        )
