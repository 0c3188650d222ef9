"""GAN training state: two optimizers over generator/discriminator trees.

The whole state is one pytree (``flax.struct`` dataclass), so a train step
is a pure ``state -> state`` function that jit/pjit can donate and shard.
Learning rates are injected hyperparameters (``optax.inject_hyperparams``)
so per-epoch exponential decay — the reference's ``ExponentialLR`` stepping
(main_launch.py:239-249, hificodec train.py:131-134) — is a host-side
assignment, not a recompile.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


def make_optimizer(
    kind: str, learning_rate: float, b1: float, b2: float
) -> optax.GradientTransformation:
    opt_cls = {"adamw": optax.adamw, "adam": optax.adam}[kind]
    return optax.inject_hyperparams(opt_cls)(learning_rate=learning_rate, b1=b1, b2=b2)


def mp_cast(tree: Any, enabled: bool = True) -> Any:
    """bf16 view of a tree's f32 leaves under ``mixed_precision`` (the cast
    is differentiable, so grads land back on the f32 master weights)."""
    if not enabled:
        return tree
    return jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
        tree,
    )


def f32_cast(tree: Any, enabled: bool = True) -> Any:
    """Inverse of :func:`mp_cast`: upcast bf16 leaves so losses reduce f32."""
    if not enabled:
        return tree
    return jax.tree_util.tree_map(
        lambda t: t.astype(jnp.float32) if t.dtype == jnp.bfloat16 else t,
        tree,
    )


def set_learning_rate(opt_state, lr: float):
    """Write a new learning rate into an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


@flax.struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    # generator side
    g_params: Any
    g_extra: Any  # non-trained collections (e.g. RVQ 'codebook')
    g_opt_state: Any
    # discriminator side (single chained optimizer, like the reference)
    d_params: Any
    d_extra: Any  # e.g. spectral-norm power-iteration vectors
    d_opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, g_vars, d_vars, g_tx, d_tx, rng):
        g_params = g_vars["params"]
        g_extra = {k: v for k, v in g_vars.items() if k != "params"}
        d_params = d_vars["params"]
        d_extra = {k: v for k, v in d_vars.items() if k != "params"}
        return cls(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_extra=g_extra,
            g_opt_state=g_tx.init(g_params),
            d_params=d_params,
            d_extra=d_extra,
            d_opt_state=d_tx.init(d_params),
            rng=rng,
        )
