"""Weight-norm folding for inference (remove_weight_norm equivalent).

The reference folds the (g, v) parametrization into plain kernels before
serving (models/encodec/test.py:127-155, hificodec models.py remove_weight_norm).
Here: walk the param tree, replace every ``kernel_v``/``kernel_g`` pair with
``kernel = g * v / ||v||``, and run the model with ``norm='none'`` — one
fewer normalization per conv per step.

Norm axes mirror nn/conv.py: conv1d kernels ``[K, I, O]`` reduce (0, 1);
transposed-conv kernels reduce (0, 2); conv2d ``[Kh, Kw, I, O]`` reduce
(0, 1, 2). The axis choice is recovered from the parameter's context: keys
under a ``convtr`` module are transposed.

Folded kernels are produced as DEVICE arrays (jnp): a numpy leaf in the
params tree would be re-uploaded host->device on EVERY jitted apply — on
the TPU relay that costs seconds per call and silently dominates serving
latency (measured 2.3 s/step before this was device-pinned).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp


def _fold_kernel(v: jnp.ndarray, g: jnp.ndarray, transposed: bool) -> jnp.ndarray:
    if v.ndim == 3:
        axes = (0, 2) if transposed else (0, 1)
    elif v.ndim == 4:
        axes = (0, 1, 2)
    else:
        raise ValueError(f"unexpected kernel rank {v.ndim}")
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    return (g * v / norm).astype(v.dtype)


def fold_weight_norm(params: Any, _path: Tuple[str, ...] = ()) -> Any:
    """Return a params tree with all weight-norm pairs folded to ``kernel``."""
    if not isinstance(params, dict):
        return params
    out: Dict[str, Any] = {}
    keys = set(params)
    if "kernel_v" in keys and "kernel_g" in keys:
        # transposed kernels: SConvTranspose1d's inner 'convtr', or the
        # HiFi-GAN *generator's* ups_{i} (the encoder's ups_ are plain convs)
        transposed = any(p == "convtr" for p in _path) or (
            "generator" in _path and any(p.startswith("ups_") for p in _path)
        )
        v = jnp.asarray(params["kernel_v"])
        g = jnp.asarray(params["kernel_g"])
        out["kernel"] = _fold_kernel(v, g, transposed)
        for k in keys - {"kernel_v", "kernel_g"}:
            out[k] = fold_weight_norm(params[k], _path + (k,))
        return out
    for k in keys:
        out[k] = fold_weight_norm(params[k], _path + (k,))
    return out


def fold_vqvae(model, variables):
    """(VQVAE, variables) -> (norm='none' VQVAE, folded variables).

    The HiFi-Codec serving path (reference models.py:112-124,177-188
    remove_weight_norm; vqvae_copy_syn.py:33): fold every (g, v) pair in the
    encoder/generator trees into plain kernels. The GRVQ codebooks carry no
    weight norm and pass through untouched.
    """
    folded_model = model.clone(norm="none")
    folded = dict(variables)
    folded["params"] = fold_weight_norm(variables["params"])
    return folded_model, folded


def fold_soundstream(model, variables):
    """(model, variables) -> (norm='none' model, folded variables).

    The returned pair produces identical outputs (float tolerance) with the
    weight-norm arithmetic removed from every forward.
    """
    import dataclasses

    folded_model = dataclasses.replace(model, norm="none")
    folded = dict(variables)
    folded["params"] = fold_weight_norm(variables["params"])
    return folded_model, folded
