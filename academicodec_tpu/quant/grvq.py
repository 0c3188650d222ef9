"""Group-Residual Vector Quantization (GRVQ) — the HiFi-Codec quantizer.

``n_residual`` residual layers, each splitting the channel dim into
``n_groups`` groups with independent gradient-trained codebooks (no EMA).
Token stream order matches the reference contract that downstream
VALL-E/SoundStorm consumers rely on: ``[l0·g0, l0·g1, l1·g0, l1·g1]``
(reference: models/hificodec/models.py:430-535, vqvae.py:43-45).

TPU design: all group codebooks live in one ``[n_res, n_groups, n_codes,
group_dim]`` param; the group dimension is vectorized with one batched
einsum per residual layer (grouped MXU matmul) instead of a Python loop
over per-group ``nn.Embedding`` modules.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


class GroupResidualVQ(nn.Module):
    dim: int = 512
    n_codes: int = 1024
    n_groups: int = 2
    n_residual: int = 2
    codebook_loss_lambda: float = 1.0
    commitment_loss_lambda: float = 0.25
    dtype: Any = jnp.float32

    def setup(self):
        assert self.dim % self.n_groups == 0
        gdim = self.dim // self.n_groups

        def init(key, shape, dtype=jnp.float32):
            # reference: nn.Embedding init uniform(-1/n_e, 1/n_e) (models.py:434)
            return jax.random.uniform(key, shape, dtype, -1.0 / self.n_codes, 1.0 / self.n_codes)

        self.codebooks = self.param(
            "codebooks", init, (self.n_residual, self.n_groups, self.n_codes, gdim), self.dtype
        )

    def _quantize_layer(
        self, x: jnp.ndarray, codebook: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One residual layer. ``x: [B,T,D]``, ``codebook: [G, n_codes, gdim]``
        -> ``(z_q [B,T,D], indices [B,T,G])``."""
        B, T, D = x.shape
        G = self.n_groups
        gdim = D // G
        xg = x.reshape(B * T, G, gdim)
        # d = |x|^2 + |e|^2 - 2 x.e  per group (reference models.py:438-439)
        dots = jnp.einsum("ngd,gkd->ngk", xg, codebook, precision=HIGHEST)
        d = (
            jnp.sum(jnp.square(xg), axis=-1, keepdims=True)
            + jnp.sum(jnp.square(codebook), axis=-1)[None]
            - 2.0 * dots
        )
        idx = jnp.argmin(d, axis=-1).astype(jnp.int32)  # [B*T, G]
        # per-group gather: z_q[n, g] = codebook[g, idx[n, g]]
        z_q = jax.vmap(lambda cb, i: cb[i], in_axes=(0, 1), out_axes=1)(codebook, idx)
        z_q = z_q.reshape(B, T, D)
        return z_q, idx.reshape(B, T, G)

    def __call__(
        self, xin: jnp.ndarray, training: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """``xin [B,T,D]`` -> ``(quantized_out [B,T,D], loss, codes [B,T,n_res*G])``.

        Loss is the mean over residual layers of
        ``λ_cb · MSE(z_q, sg(x)) + λ_commit · MSE(sg(z_q), x)``
        (reference models.py:476-507).
        """
        codebooks = self.codebooks
        quantized_out = jnp.zeros_like(xin)
        residual = xin
        losses = []
        all_codes = []
        for i in range(self.n_residual):
            z_q, idx = self._quantize_layer(residual, codebooks[i])
            loss = self.codebook_loss_lambda * jnp.mean(
                jnp.square(z_q - lax.stop_gradient(residual))
            ) + self.commitment_loss_lambda * jnp.mean(
                jnp.square(lax.stop_gradient(z_q) - residual)
            )
            z_q_st = residual + lax.stop_gradient(z_q - residual)
            residual = residual - z_q_st
            quantized_out = quantized_out + z_q_st
            losses.append(loss)
            all_codes.append(idx)
        loss = jnp.mean(jnp.stack(losses))
        codes = jnp.concatenate(all_codes, axis=-1)  # [B, T, n_res*G]
        return quantized_out, loss, codes

    def embed(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Dequantize token tensor ``[B, T, n_res*G]`` -> ``[B, T, D]``
        (reference models.py:510-535; stream order [l0g0, l0g1, l1g0, l1g1])."""
        codebooks = self.codebooks
        B, T, S = codes.shape
        G = self.n_groups
        out = jnp.zeros((B, T, self.dim), self.dtype)
        for i in range(self.n_residual):
            layer_codes = codes[..., i * G : (i + 1) * G]  # [B,T,G]
            parts = [
                codebooks[i, g][layer_codes[..., g]] for g in range(G)
            ]  # each [B,T,gdim]
            out = out + jnp.concatenate(parts, axis=-1)
        return out
