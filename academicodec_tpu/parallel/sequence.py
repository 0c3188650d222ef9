"""Sequence-parallel (time-sharded) serving: one long stream, many chips.

The reference's only parallelism is data parallelism over training batches
(SURVEY §2.8; DDP at main_launch.py:199-213) — a single long file is always
served by a single device. This module shards the TIME axis of a waveform
over a ``jax.sharding.Mesh`` instead, so the latency of ONE stream scales
with the number of chips: each device owns a contiguous time slice of
every conv activation, GSPMD inserts the halo exchanges a strided/dilated
conv needs at slice boundaries (``collective-permute`` over ICI), and the
tiny frame-rate bottleneck (LSTM scan, RVQ codebook lookups — KB-sized at
75-100 Hz) is gathered where sequential semantics demand it. This is the
"annotate shardings, let XLA insert collectives" recipe: no hand-written
transport, and the SAME model code serves unsharded, batch-sharded
(``mesh.py``) and time-sharded.

Numerics: every output sample/token is produced by the same dot products
over the same windows as the unsharded graph — spatial partitioning moves
data, not math. Encodec/SoundStream serving has no cross-time reductions
at all (pointwise activations + convs + per-frame RVQ), so tokens stay
bit-exact (pinned in tests/test_sharded_serving.py). HiFi-Codec's encoder
GroupNorms DO reduce over time — partitioned partial sums change the
reduction order — so its tokens are exact-to-argmin only (same test,
float tolerance on the pre-quantizer latents).

Use when serving few long streams (podcast/audiobook transcoding, token
extraction for long-context TTS corpora); use batch DP (``mesh.py``) when
serving many short ones.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from academicodec_tpu.parallel.mesh import replicate


def time_sharding(mesh: Mesh, ndim: int, time_dim: int = 1, axis: str = "data") -> NamedSharding:
    """Sharding that splits ``time_dim`` over the mesh, replicating the rest."""
    spec: list = [None] * ndim
    spec[time_dim] = axis
    return NamedSharding(mesh, P(*spec))


def shard_time(x: Any, mesh: Mesh, time_dim: int = 1, axis: str = "data"):
    """Device-put an array with its time axis sharded over the mesh.

    ``jax.device_put`` requires the sharded dim to divide evenly; when it
    does not (e.g. a frame count like 50 on an 8-mesh), fall back to a
    replicated put — GSPMD still partitions the interior compute from the
    constraint the jitted graph's other operands provide.
    """
    x = np.asarray(x)
    n = int(mesh.shape[axis])
    if x.shape[time_dim] % n:
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.device_put(x, time_sharding(mesh, x.ndim, time_dim, axis))


class TimeShardedSoundStream:
    """Time-sharded encode/decode for a SoundStream/Encodec model.

    ``encode(wav [B, T])`` shards T over the mesh and returns codes
    ``[n_q, B, frames]`` with frames sharded the same way; ``decode``
    consumes them sharded and returns the waveform time-sharded. Fetching
    to host (``np.asarray``) gathers. Params are replicated once.
    """

    def __init__(self, model, variables, mesh: Mesh, target_bw: Optional[float] = None,
                 axis: str = "data"):
        self.model = model
        self.mesh = mesh
        self.axis = axis
        self.variables = replicate(variables, mesh)
        bw = target_bw if target_bw is not None else model.target_bandwidths[-1]
        cls = type(model)
        self._encode = jax.jit(
            lambda v, w: model.apply(v, w, target_bw=bw, method=cls.encode)
        )
        self._decode = jax.jit(
            lambda v, c: model.apply(v, c, method=cls.decode)
        )

    def encode(self, wav) -> jax.Array:
        return self._encode(self.variables, shard_time(wav, self.mesh, 1, self.axis))

    def decode(self, codes) -> jax.Array:
        if not isinstance(codes, jax.Array) or codes.sharding.is_fully_replicated:
            codes = shard_time(codes, self.mesh, 2, self.axis)
        return self._decode(self.variables, codes)

    def roundtrip(self, wav) -> Tuple[jax.Array, jax.Array]:
        codes = self.encode(wav)
        return codes, self.decode(codes)


class TimeShardedVQVAE:
    """Time-sharded encode/decode for a HiFi-Codec VQVAE.

    Tokens are ``[B, frames, n_res*G]`` with frames sharded. The encoder's
    accumulated-sum GroupNorms reduce over the sharded axis (GSPMD turns
    them into partial sums + ``all-reduce``), so latents match unsharded
    serving to float tolerance rather than bit-exactly; waveform decode has
    no cross-time reductions.
    """

    def __init__(self, model, variables, mesh: Mesh, axis: str = "data"):
        self.model = model
        self.mesh = mesh
        self.axis = axis
        self.variables = replicate(variables, mesh)
        cls = type(model)
        self._encode = jax.jit(
            lambda v, w: model.apply(v, w, method=cls.encode)
        )
        self._decode = jax.jit(
            lambda v, c: model.apply(v, c, method=cls.decode)
        )

    def encode(self, wav) -> jax.Array:
        return self._encode(self.variables, shard_time(wav, self.mesh, 1, self.axis))

    def decode(self, codes) -> jax.Array:
        if not isinstance(codes, jax.Array) or codes.sharding.is_fully_replicated:
            codes = shard_time(codes, self.mesh, 1, self.axis)
        return self._decode(self.variables, codes)
