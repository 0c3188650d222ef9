"""Whole-file compress/decompress on top of the ECDC container.

Completes the layer the reference ships orphaned (SURVEY §2.2/L2b: binary.py
defines the format, nothing in-tree writes files with it): device-side
``encode() -> tokens``, host-side bit packing into an ECDC stream, and the
inverse. The metadata header carries everything needed to rebuild the
decoder configuration.

Format: ECDC header (JSON metadata: model family, sr, ratios, bandwidth,
n_frames, audio_length) followed by the codebook indices packed LSB-first at
``bits_per_codebook`` bits, layer-major (codes[k, b, t] iterated k, t) per
batch item — batch size 1 per file, like the reference CLI.
"""

from __future__ import annotations

import io
import math
from typing import Optional, Tuple

import numpy as np

from academicodec_tpu.codec.binary import (
    pack_array,
    read_ecdc_header,
    unpack_array,
    write_ecdc_header,
)


def compress_codes(
    codes: np.ndarray,
    *,
    bits_per_codebook: int,
    metadata: dict,
) -> bytes:
    """codes ``[n_q, T]`` int -> ECDC byte stream."""
    n_q, n_frames = codes.shape
    fo = io.BytesIO()
    meta = dict(metadata)
    meta.update(n_q=int(n_q), n_frames=int(n_frames), bits=int(bits_per_codebook))
    write_ecdc_header(fo, meta)
    fo.write(pack_array(np.asarray(codes).reshape(-1), bits_per_codebook))
    return fo.getvalue()


def decompress_codes(blob: bytes) -> Tuple[np.ndarray, dict]:
    """ECDC byte stream -> (codes ``[n_q, T]`` int32, metadata)."""
    fo = io.BytesIO(blob)
    meta = read_ecdc_header(fo)
    n_q, n_frames, bits = meta["n_q"], meta["n_frames"], meta["bits"]
    out = unpack_array(fo.read(), bits, n_q * n_frames)
    return out.reshape(n_q, n_frames), meta


def compress_tokens_guarded(
    codes: np.ndarray,
    *,
    bits_per_codebook: int,
    metadata: dict,
    lm=None,
    lm_variables=None,
) -> bytes:
    """codes ``[n_q, T]`` -> ECDC bytes, LM-entropy-coded when that is
    actually smaller.

    Per-stream expansion guard: an LM fed streams longer than its training
    length can EXPAND the file past raw packing (measured: a 1 s-crop LM
    codes 5 s streams at 11.0 bits/token vs 10-bit raw — BENCHMARKS.md "LM
    entropy coding"), so the raw-packed blob is always built and whichever
    coding is smaller is emitted. The per-blob header's ``lm`` flag keeps
    mixed outputs decodable by :func:`decompress_tokens`.
    """
    raw = compress_codes(
        codes, bits_per_codebook=bits_per_codebook, metadata=metadata
    )
    if lm is not None:
        from academicodec_tpu.codec.lm_compress import compress_tokens_with_lm

        lm_blob = compress_tokens_with_lm(lm, lm_variables, codes, metadata=metadata)
        if len(lm_blob) < len(raw):
            return lm_blob
    return raw


def decompress_tokens(blob: bytes, lm=None, lm_variables=None) -> Tuple[np.ndarray, dict]:
    """Inverse of :func:`compress_tokens_guarded`: the header's ``lm`` flag
    selects raw unpacking or LM entropy decoding."""
    if read_ecdc_header(io.BytesIO(blob)).get("lm"):
        if lm is None:
            raise ValueError(
                "stream is LM-entropy-coded; pass lm/lm_variables "
                "(cli: --lm <checkpoint dir>)"
            )
        from academicodec_tpu.codec.lm_compress import decompress_tokens_with_lm

        return decompress_tokens_with_lm(lm, lm_variables, blob)
    return decompress_codes(blob)


class SoundStreamCompressor:
    """File-level compression API for a SoundStream/Encodec model.

    Mirrors the reference compression CLI semantics
    (models/encodec/test.py:102-123) plus the ECDC container.
    """

    def __init__(
        self,
        model,
        variables,
        target_bw: Optional[float] = None,
        lm=None,
        lm_variables=None,
        bucket_seconds: Optional[float] = None,
        mesh=None,
        shard_axis: str = "batch",
    ):
        import jax

        self.model = model
        self.variables = variables
        # Data-parallel corpus serving: with a ``jax.sharding.Mesh`` the
        # batch dim of every encode/decode is sharded over the mesh's
        # devices (params replicated once here) — the multi-chip deployment
        # mode for ``compress_batch``. GSPMD partitions the conv/RVQ graphs
        # with no cross-device collectives on this path (everything is
        # batch-pointwise), so per-item blobs stay byte-identical to the
        # unsharded path (tests/test_sharded_serving.py). The reference's
        # only serving mode is one file per call on one device
        # (test.py:102-123).
        #
        # ``shard_axis="time"`` instead shards the TIME axis over the mesh
        # (sequence-parallel serving, parallel/sequence.py): one long
        # stream's latency scales with chips via GSPMD conv halo exchanges.
        # Tokens — and therefore blobs — stay bit-exact (serving has no
        # cross-time reductions; tests/test_sharded_serving.py).
        if shard_axis not in ("batch", "time"):
            raise ValueError(
                f"shard_axis must be 'batch' or 'time', got {shard_axis!r}"
            )
        self.shard_axis = shard_axis
        self.mesh = mesh
        if mesh is not None:
            from academicodec_tpu.parallel import replicate

            self.variables = replicate(variables, mesh)
            if lm_variables is not None:
                lm_variables = replicate(lm_variables, mesh)
        self.target_bw = target_bw if target_bw is not None else model.target_bandwidths[-1]
        self._encode = jax.jit(
            lambda v, w: model.apply(v, w, target_bw=self.target_bw, method=type(model).encode)
        )
        self._decode = jax.jit(lambda v, c: model.apply(v, c, method=type(model).decode))
        # optional entropy model: LM-coded streams (the Encodec `lm` format
        # flag) instead of raw bit packing; typically 10-25% smaller files
        self.lm = lm
        self.lm_variables = lm_variables
        # Length bucketing (TPU serving concern the eager reference never
        # has, test.py:102-123 runs each file at its native length): under
        # jit every distinct wav length is a fresh XLA compile — 30 s-5 min
        # each through the remote-compile relay — so a directory of
        # variable-length files spends its wall clock compiling. With
        # ``bucket_seconds`` set, inputs are zero-padded up to the next
        # bucket multiple (rounded to whole hops) and token streams are
        # edge-replicated up to whole buckets on decode, bounding compiles
        # to one per bucket count. Outputs are trimmed back to the exact
        # frame/sample counts of the unpadded input. Deviation from exact-
        # length encode: the non-causal encoder's tail receptive field sees
        # the zero padding instead of reflect padding, so the last
        # ~receptive-field/hop frames of a bucketed stream may differ from
        # an exact-length encode (head frames are bit-identical; pinned in
        # tests/test_bucketed.py). Keep bucketing OFF for byte-identical
        # reference-parity bitstreams.
        self.bucket = None
        if bucket_seconds:
            hop = model.hop_length
            raw = max(1, int(round(bucket_seconds * model.sample_rate)))
            self.bucket = math.ceil(raw / hop) * hop

    def _exact_frames(self, T: int) -> int:
        """Token frames an exact-length encode of ``T`` samples yields
        (ceil-mode padded SEANet stack -> ceil(T / hop))."""
        return math.ceil(T / self.model.hop_length)

    def _meta(self, T: int) -> dict:
        return dict(
            model="soundstream",
            sr=int(self.model.sample_rate),
            ratios=[int(r) for r in self.model.ratios],
            target_bw=float(self.target_bw),
            audio_length=int(T),
        )

    def compress(self, wav: np.ndarray) -> bytes:
        """wav ``[T]`` float32 -> ECDC bytes."""
        return self.compress_batch([wav])[0]

    def compress_batch(
        self,
        wavs,
        pad_to_batch: Optional[int] = None,
    ) -> list:
        """Batched corpus serving: list of ``[T_i]`` wavs -> list of ECDC
        blobs through ONE device encode.

        The eager reference serves files one by one (test.py:102-123); at
        batch 1 a TPU chip sits at its per-dispatch floor. Batching bucketed
        inputs amortizes the dispatch and fills the MXU (BENCHMARKS.md batch
        scaling: ~3x roundtrip throughput at batch 8 vs 1). Items are padded
        to the longest bucket in the batch; with ``pad_to_batch`` the batch
        dimension is zero-padded to a fixed size so a whole corpus reuses
        one executable per bucket count (pad rows are encoded and dropped).
        Per-item blobs are byte-identical to sequential ``compress`` calls
        of the same padded length (tests/test_bucketed.py pins this).
        """
        return self.pack_submitted(
            self.submit_encode(wavs, pad_to_batch=pad_to_batch),
            [int(w.shape[-1]) for w in wavs],
        )

    def submit_encode(self, wavs, pad_to_batch: Optional[int] = None):
        """Device half of :meth:`compress_batch`: pad/stack the batch and
        dispatch the encode WITHOUT fetching (JAX dispatch is asynchronous)
        — returns the device codes array. Pair with :meth:`pack_submitted`.
        Lets a caller software-pipeline groups: the next group's host->device
        transfer and encode overlap this group's host-side packing (the
        transfer is the corpus bottleneck on relay-attached chips —
        benchmarks/corpus_serving_probe.py)."""
        Ts = [int(w.shape[-1]) for w in wavs]
        Tmax = max(Ts)
        if self.bucket:
            Tpad = math.ceil(Tmax / self.bucket) * self.bucket
        else:
            if len(set(Ts)) > 1:
                raise ValueError(
                    "compress_batch with mixed lengths requires bucket_seconds"
                )
            Tpad = Tmax
        rows = [np.pad(w, (0, Tpad - t)) for w, t in zip(wavs, Ts)]
        if pad_to_batch and len(rows) < pad_to_batch:
            rows += [np.zeros(Tpad, np.float32)] * (pad_to_batch - len(rows))
        batch = np.stack(rows)
        if self.model.dtype != np.float32:
            # cast host-side: the model promotes inputs to its compute dtype
            # anyway, and a bf16 wire format halves the upload
            batch = batch.astype(self.model.dtype)
        if self.mesh is not None:
            batch = self._shard(batch, batch_axis=0, time_axis=1)
        return self._encode(self.variables, batch)  # [n_q, B, frames]

    def _shard(self, arr: np.ndarray, batch_axis: int, time_axis: int):
        """Device-put ``arr`` sharded over the mesh on the configured axis
        (``shard_axis``: batch DP or sequence-parallel time sharding)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.shard_axis == "time":
            from academicodec_tpu.parallel.sequence import shard_time

            return shard_time(arr, self.mesh, time_dim=time_axis)
        n_dev = self.mesh.devices.size
        if arr.shape[batch_axis] % n_dev:
            raise ValueError(
                f"data-parallel serving needs the batch ({arr.shape[batch_axis]}) "
                f"divisible by the mesh size ({n_dev}); use "
                f"pad_to_batch / --batch_files at a multiple"
            )
        spec = [None] * arr.ndim
        spec[batch_axis] = self.mesh.axis_names[0]
        return jax.device_put(arr, NamedSharding(self.mesh, P(*spec)))

    def pack_submitted(self, codes_dev, lengths) -> list:
        """Host half of :meth:`compress_batch`: fetch the device codes of
        :meth:`submit_encode` and pack per-item ECDC blobs."""
        codes = np.asarray(codes_dev)
        Ts = [int(t) for t in lengths]
        blobs = []
        for i, T in enumerate(Ts):
            c = codes[:, i, : self._exact_frames(T)]
            meta = self._meta(T)
            blobs.append(
                compress_tokens_guarded(
                    c,
                    bits_per_codebook=self.model.bits_per_codebook,
                    metadata=meta,
                    lm=self.lm,
                    lm_variables=self.lm_variables,
                )
            )
        return blobs

    def _unpack_blob(self, blob: bytes) -> Tuple[np.ndarray, dict]:
        return decompress_tokens(blob, lm=self.lm, lm_variables=self.lm_variables)

    def decompress(self, blob: bytes) -> Tuple[np.ndarray, int]:
        """ECDC bytes -> (wav ``[T]``, sample_rate). The header's ``lm`` flag
        selects the decode path, so LM- and raw-coded files interoperate."""
        return self.decompress_batch([blob])[0]

    def decompress_batch(
        self,
        blobs,
        pad_to_batch: Optional[int] = None,
    ) -> list:
        """Batched inverse of :meth:`compress_batch`: list of ECDC blobs ->
        list of ``(wav [T], sample_rate)`` through ONE device decode.

        Streams are frame-padded (edge-replicated) up to the longest whole
        bucket in the batch and trimmed back to each item's exact
        ``audio_length``; ``pad_to_batch`` fixes the batch dimension so the
        executable is reused across a corpus. Mixed LM/raw blobs interoperate
        (the per-blob header selects the host-side unpacking)."""
        items = [self._unpack_blob(blob) for blob in blobs]
        n_qs = {c.shape[0] for c, _ in items}
        if len(n_qs) > 1:
            raise ValueError(
                f"decompress_batch needs a uniform codebook count, got {n_qs}"
            )
        # pad every token stream to the batch's common whole-bucket frame
        # count by repeating the final frame (a plausible continuation; the
        # junk region is trimmed below) so decode compiles once per bucket
        # count
        bf = self.bucket // self.model.hop_length if self.bucket else 1
        nmax = max(c.shape[-1] for c, _ in items)
        nb = math.ceil(nmax / bf) * bf
        rows = []
        for codes, _ in items:
            n = codes.shape[-1]
            if nb > n:
                codes = np.concatenate(
                    [codes, np.repeat(codes[:, -1:], nb - n, axis=-1)], axis=-1
                )
            rows.append(codes)
        if pad_to_batch and len(rows) < pad_to_batch:
            rows += [rows[0]] * (pad_to_batch - len(rows))
        codes_b = np.stack(rows, axis=1)  # [n_q, B, frames]
        if self.mesh is not None:
            codes_b = self._shard(codes_b, batch_axis=1, time_axis=2)
        wavs = np.asarray(self._decode(self.variables, codes_b))  # [B, T]
        out = []
        for i, (_, meta) in enumerate(items):
            wav = wavs[i]
            # trim the ceil-mode padding back to the original length
            if "audio_length" in meta:
                wav = wav[: meta["audio_length"]]
            if wav.dtype != np.float32:  # bf16 serving: f32 is the host API
                wav = wav.astype(np.float32)
            out.append((wav, meta["sr"]))
        return out
