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
    ):
        import jax

        self.model = model
        self.variables = variables
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

    def compress(self, wav: np.ndarray) -> bytes:
        """wav ``[T]`` float32 -> ECDC bytes."""
        wav_in = wav
        if self.bucket:
            T = int(wav.shape[-1])
            B = math.ceil(T / self.bucket) * self.bucket
            wav_in = np.pad(wav, (0, B - T))
        codes = np.asarray(self._encode(self.variables, wav_in[None, :]))  # [n_q, 1, T']
        if self.bucket:
            codes = codes[:, :, : self._exact_frames(int(wav.shape[-1]))]
        meta = dict(
            model="soundstream",
            sr=int(self.model.sample_rate),
            ratios=[int(r) for r in self.model.ratios],
            target_bw=float(self.target_bw),
            audio_length=int(wav.shape[-1]),
        )
        if self.lm is not None:
            from academicodec_tpu.codec.lm_compress import compress_tokens_with_lm

            return compress_tokens_with_lm(
                self.lm, self.lm_variables, codes[:, 0, :], metadata=meta
            )
        return compress_codes(
            codes[:, 0, :], bits_per_codebook=self.model.bits_per_codebook, metadata=meta
        )

    def decompress(self, blob: bytes) -> Tuple[np.ndarray, int]:
        """ECDC bytes -> (wav ``[T]``, sample_rate). The header's ``lm`` flag
        selects the decode path, so LM- and raw-coded files interoperate."""
        header_meta = read_ecdc_header(io.BytesIO(blob))
        if header_meta.get("lm"):
            if self.lm is None:
                raise ValueError(
                    "stream is LM-entropy-coded; pass lm/lm_variables "
                    "(cli: --lm <checkpoint dir>)"
                )
            from academicodec_tpu.codec.lm_compress import decompress_tokens_with_lm

            codes, meta = decompress_tokens_with_lm(self.lm, self.lm_variables, blob)
        else:
            codes, meta = decompress_codes(blob)
        if self.bucket:
            # pad the token stream to whole buckets by repeating the final
            # frame (a plausible continuation; the junk region is trimmed
            # below) so decode compiles once per bucket count
            bf = self.bucket // self.model.hop_length
            n = codes.shape[-1]
            nb = math.ceil(n / bf) * bf
            if nb > n:
                codes = np.concatenate(
                    [codes, np.repeat(codes[:, -1:], nb - n, axis=-1)], axis=-1
                )
        wav = np.asarray(self._decode(self.variables, codes[:, None, :]))[0]
        # trim the ceil-mode padding back to the original length
        if "audio_length" in meta:
            wav = wav[: meta["audio_length"]]
        return wav, meta["sr"]
