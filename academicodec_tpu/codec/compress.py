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

    def compress(self, wav: np.ndarray) -> bytes:
        """wav ``[T]`` float32 -> ECDC bytes."""
        codes = np.asarray(self._encode(self.variables, wav[None, :]))  # [n_q, 1, T']
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
        wav = np.asarray(self._decode(self.variables, codes[:, None, :]))[0]
        # trim the ceil-mode padding back to the original length
        if "audio_length" in meta:
            wav = wav[: meta["audio_length"]]
        return wav, meta["sr"]
