"""Entropy-coded token compression: LM probabilities + arithmetic coding.

Completes the Encodec compression format the reference leaves unwired:
device-side LM probabilities feed the host-side range coder. The ECDC
header records the LM usage so decoders pick the right path (same flag
convention as the Encodec format's ``lm`` metadata field).

Both directions evaluate the LM step-by-step with carried transformer
state: the coder and decoder must see bit-identical probabilities, and a
teacher-forced full-sequence pass differs from the streaming pass at float
level (shape-dependent XLA fusion), which desynchronizes the range coder.
One jitted single-step executable serves both directions.
"""

from __future__ import annotations

import io
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from academicodec_tpu.codec.ac import (
    ArithmeticCoder,
    ArithmeticDecoder,
    build_stable_quantized_cdf,
)
from academicodec_tpu.codec.binary import read_ecdc_header, write_ecdc_header


def _make_step(lm, lm_variables):
    """One carried LM step: prev ``[1,1,n_q]`` -> (probs ``[n_q,bins]`` f64,
    new states/offset). The SAME executable must serve coder and decoder."""
    # fixed-size rolling states + traced offset: one executable for every
    # step (growing states or a python-int offset would recompile per step)
    jitted = jax.jit(
        lambda v, prev, states, offset: lm.apply(
            v, prev, states, offset, fixed_state=True, method=lm.probabilities
        )
    )

    def step(prev, states, offset):
        offset = jnp.asarray(offset, jnp.int32)
        if states is None:
            states = lm.init_states(prev.shape[0])
        probs, states, offset = jitted(lm_variables, prev, states, offset)
        return np.asarray(probs[0, 0], dtype=np.float64), states, offset

    return step


def compress_tokens_with_lm(
    lm, lm_variables, codes: np.ndarray, metadata: Optional[dict] = None
) -> bytes:
    """codes ``[n_q, T]`` -> entropy-coded ECDC bytes."""
    n_q, T = codes.shape
    bins = lm.bins
    step = _make_step(lm, lm_variables)

    fo = io.BytesIO()
    meta = dict(metadata or {})
    meta.update(n_q=int(n_q), n_frames=int(T), lm=True)
    write_ecdc_header(fo, meta)
    coder = ArithmeticCoder(fo)
    prev = jnp.full((1, 1, n_q), bins, jnp.int32)
    states, offset = None, 0
    for t in range(T):
        pdf, states, offset = step(prev, states, offset)  # [n_q, bins]
        for q in range(n_q):
            p = pdf[q]
            cdf = build_stable_quantized_cdf(p / p.sum(), coder.total_range_bits)
            coder.push(int(codes[q, t]), cdf)
        prev = jnp.asarray(codes[:, t].reshape(1, 1, n_q).astype(np.int32))
    coder.flush()
    return fo.getvalue()


def decompress_tokens_with_lm(lm, lm_variables, blob: bytes) -> Tuple[np.ndarray, dict]:
    """ECDC bytes -> (codes ``[n_q, T]``, metadata). Sequential: one carried
    LM step per frame."""
    fo = io.BytesIO(blob)
    meta = read_ecdc_header(fo)
    assert meta.get("lm"), "stream was not LM-coded"
    n_q, T = meta["n_q"], meta["n_frames"]
    bins = lm.bins
    step = _make_step(lm, lm_variables)

    decoder = ArithmeticDecoder(fo)
    out = np.zeros((n_q, T), np.int32)
    prev = jnp.full((1, 1, n_q), bins, jnp.int32)
    states, offset = None, 0
    for t in range(T):
        pdf, states, offset = step(prev, states, offset)  # [n_q, bins]
        frame = np.zeros(n_q, np.int32)
        for q in range(n_q):
            p = pdf[q]
            cdf = build_stable_quantized_cdf(p / p.sum(), decoder.total_range_bits)
            sym = decoder.pull(cdf)
            if sym is None:
                raise EOFError("truncated LM-coded stream")
            frame[q] = sym
        out[:, t] = frame
        prev = jnp.asarray(frame.reshape(1, 1, n_q))
    return out, meta
