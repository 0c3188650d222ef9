"""Bitstream + arithmetic coder round-trips, plus ECDC parity with reference."""

import io

import numpy as np
import pytest

from tests.conftest import requires_reference

from academicodec_tpu.codec.binary import (
    BitPacker,
    BitUnpacker,
    read_ecdc_header,
    write_ecdc_header,
)
from academicodec_tpu.codec.ac import (
    ArithmeticCoder,
    ArithmeticDecoder,
    build_stable_quantized_cdf,
)
from academicodec_tpu.codec.compress import compress_codes, decompress_codes


def test_bitpacker_roundtrip_fuzz():
    rng = np.random.default_rng(1234)
    for _ in range(6):
        length = int(rng.integers(10, 2000))
        bits = int(rng.integers(1, 16))
        tokens = rng.integers(0, 2**bits, size=length).tolist()
        buf = io.BytesIO()
        packer = BitPacker(bits, buf)
        for t in tokens:
            packer.push(int(t))
        packer.flush()
        buf.seek(0)
        unpacker = BitUnpacker(bits, buf)
        rebuilt = []
        while True:
            v = unpacker.pull()
            if v is None:
                break
            rebuilt.append(v)
        assert len(tokens) <= len(rebuilt) <= len(tokens) + 8 // bits
        assert rebuilt[: len(tokens)] == tokens


@requires_reference
def test_bitpacker_byte_identical_to_reference():
    """Our packer must produce byte-identical streams (format parity)."""
    import academicodec.binary as refbin

    rng = np.random.default_rng(7)
    for bits in (1, 7, 10, 13):
        tokens = rng.integers(0, 2**bits, size=333).tolist()
        ours, theirs = io.BytesIO(), io.BytesIO()
        p1, p2 = BitPacker(bits, ours), refbin.BitPacker(bits, theirs)
        for t in tokens:
            p1.push(int(t))
            p2.push(int(t))
        p1.flush()
        p2.flush()
        assert ours.getvalue() == theirs.getvalue()


@requires_reference
def test_ecdc_header_parity():
    import academicodec.binary as refbin

    meta = {"sr": 24000, "bw": 6.0, "n": [1, 2, 3]}
    ours, theirs = io.BytesIO(), io.BytesIO()
    write_ecdc_header(ours, meta)
    refbin.write_ecdc_header(theirs, meta)
    assert ours.getvalue() == theirs.getvalue()
    ours.seek(0)
    assert refbin.read_ecdc_header(ours) == meta
    theirs.seek(0)
    assert read_ecdc_header(theirs) == meta


def test_arithmetic_coder_roundtrip():
    rng = np.random.default_rng(1234)
    for _ in range(3):
        cardinality = int(rng.integers(2, 4000))
        steps = int(rng.integers(100, 500))
        fo = io.BytesIO()
        coder = ArithmeticCoder(fo)
        symbols, pdfs = [], []
        for _ in range(steps):
            logits = rng.standard_normal(cardinality)
            pdf = np.exp(logits - logits.max())
            pdf = pdf / pdf.sum()
            pdfs.append(pdf)
            cdf = build_stable_quantized_cdf(pdf, coder.total_range_bits)
            sym = int(rng.choice(cardinality, p=pdf))
            symbols.append(sym)
            coder.push(sym, cdf)
        coder.flush()

        fo.seek(0)
        decoder = ArithmeticDecoder(fo)
        for pdf, sym in zip(pdfs, symbols):
            cdf = build_stable_quantized_cdf(pdf, decoder.total_range_bits)
            assert decoder.pull(cdf) == sym
        assert decoder.pull(np.zeros(1)) is None


@requires_reference
def test_quantized_cdf_matches_reference():
    import torch
    from academicodec.quantization.ac import build_stable_quantized_cdf as ref_cdf

    rng = np.random.default_rng(3)
    for _ in range(5):
        pdf = rng.random(100)
        pdf = pdf / pdf.sum()
        ours = build_stable_quantized_cdf(pdf, 24)
        theirs = ref_cdf(torch.from_numpy(pdf), 24).numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_compress_codes_roundtrip():
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 1024, size=(8, 250)).astype(np.int32)
    blob = compress_codes(codes, bits_per_codebook=10, metadata={"sr": 24000})
    out, meta = decompress_codes(blob)
    np.testing.assert_array_equal(out, codes)
    assert meta["sr"] == 24000
    # 8 layers * 250 frames * 10 bits = 2500 bytes payload
    assert len(blob) < 2500 + 200


def test_native_pack_matches_python_bitpacker():
    """The C++ fast path is byte-identical to the Python BitPacker for all
    widths, and unpack inverts it."""
    from academicodec_tpu.codec.binary import pack_array, unpack_array
    from academicodec_tpu.native.build import get_bitpack_lib

    rng = np.random.default_rng(11)
    for bits in (1, 3, 8, 10, 13, 16):
        vals = rng.integers(0, 2**bits, size=999).astype(np.int32)
        blob = pack_array(vals, bits)
        # python reference stream
        buf = io.BytesIO()
        p = BitPacker(bits, buf)
        for v in vals.tolist():
            p.push(int(v))
        p.flush()
        assert blob == buf.getvalue()
        back = unpack_array(blob, bits, len(vals))
        np.testing.assert_array_equal(back, vals)
    # make the intent visible in the test log
    assert get_bitpack_lib() is not None, "native bitpack failed to build"
