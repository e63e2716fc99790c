"""Interop against the reference's PREBUILT native modules.

``MLCodec_CXX.pmf_to_quantized_cdf`` works in this environment and is the
integer-exact oracle for CDF quantization.

``MLCodec_rans`` (the prebuilt coder .so) is BROKEN under this container's
numpy 2.0: its own encode->decode round trip fails (the payload degenerates
to constant bytes — a pybind/numpy-2 ABI casualty), so it cannot serve as a
stream oracle here.  Stream-format parity is instead pinned against the
reference *source* (rans.cpp framing/bypass/skip semantics) in
tests/test_rans.py; this file asserts the brokenness so a future
environment where the .so works will flip the skip and enable true
byte-level cross-decoding.
"""
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, requires_reference

pytestmark = requires_reference()

sys.path.insert(0, str(REFERENCE_DIR / "src" / "entropy"))
MLCodec_CXX = pytest.importorskip("MLCodec_CXX")

from sic_tpu.entropy import pmf_to_quantized_cdf


def test_pmf_to_quantized_cdf_integer_identical():
    rng = np.random.default_rng(1)
    for n in (3, 16, 101):
        pmf = rng.uniform(0, 1, size=n).astype(np.float32)
        pmf[rng.uniform(size=n) < 0.3] = 0.0   # exercise zero-repair
        pmf /= max(pmf.sum(), 1e-9)
        ours = pmf_to_quantized_cdf(pmf, 16)
        theirs = np.asarray(MLCodec_CXX.pmf_to_quantized_cdf(
            pmf.astype(np.float32).tolist(), 16))
        np.testing.assert_array_equal(ours, theirs)


def _reference_rans_selftest_ok() -> bool:
    try:
        import MLCodec_rans
    except Exception:
        return False
    cdf = np.zeros((1, 5), np.int32)
    cdf[0] = [0, 16384, 32768, 49152, 65536]
    sizes = np.array([5], np.int32)
    off = np.array([0], np.int32)
    enc = MLCodec_rans.RansEncoder(False, 1)
    g = enc.add_cdf(cdf, sizes, off)
    enc.reset()
    sym = np.array([0, 1, 2, 1, 0] * 10, np.int16)
    idx = np.zeros(50, np.int16)
    enc.encode_with_indexes(sym, idx, g)
    enc.flush()
    s = np.asarray(enc.get_encoded_stream())
    dec = MLCodec_rans.RansDecoder(1)
    dg = dec.add_cdf(cdf, sizes, off)
    dec.set_stream(s)
    out = np.asarray(dec.decode_stream(idx, dg))
    return bool(np.array_equal(out, sym))


def test_cross_stream_decoding_when_reference_coder_works():
    if not _reference_rans_selftest_ok():
        pytest.skip("reference MLCodec_rans .so fails its own round trip "
                    "in this environment (numpy-2 ABI)")
    import MLCodec_rans
    from sic_tpu.entropy import EntropyCoder, build_gaussian_tables

    t = build_gaussian_tables("gaussian")
    cdf = t.quantized_cdf.astype(np.int32)
    cdflen = t.cdf_length.astype(np.int32)
    off = t.offset.astype(np.int32)
    rng = np.random.default_rng(0)
    n = 4096
    idx = rng.integers(0, 256, size=n).astype(np.int16)
    idx[rng.uniform(size=n) < 0.1] = -1
    sym = rng.integers(-8, 9, size=n).astype(np.int16)
    sym[rng.uniform(size=n) < 0.02] = 300

    ours = EntropyCoder(1)
    g = ours.add_cdf(cdf, cdflen, off)
    ours.reset()
    ours.encode_with_indexes(sym, idx, g)
    ours.flush()
    stream = ours.get_encoded_stream()

    ref_dec = MLCodec_rans.RansDecoder(1)
    rg = ref_dec.add_cdf(cdf, cdflen, off)
    ref_dec.set_stream(np.frombuffer(stream, np.uint8))
    out = np.asarray(ref_dec.decode_stream(idx, rg))
    expected = np.where(idx < 0, 0, sym)
    np.testing.assert_array_equal(out, expected)
