"""Byte-level interop against the REFERENCE rANS coder.

Two oracles:

- ``MLCodec_CXX.pmf_to_quantized_cdf`` — the prebuilt .so works in this
  environment and is the integer-exact oracle for CDF quantization.
- ``tests.ref_oracle`` — the reference coder COMPILED FROM SOURCE
  (/root/reference/src/cpp/rans/rans.cpp behind a thin extern-C shim),
  because the prebuilt ``MLCodec_rans`` pybind .so is broken under this
  container's numpy 2.0 (its own round trip fails; asserted below so a
  fixed environment flips that skip).  The source build enables true
  cross-decoding in both directions, covering bypass/escape coding
  (rans.cpp:134-157), skipped indexes (rans.cpp:117-119), and the
  multi-substream container framing (py_rans.cpp:91-136).
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


def _tables():
    from sic_tpu.entropy import build_gaussian_tables
    t = build_gaussian_tables("gaussian")
    return (t.quantized_cdf.astype(np.int32), t.cdf_length.astype(np.int32),
            t.offset.astype(np.int32))


def _payload(rng, n):
    """Symbols/indexes exercising normal, skip (idx<0) and bypass paths."""
    idx = rng.integers(0, 256, size=n).astype(np.int16)
    idx[rng.uniform(size=n) < 0.1] = -1          # skipped symbols
    sym = rng.integers(-8, 9, size=n).astype(np.int16)
    sym[rng.uniform(size=n) < 0.02] = 300        # positive escape -> bypass
    sym[rng.uniform(size=n) < 0.02] = -500       # negative escape -> bypass
    return sym, idx


def _source_oracle():
    oracle = pytest.importorskip("tests.ref_oracle")
    if oracle.load_oracle() is None:
        pytest.skip("reference rANS sources not available")
    return oracle


@pytest.mark.parametrize("stream_part", [1, 3])
def test_ours_encodes_reference_decodes(stream_part):
    """Our framed stream must decode on the from-source reference coder."""
    from sic_tpu.entropy import EntropyCoder
    oracle = _source_oracle()
    cdf, cdflen, off = _tables()
    rng = np.random.default_rng(7)
    sym, idx = _payload(rng, 5000)

    ours = EntropyCoder(stream_part)
    g = ours.add_cdf(cdf, cdflen, off)
    ours.reset()
    ours.encode_with_indexes(sym, idx, g)
    ours.flush()
    stream = ours.get_encoded_stream()

    ref = oracle.RefRans(stream_part)
    rg = ref.add_cdf(cdf, cdflen, off)
    out = ref.decode(stream, idx, rg)
    np.testing.assert_array_equal(out, np.where(idx < 0, 0, sym))


@pytest.mark.parametrize("stream_part", [1, 3])
def test_reference_encodes_ours_decodes(stream_part):
    """A reference-coder framed stream must decode on our coder."""
    from sic_tpu.entropy import EntropyCoder
    oracle = _source_oracle()
    cdf, cdflen, off = _tables()
    rng = np.random.default_rng(11)
    sym, idx = _payload(rng, 5000)

    ref = oracle.RefRans(stream_part)
    rg = ref.add_cdf(cdf, cdflen, off)
    stream = ref.encode(sym, idx, rg)

    ours = EntropyCoder(stream_part)
    g = ours.add_cdf(cdf, cdflen, off)
    ours.set_stream(stream)
    out = ours.decode_stream(idx, g)
    np.testing.assert_array_equal(out, np.where(idx < 0, 0, sym))


@pytest.mark.parametrize("stream_part", [1, 2])
def test_streams_byte_identical_to_reference(stream_part):
    """Same algorithm, same buffering order, same framing -> the encoded
    bytes themselves must match the reference coder exactly."""
    from sic_tpu.entropy import EntropyCoder
    oracle = _source_oracle()
    cdf, cdflen, off = _tables()
    rng = np.random.default_rng(3)
    sym, idx = _payload(rng, 4096)

    ours = EntropyCoder(stream_part)
    g = ours.add_cdf(cdf, cdflen, off)
    ours.reset()
    ours.encode_with_indexes(sym, idx, g)
    ours.flush()

    ref = oracle.RefRans(stream_part)
    rg = ref.add_cdf(cdf, cdflen, off)
    assert ours.get_encoded_stream() == ref.encode(sym, idx, rg)


def test_u32_header_framing_cross_decodes():
    """Force substreams > 65535 B so the 4-byte size-header variant of the
    container is exercised (py_rans.cpp:107, 124-125)."""
    from sic_tpu.entropy import EntropyCoder
    oracle = _source_oracle()
    cdf, cdflen, off = _tables()
    rng = np.random.default_rng(5)
    n = 120_000
    idx = np.zeros(n, np.int16)                       # narrowest scale table
    sym = rng.integers(-3000, 3000, size=n).astype(np.int16)  # all bypass

    ours = EntropyCoder(2)
    g = ours.add_cdf(cdf, cdflen, off)
    ours.reset()
    ours.encode_with_indexes(sym, idx, g)
    ours.flush()
    stream = ours.get_encoded_stream()
    assert stream[0] & 0x0F == 0, "expected u32 per-stream headers"

    ref = oracle.RefRans(2)
    rg = ref.add_cdf(cdf, cdflen, off)
    np.testing.assert_array_equal(ref.decode(stream, idx, rg), sym)
    # and the reverse direction over the same u32-framed payload
    ours2 = EntropyCoder(2)
    g2 = ours2.add_cdf(cdf, cdflen, off)
    ours2.set_stream(ref.encode(sym, idx, rg))
    np.testing.assert_array_equal(ours2.decode_stream(idx, g2), sym)


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
