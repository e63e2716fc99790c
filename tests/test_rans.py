"""Native rANS coder round-trip and framing tests."""
import numpy as np
import pytest

from sic_tpu.entropy import (EntropyCoder, build_gaussian_tables,
                             pmf_to_quantized_cdf, scale_table)
from sic_tpu.entropy.tables import build_indexes_np


def _python_pmf_to_quantized_cdf(pmf, precision=16):
    """Independent mirror of the integer CDF quantizer for cross-checking."""
    pmf = np.asarray(pmf, dtype=np.float32)
    cdf = np.zeros(pmf.size + 1, dtype=np.uint64)
    cdf[1:] = (np.round(pmf.astype(np.float64) * (1 << precision)) + 0.5).astype(np.uint32)
    total = int(cdf.sum() & 0xFFFFFFFF)
    cdf = ((np.uint64(1 << precision) * cdf) // np.uint64(total)).astype(np.uint32)
    cdf = np.cumsum(cdf, dtype=np.uint64).astype(np.uint32)
    cdf[-1] = 1 << precision
    cdf = cdf.astype(np.int64)
    for i in range(pmf.size):
        if cdf[i] == cdf[i + 1]:
            freqs = np.diff(cdf)
            candidates = np.where(freqs > 1)[0]
            best = candidates[np.argmin(freqs[candidates])]
            if best < i:
                cdf[best + 1:i + 1] -= 1
            else:
                cdf[i + 1:best + 1] += 1
    return cdf.astype(np.int32)


def test_pmf_to_quantized_cdf_matches_python_mirror():
    rng = np.random.default_rng(0)
    for n in [3, 17, 101]:
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum()
        native = pmf_to_quantized_cdf(pmf)
        mirror = _python_pmf_to_quantized_cdf(pmf)
        np.testing.assert_array_equal(native, mirror)
        assert native[0] == 0 and native[-1] == (1 << 16)
        assert np.all(np.diff(native) > 0)


def test_pmf_to_quantized_cdf_zero_repair():
    pmf = np.array([0.5, 0.0, 0.5, 0.0, 0.0], dtype=np.float32)
    cdf = pmf_to_quantized_cdf(pmf)
    assert np.all(np.diff(cdf) > 0)
    assert cdf[-1] == 1 << 16


def _simple_group():
    # Three CDFs of differing support widths.
    pmfs = [
        np.array([0.2, 0.5, 0.2, 0.05]),
        np.array([0.1, 0.1, 0.6, 0.1, 0.05]),
        np.array([0.85, 0.1]),
    ]
    width = max(len(p) + 1 for p in pmfs)
    cdfs = np.zeros((len(pmfs), width), dtype=np.int32)
    sizes, offsets = [], []
    for i, p in enumerate(pmfs):
        c = pmf_to_quantized_cdf(p / p.sum())
        cdfs[i, : c.size] = c
        sizes.append(c.size)
        offsets.append(-(len(p) // 2))
    return cdfs, np.array(sizes, np.int32), np.array(offsets, np.int32)


def test_roundtrip_basic():
    cdfs, sizes, offsets = _simple_group()
    coder = EntropyCoder(stream_part=1)
    g = coder.add_cdf(cdfs, sizes, offsets)

    rng = np.random.default_rng(1)
    n = 5000
    indexes = rng.integers(0, 3, n).astype(np.int16)
    symbols = np.empty(n, dtype=np.int16)
    for i in range(3):
        m = indexes == i
        lo, hi = offsets[i], offsets[i] + sizes[i] - 2
        symbols[m] = rng.integers(lo, hi, m.sum())

    coder.reset()
    coder.encode_with_indexes(symbols, indexes, g)
    coder.flush()
    stream = coder.get_encoded_stream()
    assert stream[0] == 0x01  # single substream, u16 headers flag

    coder.set_stream(stream)
    out = coder.decode_stream(indexes, g)
    np.testing.assert_array_equal(out, symbols)


def test_roundtrip_bypass_and_skip():
    """Out-of-support symbols use escape coding; index -1 skips entirely."""
    cdfs, sizes, offsets = _simple_group()
    coder = EntropyCoder()
    g = coder.add_cdf(cdfs, sizes, offsets)

    symbols = np.array([-120, 500, 0, 7, -1, 30000, -30000, 2], dtype=np.int16)
    indexes = np.array([0, 1, -1, 2, 0, 1, 2, -1], dtype=np.int16)
    coder.reset()
    coder.encode_with_indexes(symbols, indexes, g)
    coder.flush()
    coder.set_stream(coder.get_encoded_stream())
    out = coder.decode_stream(indexes, g)
    expected = symbols.copy()
    expected[indexes < 0] = 0  # skipped positions decode to zero
    np.testing.assert_array_equal(out, expected)


def test_roundtrip_multipart_stream():
    cdfs, sizes, offsets = _simple_group()
    rng = np.random.default_rng(2)
    n = 10007
    indexes = rng.integers(0, 3, n).astype(np.int16)
    symbols = np.empty(n, dtype=np.int16)
    for i in range(3):
        m = indexes == i
        lo, hi = offsets[i], offsets[i] + sizes[i] - 2
        symbols[m] = rng.integers(lo, hi, m.sum())

    for parts in [2, 4]:
        coder = EntropyCoder(stream_part=parts)
        g = coder.add_cdf(cdfs, sizes, offsets)
        coder.reset()
        coder.encode_with_indexes(symbols, indexes, g)
        coder.flush()
        stream = coder.get_encoded_stream()
        assert (stream[0] >> 4) + 1 == parts
        coder.set_stream(stream)
        np.testing.assert_array_equal(coder.decode_stream(indexes, g), symbols)

    # A fresh single-part decoder must still read a multi-part stream
    # (part count travels in the flag byte).
    coder2 = EntropyCoder(stream_part=1)
    g2 = coder2.add_cdf(cdfs, sizes, offsets)
    coder2.set_stream(stream)
    np.testing.assert_array_equal(coder2.decode_stream(indexes, g2), symbols)


def test_multiple_encode_calls_one_stream():
    """Planes appended across calls decode in order after a single flush."""
    cdfs, sizes, offsets = _simple_group()
    coder = EntropyCoder()
    g = coder.add_cdf(cdfs, sizes, offsets)
    rng = np.random.default_rng(3)
    planes = []
    coder.reset()
    for _ in range(4):
        idx = rng.integers(0, 3, 257).astype(np.int16)
        sym = np.array([rng.integers(offsets[i], offsets[i] + sizes[i] - 2)
                        for i in idx], dtype=np.int16)
        planes.append((sym, idx))
        coder.encode_with_indexes(sym, idx, g)
    coder.flush()
    coder.set_stream(coder.get_encoded_stream())
    for sym, idx in planes:
        np.testing.assert_array_equal(coder.decode_stream(idx, g), sym)


def test_gaussian_tables_shapes_and_monotonicity():
    t = build_gaussian_tables("gaussian")
    assert t.levels == 256
    assert t.quantized_cdf.shape[0] == 256
    assert np.all(t.cdf_length >= 4)
    for i in [0, 100, 255]:
        row = t.quantized_cdf[i, : t.cdf_length[i]]
        assert row[0] == 0 and row[-1] == (1 << 16)
        assert np.all(np.diff(row) > 0)
    # small scales have narrow supports, big scales wide ones
    assert t.cdf_length[0] < t.cdf_length[-1]
    assert t.offset[0] > t.offset[-1]


def test_gaussian_coding_with_real_tables():
    t = build_gaussian_tables("gaussian")
    coder = EntropyCoder()
    g = coder.add_cdf(t.quantized_cdf, t.cdf_length, t.offset)

    rng = np.random.default_rng(4)
    scales = np.exp(rng.uniform(np.log(0.12), np.log(20.0), 4096)).astype(np.float32)
    symbols = np.round(rng.normal(0, scales)).astype(np.int16)
    idx = build_indexes_np(scales, t, skip_thres=0.12)

    coder.reset()
    coder.encode_with_indexes(symbols, idx, g)
    coder.flush()
    stream = coder.get_encoded_stream()
    coder.set_stream(stream)
    out = coder.decode_stream(idx, g)
    expected = np.where(idx < 0, 0, symbols).astype(np.int16)
    np.testing.assert_array_equal(out, expected)

    # entropy sanity: real stream close to the Shannon estimate
    st = scale_table("gaussian")
    sel = st[np.maximum(idx, 0)]
    from scipy.special import ndtr
    probs = ndtr((symbols + 0.5) / sel) - ndtr((symbols - 0.5) / sel)
    est_bits = float(np.sum(np.where(idx < 0, 0.0, -np.log2(np.maximum(probs, 1e-9)))))
    real_bits = len(stream) * 8
    assert real_bits < est_bits * 1.05 + 128
