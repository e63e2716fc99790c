"""On-device (Pallas) rANS plane ENCODER vs the native host coder.

The kernel must produce byte-identical substreams to the C++ encoder —
including skipped indexes, escape/bypass coding of out-of-range symbols,
multi-plane accumulation, and the LIFO flush order (sic_rans.cc:40-135).
Runs in interpret mode on CPU; the TPU bench asserts the compiled path
separately.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sic_tpu.entropy import EntropyCoder, build_gaussian_tables
from sic_tpu.ops.rans_decode import split_substreams
from sic_tpu.ops.rans_encode import (encode_buffer_words, finalize_streams,
                                     rans_encode_plane, split_plane_rows)

_RANS_L = 1 << 23


def _plane_case(rng, n, escape_rate=0.0, skip_rate=0.2, ncdf=64):
    idx = rng.integers(0, ncdf, size=n).astype(np.int16)
    skip = rng.random(n) < skip_rate
    idx[skip] = -1
    sym = rng.integers(-6, 7, size=n).astype(np.int16)
    esc = rng.random(n) < escape_rate
    sym[esc] = rng.integers(-4000, 4000, size=int(esc.sum())).astype(np.int16)
    sym[skip] = 0
    return sym, idx


def _host_parts(planes, stream_part, t):
    coder = EntropyCoder(stream_part)
    g = coder.add_cdf(t.quantized_cdf, t.cdf_length, t.offset)
    coder.reset()
    for sym, idx in planes:
        coder.encode_with_indexes(sym, idx, g)
    coder.flush()
    return split_substreams(coder.get_encoded_stream())


def _device_parts(planes, stream_part, t, nwords=None):
    """Encode on the (interpreted) kernel: planes LAST -> FIRST, rows
    reversed, state threaded through the per-plane calls."""
    n = planes[0][0].size
    npos = n // stream_part
    S = -(-stream_part // 8) * 8
    if nwords is None:
        nwords = encode_buffer_words(npos * len(planes), word_bucket=64)
    words = jnp.zeros((S, nwords), jnp.uint32)
    meta = jnp.zeros((S, 4), jnp.uint32).at[:, 0].set(_RANS_L)
    cdf = jnp.asarray(t.quantized_cdf)
    cl = jnp.asarray(t.cdf_length)
    off = jnp.asarray(t.offset)
    for sym, idx in reversed(planes):
        sym_r, idx_r = split_plane_rows(sym.reshape(1, -1).astype(np.int32),
                                        idx.reshape(1, -1).astype(np.int32),
                                        stream_part)
        sym_p = np.zeros((S, npos), np.int32)
        idx_p = np.full((S, npos), -1, np.int32)
        sym_p[:stream_part] = np.asarray(sym_r)
        idx_p[:stream_part] = np.asarray(idx_r)
        words, meta = rans_encode_plane(
            jnp.asarray(sym_p), jnp.asarray(idx_p), words, meta,
            cdf, cl, off, interpret=True)
    return finalize_streams(np.asarray(words), np.asarray(meta), stream_part)


@pytest.mark.parametrize("stream_part", [1, 2, 4])
@pytest.mark.parametrize("escape_rate", [0.0, 0.15])
def test_device_encode_matches_host(stream_part, escape_rate):
    t = build_gaussian_tables("gaussian")
    rng = np.random.default_rng(42 + stream_part)
    n = 256
    planes = [_plane_case(rng, n, escape_rate=escape_rate) for _ in range(4)]
    expect = _host_parts(planes, stream_part, t)
    got = _device_parts(planes, stream_part, t)
    assert got is not None
    assert len(got) == len(expect)
    for i, (a, b) in enumerate(zip(got, expect)):
        assert a == b, f"part {i}: {len(a)} vs {len(b)} bytes"


def test_device_encode_extreme_symbols():
    """Clamp-boundary symbols exercise the longest bypass chains."""
    t = build_gaussian_tables("gaussian")
    n = 128
    sym = np.zeros(n, np.int16)
    idx = np.zeros(n, np.int16)
    sym[:4] = [30000, -30000, 29999, -29999]
    sym[4:8] = [1, -1, 0, 5]
    planes = [(sym, idx)]
    expect = _host_parts(planes, 1, t)
    got = _device_parts(planes, 1, t)
    assert got is not None
    assert got[0] == expect[0]


def test_device_encode_overflow_detected():
    """A too-small emission buffer must be reported, not silently wrap."""
    t = build_gaussian_tables("gaussian")
    rng = np.random.default_rng(0)
    planes = [_plane_case(rng, 256, escape_rate=0.9, skip_rate=0.0)
              for _ in range(4)]
    got = _device_parts(planes, 1, t, nwords=8)
    assert got is None


def test_device_encode_roundtrips_through_device_decode():
    """Kernel-encoded parts decode bit-exactly on the decode kernel."""
    from sic_tpu.ops.rans_decode import pack_substreams, rans_decode_plane
    t = build_gaussian_tables("gaussian")
    rng = np.random.default_rng(3)
    stream_part, n = 4, 256
    npos = n // stream_part
    planes = [_plane_case(rng, n, escape_rate=0.1) for _ in range(4)]
    parts = _device_parts(planes, stream_part, t)
    assert parts is not None
    words, lens, state = pack_substreams(parts, word_bucket=64)
    S = words.shape[0]
    state = jnp.asarray(state)
    for sym_true, idx in planes:
        idx_s = np.full((S, npos), -1, np.int32)
        idx_s[:stream_part] = idx.astype(np.int32).reshape(stream_part, npos)
        out, state = rans_decode_plane(
            jnp.asarray(idx_s), jnp.asarray(words), jnp.asarray(lens),
            state, jnp.asarray(t.quantized_cdf), jnp.asarray(t.cdf_length),
            jnp.asarray(t.offset), interpret=True)
        got = np.asarray(out)[:stream_part].reshape(-1).astype(np.int16)
        # decoded symbols equal the encoder's inputs at coded positions
        keep = idx >= 0
        np.testing.assert_array_equal(got[keep], sym_true[keep])
