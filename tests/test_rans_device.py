"""On-device (Pallas) rANS plane decoder vs the native host coder.

The kernel must reproduce the C++ decoder bit-for-bit — including skipped
indexes, escape/bypass coding of out-of-range symbols, multi-plane state
carry-over, and multi-substream framing (sic_rans.cc:146-229).  Runs in
interpret mode on CPU; the TPU bench asserts the compiled path separately.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sic_tpu.entropy import EntropyCoder, build_gaussian_tables
from sic_tpu.ops.rans_decode import (pack_substreams, rans_decode_plane,
                                     split_substreams)


def _plane_case(rng, n, escape_rate=0.0, skip_rate=0.2, ncdf=64):
    idx = rng.integers(0, ncdf, size=n).astype(np.int16)
    skip = rng.random(n) < skip_rate
    idx[skip] = -1
    sym = rng.integers(-6, 7, size=n).astype(np.int16)
    esc = rng.random(n) < escape_rate
    sym[esc] = rng.integers(-4000, 4000, size=int(esc.sum())).astype(np.int16)
    sym[skip] = 0
    return sym, idx


@pytest.mark.parametrize("stream_part", [1, 2, 4])
@pytest.mark.parametrize("escape_rate", [0.0, 0.15])
def test_device_decode_matches_host(stream_part, escape_rate):
    t = build_gaussian_tables("gaussian")
    rng = np.random.default_rng(42 + stream_part)
    n = 256                                  # per plane; npos = n/stream_part
    planes = [_plane_case(rng, n, escape_rate=escape_rate) for _ in range(4)]

    coder = EntropyCoder(stream_part)
    g = coder.add_cdf(t.quantized_cdf, t.cdf_length, t.offset)
    coder.reset()
    for sym, idx in planes:
        coder.encode_with_indexes(sym, idx, g)
    coder.flush()
    stream = coder.get_encoded_stream()

    # host oracle: decode the same four planes
    coder.set_stream(stream)
    host = [coder.decode_stream(idx, g) for _, idx in planes]

    # device path (rows padded to the kernel's 8-lane grouping with idx=-1)
    parts = split_substreams(stream)
    assert len(parts) == stream_part
    words, lens, state = pack_substreams(parts, word_bucket=64)
    S = words.shape[0]
    npos = n // stream_part
    state = jnp.asarray(state)
    for (sym_true, idx), host_sym in zip(planes, host):
        idx_s = np.full((S, npos), -1, np.int32)
        idx_s[:stream_part] = idx.astype(np.int32).reshape(stream_part, npos)
        out, state = rans_decode_plane(
            jnp.asarray(idx_s), jnp.asarray(words), jnp.asarray(lens),
            state, jnp.asarray(t.quantized_cdf), jnp.asarray(t.cdf_length),
            jnp.asarray(t.offset), interpret=True)
        got = np.asarray(out)[:stream_part].reshape(-1).astype(np.int16)
        np.testing.assert_array_equal(got, host_sym)
        np.testing.assert_array_equal(got, sym_true)


def test_device_decode_many_streams_batched():
    """B independent image streams decode as one (B*parts, npos) kernel call
    (the shape the batched bottleneck decode uses)."""
    t = build_gaussian_tables("gaussian")
    rng = np.random.default_rng(7)
    B, parts, n = 3, 2, 128
    npos = n // parts

    streams, all_planes = [], []
    for b in range(B):
        planes = [_plane_case(rng, n, escape_rate=0.1) for _ in range(2)]
        coder = EntropyCoder(parts)
        g = coder.add_cdf(t.quantized_cdf, t.cdf_length, t.offset)
        coder.reset()
        for sym, idx in planes:
            coder.encode_with_indexes(sym, idx, g)
        coder.flush()
        streams.append(coder.get_encoded_stream())
        all_planes.append(planes)

    flat_parts = [p for s in streams for p in split_substreams(s)]
    words, lens, state = pack_substreams(flat_parts, word_bucket=64)
    S = words.shape[0]
    state = jnp.asarray(state)
    for step in range(2):
        idx = np.full((S, npos), -1, np.int32)
        idx[:B * parts] = np.concatenate(
            [all_planes[b][step][1].astype(np.int32).reshape(parts, npos)
             for b in range(B)])
        out, state = rans_decode_plane(
            jnp.asarray(idx), jnp.asarray(words),
            jnp.asarray(lens), state, jnp.asarray(t.quantized_cdf),
            jnp.asarray(t.cdf_length), jnp.asarray(t.offset), interpret=True)
        got = np.asarray(out)[:B * parts].reshape(B, n).astype(np.int16)
        for b in range(B):
            np.testing.assert_array_equal(got[b], all_planes[b][step][0])


def test_split_substreams_roundtrip():
    t = build_gaussian_tables("gaussian")
    rng = np.random.default_rng(1)
    sym, idx = _plane_case(rng, 64)
    c = EntropyCoder(4)
    g = c.add_cdf(t.quantized_cdf, t.cdf_length, t.offset)
    c.reset(); c.encode_with_indexes(sym, idx, g); c.flush()
    s = c.get_encoded_stream()
    parts = split_substreams(s)
    assert len(parts) == 4 and sum(len(p) for p in parts) == len(s) - 1 - 3 * 2
