"""torchac z-stream wire-format compatibility.

The golden ``apple.c2df`` carries a REAL torchac-encoded semantic stream
(512 tokens, uniform CDF over 4096 codes) — decoding it and reproducing
the exact bytes on re-encode pins our implementation to the reference
format (codec_sq_fixbpp.py:841-846, 861-864, 886-887).
"""
import numpy as np
import pytest

from conftest import REFERENCE_DIR, requires_reference

from sic_tpu.entropy.torchac_compat import (UniformTorchacCodec,
                                            decode_float_cdf,
                                            encode_float_cdf, quantize_cdf,
                                            uniform_cdf)

GOLDEN = REFERENCE_DIR / "IO" / "bitstreams" / "apple.c2df"


@requires_reference()
def test_golden_z_stream_decodes_and_reencodes_byte_identical():
    from sic_tpu.container import unpack_c2df
    enc, _hdr = unpack_c2df(GOLDEN)
    codec = UniformTorchacCodec(4096)
    tokens = codec.decode(enc["z_bit_stream"], int(enc["token_length"]))
    assert tokens.shape == (512,)
    assert tokens.min() >= 0 and tokens.max() < 4096
    assert codec.encode(tokens) == enc["z_bit_stream"]


@pytest.mark.parametrize("n", [1, 7, 512, 3000])
def test_uniform_round_trip(n):
    rng = np.random.default_rng(n)
    codec = UniformTorchacCodec(4096)
    toks = rng.integers(0, 4096, n).astype(np.int16)
    stream = codec.encode(toks)
    np.testing.assert_array_equal(codec.decode(stream, n), toks)
    # ~12 bits/token for the 4096-code uniform CDF
    assert len(stream) <= n * 12 / 8 + 8


def test_uniform_cdf_matches_reference_construction():
    """ones/K cumsum in float32, scaled by 2^16-(Lp-1), +arange — the exact
    torchac._convert_to_int_and_normalize result for the reference's CDF."""
    cdf = uniform_cdf(4096)
    # 1/4096 * (65536 - 4096) = 15 exactly in float32, +1 from the arange
    np.testing.assert_array_equal(cdf[:5].astype(np.int64), [0, 16, 32, 48, 64])
    assert cdf[4096] == 0  # 65536 wraps in uint16, never read by the coder


def test_nonuniform_cdf_round_trip():
    rng = np.random.default_rng(3)
    K = 37
    pmf = rng.dirichlet(np.ones(K)).astype(np.float32)
    cdf_float = np.zeros(K + 1, np.float32)
    cdf_float[1:] = np.cumsum(pmf)
    cdf_float[-1] = 1.0
    toks = rng.choice(K, size=500, p=pmf.astype(np.float64) / pmf.sum())
    stream = encode_float_cdf(cdf_float, toks)
    out = decode_float_cdf(cdf_float, stream, 500)
    np.testing.assert_array_equal(out, toks)


def test_per_symbol_cdf_rows_round_trip():
    """Matrix CDF (one row per symbol) — the general torchac call shape."""
    rng = np.random.default_rng(4)
    K, n = 9, 64
    rows = []
    for _ in range(n):
        pmf = rng.dirichlet(np.ones(K)).astype(np.float32)
        row = np.zeros(K + 1, np.float32)
        row[1:] = np.cumsum(pmf)
        row[-1] = 1.0
        rows.append(row)
    cdf_float = np.stack(rows)
    toks = rng.integers(0, K, n)
    stream = encode_float_cdf(cdf_float, toks)
    np.testing.assert_array_equal(decode_float_cdf(cdf_float, stream, n), toks)


def test_quantize_cdf_every_symbol_has_mass():
    """The +arange renormalization guarantees strictly increasing CDFs even
    for zero-probability symbols."""
    cdf_float = np.zeros(17, np.float32)
    cdf_float[-1] = 1.0  # all mass on the last symbol
    q = quantize_cdf(cdf_float).astype(np.int64)
    q[-1] = 1 << 16
    assert np.all(np.diff(q) > 0)


# -- adversarial inputs -------------------------------------------------------
# decode_int16_normalized_cdf parses UNTRUSTED ``.c2df`` fields (stream
# bytes + token_length).  Like upstream torchac, it must tolerate any
# byte content: past-the-end reads shift in zeros.  These tests bound its
# behavior: never crash, never emit an out-of-alphabet symbol, always
# return exactly n_sym symbols.

def _assert_bounded(codec, stream, n_sym):
    out = codec.decode(stream, n_sym)
    assert out.shape == (n_sym,)
    assert out.min() >= 0 and out.max() < codec.num_codes


@pytest.mark.parametrize("cut", [0, 1, 2, 3, 7, 100])
def test_truncated_stream_decodes_bounded(cut):
    rng = np.random.default_rng(cut)
    codec = UniformTorchacCodec(4096)
    toks = rng.integers(0, 4096, 512).astype(np.int16)
    stream = codec.encode(toks)
    _assert_bounded(codec, stream[:cut], 512)


def test_empty_stream_decodes_bounded():
    _assert_bounded(UniformTorchacCodec(4096), b"", 64)


@pytest.mark.parametrize("seed", range(8))
def test_random_garbage_decodes_bounded(seed):
    rng = np.random.default_rng(seed)
    codec = UniformTorchacCodec(257)  # odd alphabet exercises searchsorted edges
    garbage = rng.integers(0, 256, rng.integers(0, 200)).astype(np.uint8)
    _assert_bounded(codec, garbage.tobytes(), 333)


@pytest.mark.parametrize("extra", [1, 10, 1000])
def test_n_sym_overrun_decodes_bounded(extra):
    """A lying token_length (larger than what was encoded) must not crash
    or emit out-of-range symbols — the prefix still decodes exactly."""
    rng = np.random.default_rng(extra)
    codec = UniformTorchacCodec(100)
    toks = rng.integers(0, 100, 50).astype(np.int16)
    stream = codec.encode(toks)
    out = codec.decode(stream, 50 + extra)
    np.testing.assert_array_equal(out[:50], toks)
    assert out.min() >= 0 and out.max() < 100


def test_bitflip_fuzz_decodes_bounded():
    rng = np.random.default_rng(99)
    codec = UniformTorchacCodec(4096)
    toks = rng.integers(0, 4096, 128).astype(np.int16)
    stream = bytearray(codec.encode(toks))
    for _ in range(32):
        pos = rng.integers(0, len(stream))
        stream[pos] ^= 1 << rng.integers(0, 8)
        _assert_bounded(codec, bytes(stream), 128)


def test_zero_symbols_round_trip():
    codec = UniformTorchacCodec(16)
    stream = codec.encode(np.empty(0, np.int16))
    out = codec.decode(stream, 0)
    assert out.shape == (0,)


def test_runtime_torchac_format_round_trip():
    """CodecRuntime(z_format='torchac') produces reference-format z streams
    its own decode_only(z_coder='torchac') reconstructs identically to the
    native rANS path."""
    import jax
    import jax.numpy as jnp
    from sic_tpu.config import tiny_spec
    from sic_tpu.models import CodecRuntime, init_codec

    spec = tiny_spec()
    model, params = init_codec(spec, jax.random.PRNGKey(0))
    rt_rans = CodecRuntime(spec, params)
    rt_tac = CodecRuntime(spec, params, z_format="torchac")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))

    enc_r = rt_rans.encode_only(x)
    enc_t = rt_tac.encode_only(x)
    assert enc_r["z_bit_stream"] != enc_t["z_bit_stream"]

    # identical tokens either way -> identical reconstructions
    x_r = rt_rans.decode_only(**enc_r)
    x_t = rt_tac.decode_only(**{**enc_t, "z_coder": "torchac"})
    np.testing.assert_array_equal(np.asarray(x_r), np.asarray(x_t))

    # the rans runtime can also decode the torchac stream via the flag
    x_cross = rt_rans.decode_only(**{**enc_t, "z_coder": "torchac"})
    np.testing.assert_array_equal(np.asarray(x_cross), np.asarray(x_r))
