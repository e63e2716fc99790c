"""Factorized-prior + Huffman codec tests (capability-parity components)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sic_tpu.entropy import (BitEstimator, FactorizedCoder, HuffmanCodec,
                             HuffmanCodecOneQP, build_huffman_table)


def test_bitestimator_cdf_monotone_and_prob():
    C = 8
    model = BitEstimator(C)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, C)))
    xs = jnp.linspace(-30, 30, 61)[:, None].repeat(C, axis=1)
    cdf = np.asarray(model.apply(params, xs))
    assert np.all(np.diff(cdf, axis=0) >= -1e-6), "CDF must be monotone in x"
    probs = np.asarray(model.apply(params, xs,
                                   method=BitEstimator.get_prob))
    assert np.all(probs >= 1e-10) and np.all(probs <= 1.0 + 1e-6)
    bits = np.asarray(model.apply(params, xs, method=BitEstimator.get_bits))
    assert np.all(bits >= 0)


def test_factorized_coder_roundtrip():
    C = 8
    model = BitEstimator(C)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((4, C)))
    fc = FactorizedCoder(model, params)

    rng = np.random.default_rng(0)
    x = rng.integers(-4, 5, size=(1, 6, 5, C)).astype(np.int32)
    fc.coder.reset()
    fc.encode(x)
    fc.coder.flush()
    stream = fc.coder.get_encoded_stream()
    assert len(stream) > 0

    fc.coder.set_stream(stream)
    out = fc.decode_stream((1, 6, 5, C))
    np.testing.assert_array_equal(out.astype(np.int32), x)


def test_huffman_table_prefix_free_and_optimal_shape():
    prob = [0.5, 0.25, 0.15, 0.1]
    table = build_huffman_table(prob)
    assert len(table) == 4
    # prefix-free
    for i, a in enumerate(table):
        for j, b in enumerate(table):
            if i != j:
                assert not b.startswith(a)
    # most probable symbol gets the shortest code
    assert len(table[0]) == min(len(c) for c in table)
    # expected length within 1 bit of entropy
    H = -sum(p * np.log2(p) for p in prob)
    L = sum(p * len(c) for p, c in zip(prob, table))
    assert H <= L < H + 1


def test_huffman_roundtrip_multi_qp():
    codec = HuffmanCodec()
    codec.load_probs({0: [0.7, 0.2, 0.1], 2: [0.25, 0.25, 0.25, 0.25]})
    rng = np.random.default_rng(3)
    for qp, n_sym in ((0, 3), (2, 4)):
        x = rng.integers(0, n_sym, size=(1, 1, 16, 16))
        stream = codec.compress(x, qp)["bit_stream"]
        out = codec.decompress(stream, qp)["index"]
        np.testing.assert_array_equal(out, x.reshape(-1))
