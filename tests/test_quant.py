"""W8A8 int8 serving mode (ops/quant.py).

No reference counterpart — this is a TPU-native capability (the MXU's
int8 path runs ~2x bf16 peak).  What must hold:

- the quantized matmul math is exactly the documented integer pipeline;
- streams are bit-compatible across modes (the entropy path is conv-only
  and the sensitive pre-VQ/logits layers stay float), so a file encoded
  under either mode decodes under both;
- the structural param transform touches exactly the converted Dense
  kernels and leaves the bottleneck subtree bit-identical.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sic_tpu.models import CodecRuntime, init_codec
from sic_tpu.ops.quant import (QuantDense, quant_mode, quantize_dense_tree,
                               quantize_kernel, quantized)

from test_codec_e2e import TINY


def test_quantize_kernel_math():
    w = np.array([[1.0, 0.0, -2.54], [-0.5, 0.0, 1.27]], np.float32)
    q, s = quantize_kernel(w)
    assert q.dtype == np.int8 and s.dtype == np.float32
    # per-column abs-max symmetric
    np.testing.assert_allclose(s, [1.0 / 127, 1.0, 2.54 / 127])
    np.testing.assert_array_equal(q[:, 0], [127, -64])
    # all-zero column: scale 1, weights 0 -> exact zero output
    np.testing.assert_array_equal(q[:, 1], [0, 0])
    np.testing.assert_array_equal(q[:, 2], [-127, 64])


def test_quant_dense_integer_pipeline():
    """QuantDense == the documented numpy integer math, bit for bit."""
    rng = np.random.RandomState(0)
    x = rng.randn(3, 5, 16).astype(np.float32)
    w = rng.randn(16, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    wq, ws = quantize_kernel(w)

    m = QuantDense(8)
    params = {"params": {"kernel_q": jnp.asarray(wq),
                         "kernel_s": jnp.asarray(ws),
                         "bias": jnp.asarray(b)}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))

    amax = np.abs(x).max(-1, keepdims=True)
    xs = np.maximum(amax, 1e-12) / 127.0
    xq = np.clip(np.round(x / xs), -127, 127).astype(np.int8)
    acc = np.einsum("bsi,io->bso", xq.astype(np.int32), wq.astype(np.int32))
    want = acc.astype(np.float32) * xs * ws + b
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # and the quantization error is small on well-scaled activations
    ref = x @ w + b
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_quant_mode_scoping():
    assert quant_mode() is None
    with quantized("int8"):
        assert quant_mode() == "int8"
        with quantized(None):
            assert quant_mode() is None
        assert quant_mode() == "int8"
    assert quant_mode() is None
    with pytest.raises(ValueError):
        with quantized("fp4"):
            pass


@pytest.fixture(scope="module")
def tiny_pair():
    model, params = init_codec(TINY, jax.random.PRNGKey(0))
    return params


def test_quantize_dense_tree_structure(tiny_pair):
    params = tiny_pair
    qtree = quantize_dense_tree(params)

    def leaves_named(tree, name):
        found = []

        def walk(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, path + (k,))
            elif path[-1] == name:
                found.append(path)
        walk(tree, ())
        return found

    # every 2-D kernel became kernel_q except the sensitive layers
    residual = [p for p in leaves_named(qtree, "kernel")
                if np.asarray(_get(qtree, p)).ndim == 2]
    assert residual, "sensitive layers should keep float kernels"
    for p in residual:
        assert p[-2] == "conv_out" or (p[-2] == "ffn_fc2"
                                       and "prior_fusion" in p), p
    assert leaves_named(qtree, "kernel_q"), "nothing was quantized"

    # the bottleneck (entropy) subtree is bit-identical
    a = params["params"]["hybrid_codec"]["quantize_feat"]
    b = qtree["params"]["hybrid_codec"]["quantize_feat"]
    ja, jb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(ja) == len(jb)
    for la, lb in zip(ja, jb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def test_int8_runtime_stream_compat(tiny_pair):
    """Cross-mode wire compatibility + determinism on the tiny codec."""
    params = tiny_pair
    rt_f = CodecRuntime(TINY, params)
    rt_q = CodecRuntime(TINY, params, quant="int8")
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 256, 256, 3),
                           minval=-1.0)
    xh_f, _, enc_f = rt_f.encode_decode(x, (256, 256))
    xh_q, _, enc_q = rt_q.encode_decode(x, (256, 256))

    # the quantized ENCODER legitimately shifts latents, so the streams
    # may differ (near-tie VQ argmins flip) — but most semantic tokens
    # should agree, the sensitive pre-VQ projection being float
    zf = rt_f._decode_z(enc_f["z_bit_stream"], enc_f["token_length"], "rans")
    zq = rt_q._decode_z(enc_q["z_bit_stream"], enc_q["token_length"], "rans")
    assert (zf != zq).mean() < 0.5

    # the h stream decodes to the SAME symbols under both runtimes: the
    # entropy path is the identical float subtree in both modes
    fs = enc_q["feat_shape"]
    latent_shape = (fs[0], fs[1], fs[2], TINY.quant_dim)
    ha = rt_f.h_coder.decompress(enc_q["h_bit_stream"], latent_shape, q_idx=0)
    hb = rt_q.h_coder.decompress(enc_q["h_bit_stream"], latent_shape, q_idx=0)
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))

    # cross-mode decode: either runtime decodes either stream
    xa = rt_q.decode_only(**enc_f)
    xb = rt_f.decode_only(**enc_q)
    assert xa.shape == xb.shape == xh_f.shape

    # int8 decode is deterministic
    x2 = rt_q.decode_only(**enc_q)
    np.testing.assert_array_equal(np.asarray(xh_q), np.asarray(x2))

    # bounded divergence even on RANDOM weights (trained weights are far
    # tighter; this is a cascade-sanity bound, not a quality claim)
    rel = float(jnp.linalg.norm(xh_f - xh_q) / jnp.linalg.norm(xh_f))
    assert rel < 0.3, rel
