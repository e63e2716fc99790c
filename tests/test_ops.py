"""Pallas window-attention kernel tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sic_tpu.ops.window_attention import (_forward_reference, _pallas_forward,
                                          window_attention)


def _inputs(G=8, nW=4, s=16, d=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (G, s, d))
    k = jax.random.normal(ks[1], (G, s, d))
    v = jax.random.normal(ks[2], (G, s, d))
    bias = jax.random.normal(ks[3], (nW, s, s))
    return q, k, v, bias


def test_pallas_kernel_matches_reference():
    q, k, v, bias = _inputs()
    ref = _forward_reference(q, k, v, bias, 0.125)
    out = _pallas_forward(q, k, v, bias, 0.125, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_window_attention_gradients():
    q, k, v, bias = _inputs(G=4, nW=2, s=8, d=4)

    def loss(q, k, v, bias):
        return jnp.sum(window_attention(q, k, v, bias, 0.5) ** 2)

    # custom-VJP grads vs autodiff through the plain reference
    g_custom = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_forward_reference(q, k, v, bias, 0.5) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_custom, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_shift_mask_blocks_cross_boundary_attention():
    """-inf mask rows must zero those attention weights (no NaNs)."""
    G, nW, s, d = 2, 2, 4, 2
    q, k, v, _ = _inputs(G=G, nW=nW, s=s, d=d)
    bias = np.zeros((nW, s, s), np.float32)
    bias[1, :, 2:] = -np.inf          # window 1 may not see positions 2+
    out = window_attention(q, k, v, jnp.asarray(bias), 1.0)
    assert np.all(np.isfinite(np.asarray(out)))


# --- NHWC-native fused kernel -------------------------------------------


def _nhwc_inputs(B=2, H=8, W=8, heads=2, d=4, nB=4, seed=1):
    ws = 4
    s = ws * ws
    C = heads * d
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    qkv = jax.random.normal(ks[0], (B, H, W, 3 * C))
    bias = jax.random.normal(ks[1], (nB, s, s))
    return qkv, bias


def test_nhwc_kernel_matches_reference():
    from sic_tpu.ops.window_attention import (_nhwc_pallas, _nhwc_reference)
    qkv, bias = _nhwc_inputs()
    ref = _nhwc_reference(qkv, bias, 0.5, 2)
    out = _nhwc_pallas(qkv, bias, 0.5, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_nhwc_kernel_broadcast_bias():
    # unshifted layers pass a single (1, s, s) bias shared by all windows
    from sic_tpu.ops.window_attention import (_nhwc_pallas, _nhwc_reference)
    qkv, bias = _nhwc_inputs(nB=1)
    ref = _nhwc_reference(qkv, bias, 0.5, 2)
    out = _nhwc_pallas(qkv, bias, 0.5, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_nhwc_gradients_match_reference_autodiff():
    from sic_tpu.ops.window_attention import (window_attention_nhwc,
                                              _nhwc_reference)
    qkv, bias = _nhwc_inputs(B=1, H=4, W=4, heads=2, d=2, nB=1)

    def loss(qkv, bias):
        return jnp.sum(window_attention_nhwc(qkv, bias, 0.5, 2) ** 2)

    def loss_ref(qkv, bias):
        return jnp.sum(_nhwc_reference(qkv, bias, 0.5, 2) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(qkv, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("nB", [1, 4])
def test_nhwc_bwd_kernel_matches_reference_vjp(nB):
    """The fused Pallas backward (interpret mode) must match autodiff
    through the einsum reference for both bias layouts."""
    from sic_tpu.ops.window_attention import (_nhwc_bwd_pallas,
                                              _nhwc_reference)
    qkv, bias = _nhwc_inputs(nB=nB, seed=7)
    g = jax.random.normal(jax.random.PRNGKey(9), qkv.shape[:3] + (qkv.shape[3] // 3,))
    _, vjp = jax.vjp(lambda a, b: _nhwc_reference(a, b, 0.5, 2), qkv, bias)
    dqkv_ref, dbias_ref = vjp(g)
    dqkv, dbias = _nhwc_bwd_pallas(qkv, bias, g, 0.5, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_ref),
                               rtol=1e-4, atol=1e-5)


def test_nhwc_bwd_kernel_rejects_partial_bias_sharing():
    from sic_tpu.ops.window_attention import _nhwc_bwd_pallas
    qkv, bias = _nhwc_inputs(nB=2)
    g = jnp.zeros(qkv.shape[:3] + (qkv.shape[3] // 3,))
    with pytest.raises(ValueError, match="bias rows"):
        _nhwc_bwd_pallas(qkv, bias, g, 0.5, 2, interpret=True)


def test_swin_block_output_unchanged_by_rewire():
    """Smoke: the rewired SwinBlock runs at both shift settings."""
    from sic_tpu.models.swin import SwinBlock
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 128))
    for shifted in (False, True):
        m = SwinBlock(2, 64, 256, 4, shifted, not shifted, None)
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("shifted,rel_pos", [(False, True), (True, False),
                                             (True, True)])
def test_window_attention_module_matches_historical_pipeline(shifted,
                                                             rel_pos):
    """The NHWC rewiring of WindowAttention must be a pure refactor: the
    module output is reconstructed here through the HISTORICAL transpose
    pipeline (roll -> qkv Dense -> window/head transposes ->
    _forward_reference -> inverse transposes -> out Dense -> unroll),
    using the module's own params — any layout/bias-order/roll wiring
    change in the module shows up as a numeric mismatch."""
    from sic_tpu.models.swin import (WindowAttention, _full_shift_mask,
                                     _relative_index)

    heads, d, ws = 2, 4, 4
    B, H, W = 2, 8, 8
    C = heads * d
    s = ws * ws
    nwh, nww = H // ws, W // ws
    nW = nwh * nww
    x = jax.random.normal(jax.random.PRNGKey(5), (B, H, W, C))
    m = WindowAttention(heads, d, ws, shifted, rel_pos, None)
    p = m.init(jax.random.PRNGKey(1), x)
    got = np.asarray(m.apply(p, x))

    prm = p["params"]
    xr = jnp.roll(x, (-ws // 2, -ws // 2), (1, 2)) if shifted else x
    qkv = xr @ prm["to_qkv"]["kernel"]
    if rel_pos:
        idx = _relative_index(ws)
        bias = prm["pos_embedding"][idx[:, :, 0], idx[:, :, 1]]
    else:
        bias = prm["pos_embedding"]
    bias = bias.astype(jnp.float32)
    bias = (bias[None] + jnp.asarray(_full_shift_mask(nwh, nww, ws))
            if shifted else jnp.broadcast_to(bias[None], (nW, s, s)))

    t = qkv.reshape(B, nwh, ws, nww, ws, 3, heads, d)
    t = t.transpose(5, 0, 6, 1, 3, 2, 4, 7).reshape(3, B * heads * nW, s, d)
    o = _forward_reference(t[0], t[1], t[2], bias, d ** -0.5)
    o = o.reshape(B, heads, nwh, nww, ws, ws, d)
    o = o.transpose(0, 2, 4, 3, 5, 1, 6).reshape(B, H, W, C)
    o = o @ prm["to_out"]["kernel"] + prm["to_out"]["bias"]
    if shifted:
        o = jnp.roll(o, (ws // 2, ws // 2), (1, 2))
    np.testing.assert_allclose(got, np.asarray(o), rtol=1e-6, atol=1e-6)


# -- fused sequence self-attention (ops/seq_attention.py) ---------------------


def test_seq_attention_kernel_matches_reference():
    from sic_tpu.ops.seq_attention import (_seq_attn_pallas,
                                           _seq_attn_reference)
    qkv = jax.random.normal(jax.random.PRNGKey(3), (4, 17, 3 * 32))
    ref = _seq_attn_reference(qkv, 0.25, 4)
    out = _seq_attn_pallas(qkv, 0.25, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_seq_attention_matches_torch_style_mha():
    """The fused path must equal the historical explicit head-transpose
    pipeline (which itself is port-oracle-tested against torch MHA)."""
    from sic_tpu.ops.seq_attention import _seq_attn_reference
    B, S, C, H = 3, 11, 24, 3
    qkv = jax.random.normal(jax.random.PRNGKey(5), (B, S, 3 * C))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = C // H

    def heads(t):
        return t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", heads(q) * hd ** -0.5, heads(k))
    probs = jax.nn.softmax(logits, axis=-1)
    expect = jnp.einsum("bhqk,bhkd->bhqd", probs, heads(v))
    expect = expect.transpose(0, 2, 1, 3).reshape(B, S, C)
    got = _seq_attn_reference(qkv, hd ** -0.5, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_seq_attention_gradients():
    from sic_tpu.ops.seq_attention import (_seq_attn_reference,
                                           seq_attention)
    qkv = jax.random.normal(jax.random.PRNGKey(7), (2, 9, 3 * 16))

    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(seq_attention(a, 0.25, 2))))(qkv)
    g2 = jax.grad(
        lambda a: jnp.sum(jnp.sin(_seq_attn_reference(a, 0.25, 2))))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_mha_module_output_unchanged_by_seq_attention_rewire():
    """MultiheadSelfAttention (now routed through seq_attention off-TPU's
    reference path) must produce the same output as the historical inline
    einsum implementation, masked and unmasked."""
    import flax.linen as nn

    from sic_tpu.models.layers import MultiheadSelfAttention

    class Historical(nn.Module):
        num_heads: int

        @nn.compact
        def __call__(self, x, attn_mask=None):
            d_model = x.shape[-1]
            head_dim = d_model // self.num_heads
            qkv = nn.Dense(3 * d_model, name="in_proj")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(t):
                B, S, _ = t.shape
                return t.reshape(B, S, self.num_heads,
                                 head_dim).transpose(0, 2, 1, 3)

            q, k, v = heads(q), heads(k), heads(v)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q * head_dim ** -0.5, k,
                                preferred_element_type=jnp.float32)
            if attn_mask is not None:
                logits = logits + attn_mask.astype(logits.dtype)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
            B, _, S, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(B, S, d_model)
            return nn.Dense(d_model, name="out_proj")(out)

    x = jax.random.normal(jax.random.PRNGKey(11), (2, 13, 32))
    mask = jnp.triu(jnp.full((13, 13), -jnp.inf), k=1)
    new = MultiheadSelfAttention(num_heads=4)
    old = Historical(num_heads=4)
    p = new.init(jax.random.PRNGKey(0), x)
    for m in (None, mask):
        a = new.apply(p, x, m)
        b = old.apply(p, x, m)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
