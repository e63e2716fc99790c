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
