"""Numerical parity for the MaskGIT-VQGAN pixel path and the full TiTok
model vs the reference torch implementation (reference:
src/titok/maskgit_vqgan.py, src/titok/titok.py).

These close the last inventory row (SURVEY §2.4): the pixel
tokenizer/decoder TiTok carries for standalone 1-D tokenization, which the
hybrid codec itself does not use.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import requires_reference

pytestmark = requires_reference()

sys.path.insert(0, "/root/reference/src")


class _NS:
    """Attribute view over nested dicts (OmegaConf.create stand-in)."""
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _NS(v) if isinstance(v, dict) else v)


def _install_stubs():
    if "omegaconf" not in sys.modules:
        sys.modules["omegaconf"] = types.ModuleType("omegaconf")
    # a FUNCTIONAL create (test_port_full_codec stubs an inert one)
    sys.modules["omegaconf"].OmegaConf = type(
        "OmegaConf", (), {"create": staticmethod(lambda d: _NS(dict(d)))})
    for name in ("torchvision", "torchvision.models"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]


_install_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sic_tpu import port  # noqa: E402
from sic_tpu.models import (MaskGITVQGANSpec, PretrainedTokenizer, TiTok,  # noqa: E402
                            TiTokSpec, inverse_img_stack, make_img_stack)

TOL = dict(rtol=2e-4, atol=2e-4)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _nchw(x_nhwc):
    return np.asarray(x_nhwc).transpose(0, 3, 1, 2)


def test_maskgit_vqgan_tokenizer_parity():
    """PretrainedTokenizer: encoder, quantizer and decoder round trip
    (reference: titok/titok.py:30-71, maskgit_vqgan.py:157-381)."""
    from titok.titok import PretrainedTokenizer as TorchTok
    torch.manual_seed(0)
    tm = TorchTok().eval()
    x = torch.randn(2, 3, 32, 32) * 0.5

    with torch.no_grad():
        h_ref = tm.encoder(x)
        zq_ref, idx_ref = tm.quantize(h_ref)[:2]
        rec_ref = tm.decode(zq_ref)
        rec_from_idx = tm.decode_from_indices(
            idx_ref.reshape(2, h_ref.shape[2], h_ref.shape[3]))

    params = port.port_pretrained_tokenizer(_sd(tm))
    m = PretrainedTokenizer(MaskGITVQGANSpec())
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))

    zq, idx = m.apply(params, xj, method=m.encode)
    rec = m.apply(params, zq, method=m.decode)
    rec2 = m.apply(params, idx, method=m.decode_from_indices)

    np.testing.assert_array_equal(
        np.asarray(idx).reshape(-1), idx_ref.numpy().reshape(-1))
    np.testing.assert_allclose(_nchw(zq), zq_ref.numpy(), **TOL)
    np.testing.assert_allclose(_nchw(rec), rec_ref.numpy(), **TOL)
    np.testing.assert_allclose(_nchw(rec2), rec_from_idx.numpy(), **TOL)


def _titok_pair():
    """Small-scale torch TiTok + ported flax TiTok."""
    from titok.titok import TiTok as TorchTiTok
    cfg = _NS({
        "dataset": {"preprocessing": {"crop_size": 64}},
        "model": {"vq_model": {
            "vit_enc_patch_size": 16, "vit_dec_patch_size": 16,
            "vit_enc_model_size": "small", "vit_dec_model_size": "small",
            "num_latent_tokens": 16, "token_size": 12,
            "codebook_size": 256, "commitment_cost": 0.25,
            "use_l2_norm": True}},
    })
    torch.manual_seed(1)
    tm = TorchTiTok(cfg).eval()
    spec = TiTokSpec(model_size="small", patch_size=16, num_latent_tokens=16,
                     token_size=12, codebook_size=256, tile_px=64)
    m = TiTok(spec=spec)
    params = port.port_titok(_sd(tm), num_layers=spec.num_layers)
    return tm, m, params


def test_titok_full_parity():
    """encode -> tokens -> generative pixel decode, end to end
    (reference: titok/titok.py:121-143)."""
    tm, m, params = _titok_pair()
    x = torch.randn(2, 3, 64, 64) * 0.4

    with torch.no_grad():
        zq_ref, res_ref = tm.encode(x)
        tokens_ref = res_ref["min_encoding_indices"]       # (B, 1, N)
        rec_ref = tm.decode_tokens(tokens_ref)

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    zq, res = m.apply(params, xj, method=m.encode)
    np.testing.assert_array_equal(np.asarray(res["min_encoding_indices"]),
                                  tokens_ref.numpy().reshape(2, -1))
    # torch zq is (B, C, 1, N); ours (B, N, C)
    np.testing.assert_allclose(
        np.asarray(zq).transpose(0, 2, 1)[:, :, None, :],
        zq_ref.numpy(), **TOL)

    rec = m.apply(params, res["min_encoding_indices"], method=m.decode_tokens)
    np.testing.assert_allclose(_nchw(rec), rec_ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_titok_latent_concat_parity():
    """Tiled big-image path (reference: titok/titok.py:200-211)."""
    tm, m, params = _titok_pair()
    x = torch.randn(1, 3, 64, 128) * 0.4                   # 1x2 tile grid

    # the torch helper hardcodes 256-px tiles (titok.py:178); replicate its
    # exact op sequence (titok.py:200-211) at the 64-px test tile instead
    with torch.no_grad():
        x_stack = torch.from_numpy(_nchw(make_img_stack(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 64)[0]))
        tokens_ref = tm.encode(x_stack)[1]["min_encoding_indices"]
        lat = tm.decode_tokens_to_latent(tokens_ref)       # (BT, K, 4, 4)
        lat_full = torch.from_numpy(_nchw(inverse_img_stack(
            jnp.asarray(lat.numpy().transpose(0, 2, 3, 1)), (1, 2))))
        states = torch.einsum("nchw,cd->ndhw", lat_full.softmax(1),
                              tm.pixel_quantize.embedding.weight)
        xh_ref, yh_ref = tm.pixel_decoder.forward_with_latent(states)

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    xh, yh = m.apply(params, xj, method=m.forward_latent_concat)
    np.testing.assert_allclose(_nchw(xh), xh_ref.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(_nchw(yh), yh_ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_img_stack_roundtrip():
    x = jnp.arange(2 * 64 * 128 * 3, dtype=jnp.float32).reshape(2, 64, 128, 3)
    stack, shape = make_img_stack(x, 64)
    assert stack.shape == (4, 64, 64, 3) and shape == (1, 2)
    np.testing.assert_array_equal(np.asarray(inverse_img_stack(stack, shape)),
                                  np.asarray(x))
