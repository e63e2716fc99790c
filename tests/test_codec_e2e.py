"""End-to-end codec tests on a tiny spec (CPU, virtual 8-device harness).

Mirrors the reference's built-in invariants: bit-exact entropy round-trip
(reference: src/models/sq_bottleneck.py:210-211) and full
``encode_only -> .c2df -> decode_only`` parity
(reference: src/models/codec_sq_fixbpp.py:849-922).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sic_tpu.container import pack_c2df, sanitize_enc_result_types, unpack_c2df
from sic_tpu.models import (Codec, CodecRuntime, CodecSpec, TiTokSpec,
                            VQGANSpec, get_padding_size, init_codec,
                            pad_replicate)

TINY = CodecSpec(
    titok=TiTokSpec(model_size="tiny", codebook_size=64, token_size=8,
                    num_latent_tokens=8),
    vqgan=VQGANSpec(ch=32, ch_mult=(1, 1, 2, 2, 4), num_res_blocks=1,
                    attn_resolutions=(16,), z_channels=64, embed_dim=64,
                    n_embed=64, resolution=256),
    feat_width=64,
    quant_dim=16,
    merge_inner_width=128,
    insert_pos_enc=(1,),   # exercise the cross-attn exchange in-layer
    insert_pos_dec=(1,),
)


@pytest.fixture(scope="module")
def tiny_codec():
    model, params = init_codec(TINY, jax.random.PRNGKey(0))
    return model, params


def test_forward_shapes(tiny_codec):
    model, params = tiny_codec
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3), minval=-1.0)
    out = model.apply(params, x, need_full_decode=True)
    assert out["x_hat"].shape == (1, 256, 256, 3)
    assert out["logits"].shape == (1, 16, 16, TINY.vqgan.n_embed)
    assert np.isfinite(float(out["bpp_loss"]))
    assert np.isfinite(float(out["vq_loss"]))


def test_encode_decode_roundtrip_bit_exact(tiny_codec):
    _, params = tiny_codec
    rt = CodecRuntime(TINY, params)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 256, 256, 3), minval=-1.0)
    x_hat, bpp_dict, enc = rt.encode_decode(x, (256, 256))
    assert x_hat.shape == x.shape
    assert float(jnp.max(jnp.abs(x_hat))) <= 1.0
    assert bpp_dict["total_bpp"] > 0
    # decode twice -> identical output (deterministic bitstream decode)
    x_hat2 = rt.decode_only(**enc)
    np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat2))


def test_device_entropy_encode_matches_host(tiny_codec):
    """encode_only with the on-device rANS ENCODER produces the identical
    bit streams (and thus the identical .c2df) as the host coder path."""
    _, params = tiny_codec
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 256, 256, 3),
                           minval=-1.0)
    rt_host = CodecRuntime(TINY, params, stream_part=4,
                           device_entropy="host")
    rt_dev = CodecRuntime(TINY, params, stream_part=4,
                          device_entropy="device")
    enc_h = rt_host.encode_only(x)
    enc_d = rt_dev.encode_only(x)
    assert enc_d["h_bit_stream"] == enc_h["h_bit_stream"]
    assert enc_d["z_bit_stream"] == enc_h["z_bit_stream"]
    x_hat = rt_host.decode_only(**enc_d)
    np.testing.assert_array_equal(np.asarray(x_hat),
                                  np.asarray(rt_host.decode_only(**enc_h)))


def test_c2df_container_roundtrip(tiny_codec, tmp_path):
    _, params = tiny_codec
    rt = CodecRuntime(TINY, params)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 256, 256, 3), minval=-1.0)
    enc = rt.encode_only(x)
    enc["clip_stream"] = b"\x00" * 16
    enc["clip_meta"] = {"model_id": "test", "dim": 4}
    header = {"version": 2, "image_hw": [250, 251], "padding": [0, 5, 0, 6]}
    blob = pack_c2df(enc, header)
    path = tmp_path / "x.c2df"
    path.write_bytes(blob)

    enc2, header2 = unpack_c2df(path)
    enc2 = sanitize_enc_result_types(enc2)
    assert header2["image_hw"] == [250, 251]
    x_hat = rt.decode_only(**enc2)
    x_ref = rt.decode_only(**enc)
    np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_ref))


def test_padding_and_crop():
    l, r, t, b = get_padding_size(250, 251, 256)
    assert (l, r, t, b) == (0, 5, 0, 6)
    x = jnp.ones((1, 250, 251, 3))
    xp = pad_replicate(x, (l, r, t, b))
    assert xp.shape == (1, 256, 256, 3)


def test_batched_encode_matches_per_image(tiny_codec):
    """encode_only_batched must produce byte-identical per-image streams to
    one-at-a-time encode_only, and each must decode independently."""
    _, params = tiny_codec
    rt = CodecRuntime(TINY, params)
    x = jax.random.uniform(jax.random.PRNGKey(9), (3, 256, 256, 3), minval=-1.0)

    batched = rt.encode_only_batched(x)
    assert len(batched) == 3
    for b in range(3):
        single = rt.encode_only(x[b:b + 1])
        assert batched[b]["h_bit_stream"] == single["h_bit_stream"]
        assert batched[b]["z_bit_stream"] == single["z_bit_stream"]
        x_hat_b = rt.decode_only(**batched[b])
        x_hat_s = rt.decode_only(**single)
        np.testing.assert_array_equal(np.asarray(x_hat_b), np.asarray(x_hat_s))


def test_concurrent_decode_matches_sequential(tiny_codec):
    _, params = tiny_codec
    rt = CodecRuntime(TINY, params)
    x = jax.random.uniform(jax.random.PRNGKey(11), (4, 256, 256, 3), minval=-1.0)
    encs = rt.encode_only_batched(x)
    seq = [np.asarray(rt.decode_only(**e)) for e in encs]
    par = rt.decode_only_many(encs, workers=4)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a, np.asarray(b))
