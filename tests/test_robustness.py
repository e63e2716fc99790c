"""Adversarial-input robustness: malformed containers and corrupt
bitstreams must raise clean errors, never crash or read out of bounds.
(The service decodes untrusted uploads — reference webapp.py:169+.)"""
import numpy as np
import pytest

from sic_tpu.container import pack_c2df, unpack_c2df
from sic_tpu.entropy import EntropyCoder, build_gaussian_tables


def test_unpack_rejects_garbage():
    with pytest.raises(ValueError):
        unpack_c2df(b"NOPE" + b"\x00" * 64)
    with pytest.raises(Exception):
        unpack_c2df(b"C2DF")  # truncated after magic


def test_unpack_truncated_blob():
    blob = pack_c2df({"a": b"xyz", "n": 7}, {"version": 2})
    for cut in (5, len(blob) // 2, len(blob) - 1):
        with pytest.raises(Exception):
            unpack_c2df(blob[:cut])


@pytest.fixture(scope="module")
def coder():
    t = build_gaussian_tables("gaussian")
    c = EntropyCoder(1)
    g = c.add_cdf(t.quantized_cdf, t.cdf_length, t.offset)
    return c, g


def test_decoder_rejects_malformed_streams(coder):
    c, g = coder
    # empty / sub-minimum streams
    for bad in (b"", b"\x01", b"\x01\x00\x00"):
        with pytest.raises(ValueError):
            c.set_stream(bad)
    # multi-substream header sizes exceeding the buffer
    with pytest.raises(ValueError):
        c.set_stream(bytes([0x11, 0xFF, 0xFF]) + b"\x00" * 8)
    with pytest.raises(ValueError):
        c.set_stream(bytes([0x71]) + b"\x00" * 4)  # 8 streams, no headers


def test_decoder_survives_corrupt_payload(coder):
    """Bit-flipped payloads decode to garbage symbols, not crashes."""
    c, g = coder
    rng = np.random.default_rng(0)
    sym = rng.integers(-5, 6, size=512).astype(np.int16)
    idx = rng.integers(0, 256, size=512).astype(np.int16)
    c.reset()
    c.encode_with_indexes(sym, idx, g)
    c.flush()
    stream = bytearray(c.get_encoded_stream())
    for i in range(1, len(stream), 7):
        stream[i] ^= 0xA5
    c.set_stream(bytes(stream))
    out = c.decode_stream(idx, g)          # must terminate cleanly
    assert out.shape == (512,)

    # truncated payload (valid header) also decodes without crashing
    c.set_stream(bytes(stream[: max(5, len(stream) // 3)]))
    out = c.decode_stream(idx, g)
    assert out.shape == (512,)


def test_service_rejects_bad_c2df_upload():
    """HTTP 500 with a clean error, no server crash."""
    import threading
    import urllib.request

    from tests.test_cli import FIXTURE_CFG
    from tests.test_service import _multipart
    from sic_tpu.service import ServiceState, make_server

    import tempfile
    with tempfile.TemporaryDirectory() as root:
        state = ServiceState(base_config=FIXTURE_CFG, index_dir=root,
                             media_root=root, preview_cache=root + "/p")
        srv = make_server(state, host="127.0.0.1", port=0)
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            body, ctype = _multipart("file", "evil.c2df", b"C2DF" + b"\xff" * 50)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/decompress", data=body,
                method="POST", headers={"Content-Type": ctype})
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=300)
            assert e.value.code == 500
        finally:
            srv.shutdown()


def test_decode_only_rejects_inconsistent_token_geometry():
    """token_length / z_indices_shape come from untrusted containers; a
    mismatch (or an absurd allocation request) must fail fast, before any
    stream decoding."""
    import jax

    from sic_tpu.config import tiny_spec
    from sic_tpu.models import CodecRuntime, init_codec

    spec = tiny_spec()
    _, params = init_codec(spec, jax.random.PRNGKey(0))
    rt = CodecRuntime(spec, params)
    base = dict(z_bit_stream=b"\x01" + b"\x00" * 8, h_bit_stream=b"\x01",
                img_shape=(256, 256), feat_shape=(1, 8, 8, spec.feat_width),
                stack_shape=(1, 1), z_indices_shape=(1, 8))
    with pytest.raises(ValueError):
        rt.decode_only(**base, token_length=1 << 30)   # absurd allocation
    with pytest.raises(ValueError):
        rt.decode_only(**base, token_length=9)         # != prod(zshape)


def test_device_decoder_survives_malformed_streams():
    """The on-device (Pallas) decode path must terminate cleanly on
    bit-flipped and truncated payloads (bounded escape loops in the kernel)
    and reject inconsistent substream framing, like the host decoder."""
    import jax
    import jax.numpy as jnp

    from sic_tpu.models.bottleneck import BottleneckCoder, CompressiveBottleneck
    from sic_tpu.ops.rans_decode import split_substreams

    mod = CompressiveBottleneck(feat_dim=16, quant_dim=8, bpp_num=1)
    y0 = jnp.zeros((1, 8, 8, 16))
    params = mod.init(jax.random.PRNGKey(0), y0, img_hw=(256, 256))
    c = BottleneckCoder(mod, params, force_zero_thres=0.12, stream_part=2)
    y = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 16)) * 2.0
    stream, _ = c.compress(y)
    feat_shape = (1, 8, 8, 8)

    # bit-flipped payload: garbage output, no hang/crash
    bad = bytearray(stream)
    for i in range(1, len(bad), 5):
        bad[i] ^= 0x5A
    out = c.decompress_device(bytes(bad), feat_shape)
    assert np.isfinite(np.asarray(out)).all()

    # truncated payload: either rejected up front (framing inconsistent)
    # or decodes to garbage cleanly — never a hang or crash
    keep = max(5, len(stream) // 3)
    try:
        out = c.decompress_device(stream[:keep], feat_shape)
        assert np.isfinite(np.asarray(out)).all()
    except ValueError:
        pass
    # inconsistent framing raises like the host coder
    with pytest.raises(ValueError):
        c.decompress_device(bytes([0x11, 0xFF, 0xFF]) + b"\x00" * 8,
                            feat_shape)
    assert split_substreams(stream)  # sanity: valid stream still parses
