"""Container format tests, including byte-exact golden round-trips."""
import numpy as np
import pytest

from sic_tpu.container import pack_c2df, unpack_c2df, sanitize_enc_result_types
from conftest import reference_fixture

APPLE = reference_fixture("IO/bitstreams/apple.c2df")



from conftest import requires_reference

pytestmark = requires_reference()

def test_roundtrip_synthetic():
    enc = {
        "z_bit_stream": b"\x01\x02\x03",
        "h_bit_stream": b"",
        "img_shape": (512, 768),
        "feat_shape": np.array([1, 768, 16, 24], dtype=np.int64),
        "stack_shape": (2, 3),
        "token_length": 192,
        "z_indices_shape": (6, 12, 1, 32),
        "clip_stream": b"\xff" * 10,
        "clip_meta": {"model_id": "x", "dim": 512},
        "a_float": 1.5,
        "a_bool": True,
        "a_none": None,
        "a_str": "hello",
        "a_list": [1, 2, 3],
        "an_f32": np.arange(6, dtype=np.float32).reshape(2, 3),
    }
    header = {"version": 2, "image_hw": [500, 700]}
    blob = pack_c2df(enc, header)
    enc2, header2 = unpack_c2df(blob)
    assert header2 == header
    assert enc2["z_bit_stream"] == enc["z_bit_stream"]
    assert enc2["token_length"] == 192
    assert enc2["a_float"] == 1.5
    assert enc2["a_bool"] is True
    assert enc2["a_none"] is None
    assert enc2["a_str"] == "hello"
    assert enc2["a_list"] == [1, 2, 3]
    np.testing.assert_array_equal(enc2["an_f32"], enc["an_f32"])
    # shape keys canonicalised to int32 arrays
    assert enc2["img_shape"].dtype == np.int32
    np.testing.assert_array_equal(enc2["img_shape"], [512, 768])

    s = sanitize_enc_result_types(enc2)
    assert s["img_shape"] == (512, 768)
    assert s["feat_shape"] == (1, 768, 16, 24)
    assert isinstance(s["token_length"], int)


@pytest.mark.skipif(not APPLE.exists(), reason="reference fixture unavailable")
def test_golden_apple_unpack():
    enc, header = unpack_c2df(APPLE)
    assert header["model_id"] == "ViT-B-32:laion2b_s34b_b79k"
    assert header["image_hw"] == [1000, 859]
    assert set(enc) == {
        "z_bit_stream", "h_bit_stream", "img_shape", "feat_shape",
        "stack_shape", "token_length", "z_indices_shape", "clip_stream",
        "clip_meta",
    }
    s = sanitize_enc_result_types(enc)
    assert s["img_shape"] == (1024, 1024)
    assert s["feat_shape"] == (1, 768, 32, 32)
    assert s["stack_shape"] == (4, 4)
    assert s["z_indices_shape"] == (16, 12, 1, 32)
    assert s["token_length"] == 512  # 16 tiles x 32 latent tokens


@pytest.mark.skipif(not APPLE.exists(), reason="reference fixture unavailable")
def test_golden_apple_byte_exact_repack():
    raw = APPLE.read_bytes()
    enc, header = unpack_c2df(raw)
    assert pack_c2df(enc, header) == raw


@pytest.mark.skipif(not APPLE.exists(), reason="reference fixture unavailable")
def test_golden_apple_clip_stream_decodes():
    import zstandard as zstd

    enc, _ = unpack_c2df(APPLE)
    raw = zstd.ZstdDecompressor().decompress(enc["clip_stream"])
    q = np.frombuffer(raw, dtype=np.uint8)
    assert q.size == enc["clip_meta"]["dim"] == 512
    z = (q.astype(np.float32) / 255.0) * 2.0 - 1.0
    z /= np.linalg.norm(z)
    ref = np.load(reference_fixture("IO/clip_vecs/apple.npy"))
    ref = ref / np.linalg.norm(ref)
    # u8 quantisation error bound
    assert float(np.dot(z, ref)) > 0.998


def test_cross_interop_with_reference_filemaker():
    """Two-way format interop, using the reference's own pack/unpack as the
    oracle: our blobs parse there, theirs parse here, byte-identically."""
    import sys
    import numpy as np
    sys.path.insert(0, "/root/reference/src")
    import filemaker as ref_fm

    from sic_tpu.container import pack_c2df, unpack_c2df

    enc = {
        "z_bit_stream": b"\x01\x02\x03",
        "h_bit_stream": b"\xff" * 10,
        "img_shape": (256, 512),
        "feat_shape": (1, 8, 16, 64),
        "stack_shape": (1, 2),
        "token_length": 64,
        "z_indices_shape": (2, 32),
        "clip_stream": b"zzz",
        "clip_meta": {"model_id": "m", "dim": 512},
    }
    header = {"version": 2, "image_hw": [250, 500], "padding": [0, 12, 0, 6]}

    ours = pack_c2df(enc, header)
    theirs = ref_fm.pack_c2df(dict(enc), dict(header))
    assert ours == theirs, "pack not byte-identical to the reference"

    enc_r, header_r = ref_fm.unpack_c2df(ours)
    assert header_r == header
    assert bytes(enc_r["z_bit_stream"]) == enc["z_bit_stream"]
    assert int(enc_r["token_length"]) == 64

    enc_o, header_o = unpack_c2df(theirs)
    assert header_o == header
    assert bytes(enc_o["h_bit_stream"]) == enc["h_bit_stream"]
    np.testing.assert_array_equal(np.asarray(enc_o["feat_shape"]),
                                  [1, 8, 16, 64])
