"""Retrieval layer tests: quantization parity, index round-trip vs the
golden FAISS artifact, top-k search."""
import json

import numpy as np
import pytest

from conftest import reference_fixture, requires_reference
from sic_tpu.retrieval import (ClipCodec, CLIPSpec, VectorIndex,
                               decode_clip_stream, dequantize_clip_u8,
                               quantize_clip_u8, read_flat_index,
                               write_flat_index)




def test_clip_u8_quantization_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.normal(size=512).astype(np.float32)
    z /= np.linalg.norm(z)
    q = quantize_clip_u8(z)
    z2 = dequantize_clip_u8(q)
    assert np.abs(np.linalg.norm(z2) - 1.0) < 1e-5
    assert float(z @ z2) > 0.995  # 8-bit quantization keeps the direction


@requires_reference()
def test_golden_faiss_index_parses():
    v, metric = read_flat_index(reference_fixture("IO/faiss/index.faiss"))
    assert metric == "ip"
    assert v.shape == (1, 512)
    assert abs(np.linalg.norm(v[0]) - 1.0) < 1e-5
    # matches the shipped raw clip vector after u8 quantization
    raw = np.load(reference_fixture("IO/clip_vecs/apple.npy"))
    assert float(v[0] @ (raw / np.linalg.norm(raw))) > 0.9999


@requires_reference()
def test_faiss_file_roundtrip_byte_identical(tmp_path):
    golden = reference_fixture("IO/faiss/index.faiss").read_bytes()
    v, _ = read_flat_index(reference_fixture("IO/faiss/index.faiss"))
    write_flat_index(tmp_path / "out.faiss", v)
    assert (tmp_path / "out.faiss").read_bytes() == golden


def test_vector_index_search_and_persist(tmp_path):
    rng = np.random.default_rng(1)
    db = rng.normal(size=(100, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    idx = VectorIndex(64)
    idx.add_batch(db, [f"doc_{i}" for i in range(100)])

    scores, ids = idx.search(db[7], k=5)
    assert ids[0, 0] == 7
    assert scores[0, 0] == pytest.approx(1.0, abs=5e-3)  # bf16 MXU scoring
    assert np.all(np.diff(scores[0]) <= 1e-6)  # descending

    idx.persist(tmp_path)
    for fname in ("faiss.index", "paths.json", "meta.json",
                  "index.faiss", "ids.txt"):
        assert (tmp_path / fname).exists(), fname
    idx2, meta = VectorIndex.load(tmp_path)
    assert idx2.ntotal == 100 and idx2.ids[7] == "doc_7"
    s2, i2 = idx2.search(db[7], k=5)
    np.testing.assert_array_equal(ids, i2)

    # k > ntotal pads with -1 (FAISS convention)
    _, i3 = idx2.search(db[0], k=200)
    assert (i3 == -1).sum() == 100


def test_clip_codec_payload_roundtrip():
    cc = ClipCodec(spec=CLIPSpec(vision_layers=2, text_layers=2))
    rng = np.random.default_rng(2)
    img = (rng.uniform(size=(64, 48, 3)) * 255).astype(np.uint8)
    z = cc.image_to_unit_vec(img)
    assert z.shape == (512,)
    assert abs(np.linalg.norm(z) - 1.0) < 1e-4

    stream, meta = cc.quantize_u8_and_compress(z)
    assert meta["dim"] == 512 and meta["codec"] == "zstd"
    z2 = decode_clip_stream(stream, meta)
    assert float(z @ z2) > 0.995

    zt = cc.text_to_unit_vec(["a photo of an apple"])
    assert zt.shape == (1, 512)
    assert abs(np.linalg.norm(zt[0]) - 1.0) < 1e-4


def test_search_many_matches_serial():
    """Pipelined waves (search_many) return exactly the per-wave serial
    results, in order."""
    import numpy as np
    from sic_tpu.retrieval import VectorIndex

    rng = np.random.default_rng(0)
    db = rng.normal(size=(500, 32)).astype(np.float32)
    idx = VectorIndex(32)
    idx.add_batch(db, [f"d{i}" for i in range(500)])
    waves = [rng.normal(size=(16, 32)).astype(np.float32) for _ in range(5)]
    ref = [idx.search(q, k=7) for q in waves]
    out = idx.search_many(waves, k=7, depth=3)
    assert len(out) == len(ref)
    for (s0, i0), (s1, i1) in zip(ref, out):
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-6)
