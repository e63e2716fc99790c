"""Service tests: full HTTP round-trips against a live threaded server with
the tiny in-process model (no subprocess respawns, unlike the reference)."""
import io
import json
import threading
import urllib.request
import uuid

import numpy as np
import pytest

from tests.test_cli import FIXTURE_CFG


def _multipart(field, filename, payload, extra=None):
    boundary = uuid.uuid4().hex
    body = io.BytesIO()
    body.write(f"--{boundary}\r\n".encode())
    body.write(f'Content-Disposition: form-data; name="{field}"; '
               f'filename="{filename}"\r\n'.encode())
    body.write(b"Content-Type: application/octet-stream\r\n\r\n")
    body.write(payload)
    body.write(f"\r\n--{boundary}--\r\n".encode())
    return body.getvalue(), f"multipart/form-data; boundary={boundary}"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from sic_tpu.service import ServiceState, make_server
    root = tmp_path_factory.mktemp("svc")
    state = ServiceState(base_config=FIXTURE_CFG, index_dir=root / "faiss",
                         media_root=root, preview_cache=root / "previews")
    srv = make_server(state, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", state, root
    srv.shutdown()


def _post(url, data, content_type):
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": content_type})
    return urllib.request.urlopen(req, timeout=600)


def test_compress_decompress_endpoints(server):
    base, state, root = server
    from PIL import Image
    rng = np.random.default_rng(0)
    arr = (rng.uniform(size=(200, 260, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")

    body, ctype = _multipart("file", "t.png", buf.getvalue())
    resp = _post(base + "/compress", body, ctype)
    assert resp.status == 200
    assert resp.headers["X-SIC-Stage"] == "compress"
    assert int(resp.headers["X-SIC-Elapsed-MS"]) > 0
    c2df = resp.read()
    assert c2df[:4] == b"C2DF"

    body, ctype = _multipart("file", "t.c2df", c2df)
    resp = _post(base + "/decompress", body, ctype)
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "image/png"
    img = Image.open(io.BytesIO(resp.read()))
    assert img.size == (260, 200)  # padding cropped back

    # keep the bitstream around for the search test + index
    (root / "bits").mkdir(exist_ok=True)
    (root / "bits" / "t.c2df").write_bytes(c2df)
    from sic_tpu.cli.build import build_index_from_c2df_dir
    build_index_from_c2df_dir(root / "bits", state.index_dir)


def test_search_stream_ndjson(server):
    base, state, root = server
    c2df = (root / "bits" / "t.c2df").read_bytes()
    body, ctype = _multipart("file", "t.c2df", c2df)
    resp = _post(base + "/search/stream/c2df?topk=3", body, ctype)
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "application/x-ndjson"
    lines = [json.loads(l) for l in resp.read().decode().splitlines() if l.strip()]
    types = [l["type"] for l in lines]
    assert types[0] == "meta" and lines[0]["stage"] == "start"
    assert "item" in types and types[-1] == "done"
    item = next(l for l in lines if l["type"] == "item")
    assert item["score"] == pytest.approx(1.0, abs=5e-3)  # bf16 MXU scoring
    assert item["path"].endswith("t.c2df")
    assert item["preview_url"].startswith("/file?path=")

    # preview URL serves the decoded PNG
    resp = urllib.request.urlopen(base + item["preview_url"], timeout=600)
    assert resp.read()[:8] == b"\x89PNG\r\n\x1a\n"


def test_file_endpoint_gating(server):
    base, _, root = server
    secret = root / "secret.txt"
    secret.write_text("nope")
    req = urllib.request.Request(f"{base}/file?path={secret}")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 403


def test_file_endpoint_rejects_paths_outside_media_roots(server, tmp_path):
    """An allowed *file type* outside every media root must still 403 —
    the reference serves any image path verbatim (webapp.py:67-74)."""
    base, _, _ = server
    outside = tmp_path / "outside.png"
    outside.write_bytes(b"\x89PNG\r\n\x1a\n" + b"0" * 16)
    req = urllib.request.Request(f"{base}/file?path={outside}")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 403


def test_search_text_endpoint(server):
    base, _, _ = server
    body = json.dumps({"text": "an apple", "topk": 2}).encode()
    resp = _post(base + "/search/stream/text", body, "application/json")
    lines = [json.loads(l) for l in resp.read().decode().splitlines() if l.strip()]
    assert lines[0]["query_type"] == "text"
    assert lines[-1]["type"] in ("done", "error")  # random CLIP weights OK


def test_decompress_microbatching_concurrent_identical_bytes(server):
    """Concurrent /decompress requests with the same stream geometry are
    grouped into ONE batched device decode (service/batcher.py) and each
    response is byte-identical to the sequential answer."""
    import concurrent.futures

    base, state, _root = server
    from PIL import Image
    rng = np.random.default_rng(3)
    arr = (rng.uniform(size=(180, 220, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    body, ctype = _multipart("file", "mb.png", buf.getvalue())
    c2df = _post(base + "/compress", body, ctype).read()

    body, ctype = _multipart("file", "mb.c2df", c2df)
    seq_png = _post(base + "/decompress", body, ctype).read()
    assert seq_png[:8] == b"\x89PNG\r\n\x1a\n"

    # widen the window so the grouping is deterministic under load
    from sic_tpu.service.batcher import MicroBatcher
    state.batcher.close()
    state._batcher = MicroBatcher(state.runtime, window_ms=800)
    b0 = state._batcher.batches_dispatched

    def one(_i):
        return _post(base + "/decompress", body, ctype).read()

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        outs = list(pool.map(one, range(4)))
    for png in outs:
        assert png == seq_png
    assert state._batcher.requests_served >= 4
    assert state._batcher.batches_dispatched - b0 <= 2  # grouped, not 4 singles


def test_compress_microbatching_concurrent_identical_bytes(server):
    """Concurrent /compress uploads with the same padded shape are grouped
    into ONE batched device encode; batch rows are computed independently,
    so identical uploads must produce byte-identical .c2df responses."""
    import concurrent.futures

    base, state, _root = server
    from PIL import Image
    rng = np.random.default_rng(11)
    arr = (rng.uniform(size=(150, 190, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    body, ctype = _multipart("file", "cb.png", buf.getvalue())

    solo = _post(base + "/compress", body, ctype).read()
    assert solo[:4] == b"C2DF"

    from sic_tpu.service.batcher import EncodeBatcher
    state.enc_batcher.close()
    state._enc_batcher = EncodeBatcher(state.runtime, window_ms=800)
    b0 = state._enc_batcher.batches_dispatched

    with concurrent.futures.ThreadPoolExecutor(max_workers=3) as pool:
        outs = list(pool.map(
            lambda _: _post(base + "/compress", body, ctype).read(), range(3)))
    for c in outs:
        assert c == solo  # grouping never changes bytes
    assert state._enc_batcher.requests_served >= 3
    assert state._enc_batcher.batches_dispatched - b0 <= 2

    # the grouped stream still decodes
    body, ctype = _multipart("file", "cb.c2df", outs[0])
    png = _post(base + "/decompress", body, ctype).read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_corrupt_stream_in_a_group_fails_alone(server):
    """A corrupt upload whose header geometry matches the bucket must get
    its own 500 without poisoning the co-batched good requests (failure
    isolation in service/batcher.py)."""
    import concurrent.futures

    base, state, _root = server
    from PIL import Image

    from sic_tpu.container import pack_c2df, unpack_c2df
    rng = np.random.default_rng(17)
    arr = (rng.uniform(size=(160, 200, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    body, ctype = _multipart("file", "iso.png", buf.getvalue())
    good = _post(base + "/compress", body, ctype).read()
    good_body, good_ct = _multipart("file", "iso.c2df", good)
    seq_png = _post(base + "/decompress", good_body, good_ct).read()

    # same geometry fields, garbage h stream -> same bucket, decode raises
    enc, header = unpack_c2df(good)
    enc["h_bit_stream"] = b"\x00\x00\x00"
    bad = pack_c2df(enc, header)
    bad_body, bad_ct = _multipart("file", "bad.c2df", bad)

    from sic_tpu.service.batcher import MicroBatcher
    state.batcher.close()
    state._batcher = MicroBatcher(state.runtime, window_ms=800)

    def post_good(_i):
        return _post(base + "/decompress", good_body, good_ct).read()

    def post_bad():
        try:
            _post(base + "/decompress", bad_body, bad_ct)
        except urllib.error.HTTPError as e:
            return e.code
        return 200

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
        goods = [pool.submit(post_good, i) for i in range(3)]
        bad_code = pool.submit(post_bad).result()
    assert bad_code == 500
    for f in goods:
        assert f.result() == seq_png  # unharmed AND byte-identical


def test_healthz(server):
    """Container liveness probe (Dockerfile/CI smoke target)."""
    base, _, _ = server
    resp = urllib.request.urlopen(f"{base}/healthz", timeout=30)
    assert resp.status == 200
    assert json.loads(resp.read()) == {"ok": True}
