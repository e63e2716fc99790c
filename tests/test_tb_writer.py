"""Metrics writer: TensorBoard event-file compatibility.

The writer hand-encodes Event/Summary protos + TFRecord framing; these
tests verify with our own CRC-checking reader AND with the real
``tensorboard`` package's loader (installed in this environment), proving
`tensorboard --logdir` can browse training curves.
(reference counterpart: Lightning TB logging, codec_sq_fixbpp.py:724-735.)
"""
import numpy as np
import pytest

from sic_tpu.utils.tb_writer import MetricsWriter, crc32c, read_events


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_round_trip_own_reader(tmp_path):
    with MetricsWriter(tmp_path) as w:
        w.scalar("train/loss", 0.5, step=1)
        w.scalar("train/loss", 0.25, step=2)
        w.scalar("val/bpp", 0.0123, step=2)
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    events = list(read_events(files[0]))
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = [(v["tag"], v["simple_value"], e["step"])
               for e in events for v in e.get("values", [])]
    assert ("train/loss", 0.5, 1) in scalars
    assert ("val/bpp", pytest.approx(0.0123), 2) in scalars
    # JSONL mirror exists and agrees
    import json
    lines = [json.loads(l) for l in
             (tmp_path / "scalars.jsonl").read_text().splitlines()]
    assert {"tag": "train/loss", "value": 0.5, "step": 1} in lines


def test_real_tensorboard_reads_our_files(tmp_path):
    tb = pytest.importorskip("tensorboard.backend.event_processing."
                             "event_file_loader")
    with MetricsWriter(tmp_path) as w:
        for step in range(5):
            w.scalar("train/ae_loss", 1.0 / (step + 1), step=step)
        w.image("recon", np.zeros((8, 8, 3), np.uint8), step=4)
    f = next(iter(tmp_path.glob("events.out.tfevents.*")))
    events = list(tb.EventFileLoader(str(f)).Load())
    assert events[0].file_version == "brain.Event:2"

    def _scalar(v):
        # TB >= 2 migrates simple_value to a rank-0 tensor (data_compat)
        if v.HasField("simple_value"):
            return v.simple_value
        if v.HasField("tensor") and v.tensor.float_val:
            return v.tensor.float_val[0]
        return None

    got = [(v.tag, _scalar(v), e.step) for e in events
           for v in e.summary.value if _scalar(v) is not None]
    assert ("train/ae_loss", 1.0, 0) in got
    assert ("train/ae_loss", 0.25, 3) in got
    # image summaries migrate to string tensors [w, h, png] under TB >= 2
    pngs = []
    for e in events:
        for v in e.summary.value:
            if v.HasField("image"):
                pngs.append(bytes(v.image.encoded_image_string))
            elif v.HasField("tensor") and v.tensor.string_val:
                pngs.extend(s for s in v.tensor.string_val
                            if s[:8] == b"\x89PNG\r\n\x1a\n")
    assert len(pngs) == 1
    assert pngs[0][:8] == b"\x89PNG\r\n\x1a\n"


def test_image_round_trip_own_reader(tmp_path):
    with MetricsWriter(tmp_path) as w:
        img = np.linspace(-1, 1, 4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
        w.image("x_hat", img, step=7)
    f = next(iter(tmp_path.glob("events.out.tfevents.*")))
    events = [e for e in read_events(f) if "values" in e]
    png = events[0]["values"][0]["image_png"]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    import io
    arr = np.asarray(Image.open(io.BytesIO(png)))
    assert arr.shape == (4, 6, 3)


def test_as_log_fn_adapter(tmp_path):
    w = MetricsWriter(tmp_path)
    fn = w.as_log_fn(step_key="step")
    fn({"train/loss": 1.5, "stage": "pix", "step": 3})  # stage is skipped
    fn({"train/loss": 1.25})                            # auto-step continues
    w.close()
    f = next(iter(tmp_path.glob("events.out.tfevents.*")))
    scalars = [(v["tag"], e["step"]) for e in read_events(f)
               for v in e.get("values", [])]
    assert ("train/loss", 3) in scalars
    assert ("train/loss", 4) in scalars
