"""Committed-fixture regression tests for sic_tpu's OWN wire format.

Counterpart of the reference's shipped artifact chain (IO/images ->
IO/bitstreams -> IO/faiss; SURVEY §4): frozen tiny-spec params + one
``.c2df`` + expected u8 pixels live in ``tests/fixtures/golden/``.  A
silent wire-format or float-trajectory drift (encoder and decoder moving
together) passes every regenerate-from-scratch test but fails these.

If a DELIBERATE format change breaks them, regenerate with
``python tests/fixtures/golden/generate.py`` and say so in the commit.
"""
from pathlib import Path

import numpy as np
import pytest

from fixtures.golden.generate import (build_runtime, golden_input,
                                      load_params, make_header)

GOLDEN_DIR = Path(__file__).resolve().parent / "fixtures" / "golden"

pytestmark = pytest.mark.skipif(
    not (GOLDEN_DIR / "golden.c2df").exists(),
    reason="golden fixtures not generated")


@pytest.fixture(scope="module")
def rt():
    return build_runtime(load_params(GOLDEN_DIR / "params.npz"))


def test_committed_stream_decodes_to_committed_pixels(rt):
    from sic_tpu.container import sanitize_enc_result_types, unpack_c2df
    enc, header = unpack_c2df(GOLDEN_DIR / "golden.c2df")
    enc = sanitize_enc_result_types(enc)
    x = rt.decode_only(**enc, z_coder=header["z_coder"],
                       coding_batch=header["coding_batch"], output="u8")
    expected = np.load(GOLDEN_DIR / "expected_u8.npz")["u8"]
    # The entropy-decoded SYMBOLS are integer-exact (decode_only asserts
    # y_hat bit-equality internally); the final u8 pixels additionally
    # traverse the generative float decode, where a differently-compiled
    # XLA executable legitimately shifts ~1e-5 of pixels by 1 ulp of u8.
    # Tolerate exactly that; any trajectory/wire drift is orders louder.
    diff = np.abs(np.asarray(x)[0].astype(np.int32)
                  - expected.astype(np.int32))
    assert diff.max() <= 1, f"max pixel diff {diff.max()}"
    assert (diff != 0).mean() < 1e-3, \
        f"{(diff != 0).mean():%} of pixels changed"


def test_reencode_is_byte_identical(rt):
    from sic_tpu.container import pack_c2df
    enc = rt.encode_only_batched(golden_input()[None])[0]
    stream = pack_c2df(enc, make_header(rt))
    assert stream == (GOLDEN_DIR / "golden.c2df").read_bytes()
