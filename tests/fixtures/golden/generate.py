"""Generate sic_tpu's own committed golden fixtures.

The reference ships a full artifact chain as de-facto regression fixtures
(IO/images/apple.jpg -> IO/bitstreams/apple.c2df -> IO/faiss; SURVEY §4).
This is the sic_tpu equivalent: frozen tiny-spec params, one ``.c2df``
encoded from them on a deterministic input, and the exact u8 pixels its
decode must produce.  ``test_golden_fixtures.py`` decodes the committed
stream with the committed params bit-exactly, so a silent wire-format or
float-trajectory drift between rounds fails the suite even when both the
encoder and decoder drift together (the class of bug the CODING_BATCH
contract fixed).

Run from the repo root to (re)generate — ONLY when a deliberate format
change invalidates the committed artifacts:

    python tests/fixtures/golden/generate.py
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
SEED = 42


def golden_input() -> np.ndarray:
    """Deterministic 256x256 test card: smooth gradients (exercises the
    skip-threshold / zero planes) + texture + hard edges, all from exact
    float64 arithmetic — no RNG, no image file to commit."""
    y, x = np.mgrid[0:256, 0:256].astype(np.float64) / 255.0
    r = 0.8 * np.sin(2 * np.pi * 1.5 * x) * np.cos(2 * np.pi * 0.75 * y)
    g = 1.6 * (x * y) - 0.8
    b = np.where((x * 8).astype(np.int64) % 2 == ((y * 8).astype(np.int64) % 2),
                 0.6, -0.6) * np.sin(2 * np.pi * 3 * (x + y))
    img = np.stack([r, g, b], axis=-1)
    return np.clip(img, -1.0, 1.0).astype(np.float32)


def build_runtime(params=None):
    import jax

    from sic_tpu.config import tiny_spec
    from sic_tpu.models import CodecRuntime, init_codec

    spec = tiny_spec()
    if params is None:
        _, params = init_codec(spec, jax.random.PRNGKey(SEED))
    return CodecRuntime(spec, params)


def save_params(params, path):
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(params, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params(path):
    from flax.traverse_util import unflatten_dict
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return unflatten_dict(flat, sep="/")


def make_header(rt) -> dict:
    return {
        "version": 2,
        "image_hw": [256, 256],
        "padding": [0, 0, 0, 0],
        "z_coder": rt.z_format,
        "coding_batch": rt.h_coder.coding_batch,
    }


def main():
    sys.path.insert(0, str(HERE.parents[2]))
    import os
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    # same persistent compile cache as tests/conftest.py: the committed
    # expected_u8 pixels are reproduced exactly only by the same compiled
    # executables (different XLA codegen shifts ~1e-5 of pixels by 1 ulp
    # of u8 — the test tolerates exactly that, nothing more)
    jax.config.update("jax_compilation_cache_dir", "/tmp/sic_tpu_xla_cache")

    from sic_tpu.container import pack_c2df

    rt = build_runtime()
    save_params(rt.params, HERE / "params.npz")

    x = golden_input()[None]
    enc = rt.encode_only_batched(x)[0]
    stream = pack_c2df(enc, make_header(rt))
    (HERE / "golden.c2df").write_bytes(stream)

    u8 = np.asarray(rt.decode_only(**enc, output="u8"))[0]
    np.savez_compressed(HERE / "expected_u8.npz", u8=u8)
    print(f"params.npz: {(HERE / 'params.npz').stat().st_size} B, "
          f"golden.c2df: {len(stream)} B, expected_u8: {u8.shape}")


if __name__ == "__main__":
    main()
