"""Batched decode path: device-batched autoregressive steps over B
independent per-image bitstreams (4 host syncs total), equivalent to
per-image decode_only."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sic_tpu.config import tiny_spec
from sic_tpu.models import CodecRuntime, init_codec


@pytest.fixture(scope="module")
def rt():
    spec = tiny_spec()
    _, params = init_codec(spec, jax.random.PRNGKey(0))
    return CodecRuntime(spec, params)


def test_batched_decode_matches_per_image(rt):
    rng = np.random.default_rng(1)
    B = 4
    x = jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32))
    encs = rt.encode_only_batched(x)
    assert len(encs) == B

    xb = rt.decode_only_batched(encs)
    assert xb.shape == (B, 256, 256, 3)
    for i, e in enumerate(encs):
        xi = rt.decode_only(**e)
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xi[0]),
                                   rtol=2e-4, atol=2e-4)


def test_batched_decode_bit_exact_vs_encoder_simulation(rt):
    """The batched path runs the SAME compiled step functions at the SAME
    batch size as the batched encode, so the decoded latent trajectory is
    bit-exact — decoding must not raise the coder's validity assertions and
    reconstructions must be finite and deterministic."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (3, 256, 256, 3)).astype(np.float32))
    encs = rt.encode_only_batched(x)
    a = np.asarray(rt.decode_only_batched(encs))
    b = np.asarray(rt.decode_only_batched(encs))
    np.testing.assert_array_equal(a, b)
    assert np.all(np.isfinite(a))


def test_round_trip_pipelined_matches_sequential(rt):
    """Two batches in flight must reconstruct exactly what the sequential
    batched pipeline produces."""
    rng = np.random.default_rng(4)
    batches = [jnp.asarray(rng.uniform(-1, 1, (2, 256, 256, 3))
                           .astype(np.float32)) for _ in range(3)]
    outs = rt.round_trip_pipelined(batches)
    assert len(outs) == 3
    for xb, out in zip(batches, outs):
        ref = rt.decode_only_batched(rt.encode_only_batched(xb))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_batched_decode_rejects_mixed_shapes(rt):
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(-1, 1, (1, 256, 512, 3)).astype(np.float32))
    e1 = rt.encode_only(x1)
    e2 = rt.encode_only(x2)
    with pytest.raises(AssertionError):
        rt.decode_only_batched([e1, e2])


def test_decode_only_device_entropy_matches_host():
    """decode_only with the on-device Pallas rANS path (forced) must equal
    the host-coder path exactly, through the full codec."""
    spec = tiny_spec()
    _, params = init_codec(spec, jax.random.PRNGKey(0))
    rt_host = CodecRuntime(spec, params, stream_part=4, device_entropy="host")
    rt_dev = CodecRuntime(spec, params, stream_part=4, device_entropy="device")
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))
    enc = rt_host.encode_only(x)
    a = rt_host.decode_only(**enc)
    b = rt_dev.decode_only(**enc)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_only_u8_output_matches_host_conversion():
    """output='u8' converts pixels on device; must equal the host-side
    conversion of the float output exactly (same clip/scale/truncate)."""
    spec = tiny_spec()
    _, params = init_codec(spec, jax.random.PRNGKey(0))
    rt = CodecRuntime(spec, params, stream_part=4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))
    enc = rt.encode_only(x)
    xf = np.asarray(rt.decode_only(**enc))
    xu = np.asarray(rt.decode_only(**enc, output="u8"))
    assert xu.dtype == np.uint8
    ref = np.clip((xf + 1.0) * 127.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(xu, ref)
