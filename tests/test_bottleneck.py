"""End-to-end bottleneck: transforms + four-part prior + real bitstream."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sic_tpu.entropy.fourpart import (combine_for_writing, four_part_masks,
                                      uncombine)
from sic_tpu.models.bottleneck import BottleneckCoder, CompressiveBottleneck

FEAT, QUANT = 16, 8


@pytest.fixture(scope="module")
def coder():
    mod = CompressiveBottleneck(feat_dim=FEAT, quant_dim=QUANT, bpp_num=1)
    y = jnp.zeros((1, 8, 8, FEAT))
    params = mod.init(jax.random.PRNGKey(0), y, img_hw=(256, 256))
    return BottleneckCoder(mod, params, force_zero_thres=0.12)


def test_masks_partition():
    masks = four_part_masks(6, 10, 8)
    total = masks.sum(axis=0)
    np.testing.assert_array_equal(np.asarray(total), np.ones((6, 10, 8)))
    # combine/uncombine are inverses on masked data
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 10, 8))
    for i in range(4):
        masked = x * masks[i]
        plane = combine_for_writing(masked)
        np.testing.assert_allclose(np.asarray(uncombine(plane, masks[i])),
                                   np.asarray(masked), rtol=0, atol=0)


def test_bitexact_roundtrip(coder):
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, FEAT)) * 2.0
    y_hat, info = coder.compress_decompress(y, img_hw=(256, 256))
    assert y_hat.shape == (1, 8, 8, FEAT)
    assert len(info["bit_stream"]) > 0
    # the assert inside compress_decompress already guarantees bit-exactness;
    # additionally the real rate should track the model's estimate
    assert info["bpp"] > 0
    assert abs(info["bpp_diff"]) < max(0.5 * info["bpp_est"], 0.02)


def test_roundtrip_batch_and_rect(coder):
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 12, FEAT))
    y_hat, info = coder.compress_decompress(y, img_hw=(128, 384))
    assert y_hat.shape == y.shape


def test_forward_training_grads():
    mod = CompressiveBottleneck(feat_dim=FEAT, quant_dim=QUANT)
    y = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, FEAT))
    params = mod.init(jax.random.PRNGKey(0), y, img_hw=(256, 256))

    def loss_fn(p):
        y_hat, info = mod.apply(p, y, img_hw=(256, 256), training=True,
                                noise_rng=jax.random.PRNGKey(5))
        return jnp.mean((y_hat - y) ** 2) + 0.1 * info["bpp"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # rate term must reach the prior nets
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert gnorm > 0


def test_entropy_map_helpers():
    """Ablation helpers (reference: sq_bottleneck.py:219-253)."""
    import jax
    import jax.numpy as jnp
    from sic_tpu.models.bottleneck import BottleneckCoder, CompressiveBottleneck

    module = CompressiveBottleneck(feat_dim=16, quant_dim=8)
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    params = module.init(jax.random.PRNGKey(1), y, (64, 64))
    coder = BottleneckCoder(module, params)

    emap = coder.entropy_map(y)
    assert emap.shape == (1, 8, 8, 8)
    assert float(jnp.min(emap)) >= 0.0

    y_hat, info = coder.compress_decompress_entropy_map(y, (64, 64))
    assert "entropy_map" in info and info["bpp"] > 0
    # bit-map total is the estimator behind bpp_est
    est_bits = float(jnp.sum(info["entropy_map"]))
    assert est_bits == pytest.approx(info["bpp_est"] * 64 * 64, rel=1e-3)


@pytest.mark.parametrize("stream_part", [1, 2, 4])
def test_decompress_device_matches_host(stream_part):
    """The fully device-resident decode (Pallas rANS kernel chained between
    the shared prior/recon executables) must reproduce the host path
    bit-exactly — same stream, same index planes, same y_hat."""
    mod = CompressiveBottleneck(feat_dim=FEAT, quant_dim=QUANT, bpp_num=1)
    y0 = jnp.zeros((1, 8, 8, FEAT))
    params = mod.init(jax.random.PRNGKey(0), y0, img_hw=(256, 256))
    c = BottleneckCoder(mod, params, force_zero_thres=0.12,
                        stream_part=stream_part)
    y = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, FEAT)) * 2.0
    stream, y_hat_enc = c.compress(y)
    feat_shape = (1, 8, 8, QUANT)
    assert c.can_decompress_on_device(stream, feat_shape)
    host = c.decompress(stream, feat_shape)
    dev = c.decompress_device(stream, feat_shape)
    np.testing.assert_array_equal(np.asarray(dev), np.asarray(host))
    np.testing.assert_array_equal(np.asarray(dev), np.asarray(y_hat_enc))


def test_batch_encoded_streams_decode_per_image_bit_exact(coder):
    """The coding trajectory runs at CODING_BATCH on both sides, so a
    stream produced inside a batched encode decodes bit-exactly as a
    single image (the CLI-batched-compress -> service-single-decompress
    pattern; on TPU different-batch executables measurably diverge in
    bf16, desynchronizing the stream — see BottleneckCoder.CODING_BATCH)."""
    B = 3
    y = jax.random.normal(jax.random.PRNGKey(9), (B, 8, 8, FEAT)) * 2.0
    packed, y_hat_enc = coder.compress_plan(y)
    packed_np = np.asarray(packed)
    for b in range(B):
        stream_b = coder.encode_packed(packed_np[:, :, b:b + 1])
        y_hat_b = coder.decompress(stream_b, (1, 8, 8, QUANT))
        assert float(jnp.sum(jnp.abs(y_hat_b - y_hat_enc[b:b + 1]))) == 0.0
        dev_b = coder.decompress_device(stream_b, (1, 8, 8, QUANT))
        np.testing.assert_array_equal(np.asarray(dev_b), np.asarray(y_hat_b))


@pytest.mark.parametrize("stream_part", [1, 4])
def test_compress_device_matches_host_coder(stream_part):
    """The fully device-resident ENCODE (Pallas rANS kernel over the same
    device chain) must produce byte-identical per-image streams to the
    host coder, and they must decode back bit-exactly."""
    mod = CompressiveBottleneck(feat_dim=FEAT, quant_dim=QUANT, bpp_num=1)
    y0 = jnp.zeros((1, 8, 8, FEAT))
    params = mod.init(jax.random.PRNGKey(0), y0, img_hw=(256, 256))
    c = BottleneckCoder(mod, params, force_zero_thres=0.12,
                        stream_part=stream_part)
    B = 3
    y = jax.random.normal(jax.random.PRNGKey(11), (B, 8, 8, FEAT)) * 2.0

    packed, y_hat_host = c.compress_plan(y)
    expect = c.encode_packed_many(np.asarray(packed))

    streams, y_hat_dev = c.compress_device(y, interpret=True)
    assert len(streams) == B
    np.testing.assert_array_equal(np.asarray(y_hat_dev),
                                  np.asarray(y_hat_host))
    for b in range(B):
        assert streams[b] == expect[b], f"image {b} stream differs"
        back = c.decompress(streams[b], (1, 8, 8, QUANT))
        assert float(jnp.sum(jnp.abs(back - y_hat_dev[b:b + 1]))) == 0.0


def test_compress_device_falls_back_on_ragged_split():
    """quant planes that don't split evenly across substreams take the
    host path transparently (same streams, no error)."""
    mod = CompressiveBottleneck(feat_dim=FEAT, quant_dim=QUANT, bpp_num=1)
    y0 = jnp.zeros((1, 5, 5, FEAT))
    params = mod.init(jax.random.PRNGKey(0), y0, img_hw=(160, 160))
    c = BottleneckCoder(mod, params, force_zero_thres=0.12, stream_part=4)
    y = jax.random.normal(jax.random.PRNGKey(12), (1, 5, 5, FEAT)) * 2.0
    # n = 5*5*2 = 50 positions, not divisible by 4 parts
    packed, _ = c.compress_plan(y)
    expect = c.encode_packed_many(np.asarray(packed))
    streams, _ = c.compress_device(y, interpret=True)
    assert streams[0] == expect[0]


def test_decode_honors_stream_coding_batch():
    """A stream written under a different coding batch decodes bit-exactly
    when the decoder replays that contract (carried in the c2df header)."""
    mod = CompressiveBottleneck(feat_dim=FEAT, quant_dim=QUANT, bpp_num=1)
    y0 = jnp.zeros((1, 8, 8, FEAT))
    params = mod.init(jax.random.PRNGKey(0), y0, img_hw=(256, 256))
    enc4 = BottleneckCoder(mod, params, force_zero_thres=0.12, coding_batch=4)
    dec8 = BottleneckCoder(mod, params, force_zero_thres=0.12)  # default 8
    y = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, FEAT)) * 2.0
    stream, y_hat_enc = enc4.compress(y)
    got = dec8.decompress(stream, (1, 8, 8, QUANT), coding_batch=4)
    assert float(jnp.sum(jnp.abs(got - y_hat_enc))) == 0.0
    got_dev = dec8.decompress_device(stream, (1, 8, 8, QUANT), coding_batch=4)
    np.testing.assert_array_equal(np.asarray(got_dev), np.asarray(got))
