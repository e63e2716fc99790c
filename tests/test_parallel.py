"""Mesh/sharding tests on the 8-virtual-device CPU harness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sic_tpu.parallel import (batch_sharding, image_sharding, make_mesh,
                              shard_batch, shard_state)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.shape["data"] * mesh.shape["tile"] == 8
    assert mesh.shape["tile"] == 2
    m2 = make_mesh(shape=(8, 1))
    assert m2.shape["data"] == 8


def test_sharded_batch_matches_single_device():
    """A jitted computation on a sharded batch must equal the unsharded
    result (XLA inserts the collectives)."""
    mesh = make_mesh()

    @jax.jit
    def f(x, w):
        y = jnp.einsum("bhwc,cd->bhwd", x, w)
        return jax.nn.softmax(y, axis=-1).sum(axis=(1, 2))

    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 16, 32))
    w = jax.random.uniform(jax.random.PRNGKey(1), (32, 16))
    ref = np.asarray(f(x, w))
    xs = shard_batch(x, mesh)          # batch over data, W over tile
    ws = shard_state(w, mesh)
    out = np.asarray(f(xs, ws))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


@pytest.mark.slow  # full-tier: heavy compile, coverage duplicated by faster fast-tier tests
def test_codec_runtime_on_mesh():
    """Mesh-driven CodecRuntime produces the same bitstream semantics."""
    from sic_tpu.models import CodecRuntime, init_codec
    from tests.test_codec_e2e import TINY

    _, params = init_codec(TINY, jax.random.PRNGKey(0))
    rt_single = CodecRuntime(TINY, params)
    mesh = make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    rt_mesh = CodecRuntime(TINY, params, mesh=mesh)

    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 256, 512, 3),
                           minval=-1.0)
    enc_a = rt_single.encode_only(x)
    enc_b = rt_mesh.encode_only(x)
    assert enc_a["feat_shape"] == enc_b["feat_shape"]
    assert enc_a["token_length"] == enc_b["token_length"]
    # the mesh path must round-trip bit-exactly through its own decoder
    xh = rt_mesh.decode_only(**enc_b)
    xh2 = rt_mesh.decode_only(**enc_b)
    np.testing.assert_array_equal(np.asarray(xh), np.asarray(xh2))
    assert xh.shape == (2, 256, 512, 3)


def test_prefetch_preserves_order():
    from sic_tpu.data import prefetch
    items = list(prefetch(iter(range(20)), depth=3))
    assert items == list(range(20))


def test_tp_sharding_specs():
    """Rule matching: qkv/up kernels column-parallel, out/down row-parallel,
    unmatched and non-divisible leaves replicated; FSDP fallback composes."""
    from sic_tpu.parallel import tp_sharding
    P = jax.sharding.PartitionSpec
    mesh = make_mesh(shape=(2, 2, 2), axis_names=("data", "model", "tile"))
    tree = {"blocks_0": {"attn": {"in_proj": {"kernel": jnp.zeros((8, 24)),
                                              "bias": jnp.zeros((24,))},
                                  "out_proj": {"kernel": jnp.zeros((8, 8)),
                                               "bias": jnp.zeros((8,))}},
                         "mlp": {"c_fc": {"kernel": jnp.zeros((8, 32))},
                                 "c_proj": {"kernel": jnp.zeros((32, 8))}}},
            "swin": {"to_qkv": {"kernel": jnp.zeros((8, 24))},
                     "mlp_fc2": {"kernel": jnp.zeros((33, 8))}},  # 33 % 2 != 0
            "conv": {"kernel": jnp.zeros((3, 3, 8, 16))}}
    specs = tp_sharding(tree, mesh)
    a = specs["blocks_0"]["attn"]
    assert a["in_proj"]["kernel"].spec == P(None, "model")
    assert a["in_proj"]["bias"].spec == P("model")
    assert a["out_proj"]["kernel"].spec == P("model", None)
    assert a["out_proj"]["bias"].spec == P()          # row-parallel bias stays whole
    assert specs["blocks_0"]["mlp"]["c_fc"]["kernel"].spec == P(None, "model")
    assert specs["swin"]["to_qkv"]["kernel"].spec == P(None, "model")
    assert specs["swin"]["mlp_fc2"]["kernel"].spec == P()   # not divisible
    assert specs["conv"]["kernel"].spec == P()              # no rule

    # + FSDP fallback: matched leaves get data on a free dim, unmatched
    # leaves get the plain FSDP split
    specs = tp_sharding(tree, mesh, fsdp_axis="data", min_size=1)
    assert specs["blocks_0"]["attn"]["in_proj"]["kernel"].spec == P("data", "model")
    assert "data" in tuple(specs["conv"]["kernel"].spec)


def test_tp_forward_matches_replicated(tmp_path):
    """The tiny codec forward under 2-way tensor parallelism (on a 3D
    data x model x tile mesh) must match the replicated result — GSPMD
    inserts the row-parallel all-reduces, the math is unchanged."""
    from sic_tpu.models import init_codec
    from sic_tpu.parallel import shard_state_tp
    from tests.test_codec_e2e import TINY

    model, params = init_codec(TINY, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 256, 512, 3),
                           minval=-1.0, maxval=1.0)

    @jax.jit
    def fwd(p, x):
        out = model.apply(p, x, need_full_decode=True)
        return out["x_hat"], out["bpp_loss"]

    ref_xh, ref_bpp = jax.tree.map(np.asarray, fwd(params, x))

    mesh = make_mesh(shape=(2, 2, 2), axis_names=("data", "model", "tile"))
    xs = shard_batch(x, mesh)
    ps = shard_state_tp(params, mesh)
    tp_xh, tp_bpp = jax.tree.map(np.asarray, fwd(ps, xs))
    np.testing.assert_allclose(tp_bpp, ref_bpp, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(tp_xh, ref_xh, rtol=2e-4, atol=2e-4)


def test_fsdp_sharding_specs():
    from sic_tpu.parallel import fsdp_sharding
    mesh = make_mesh(shape=(4, 2))
    tree = {"big": jnp.zeros((8, 128, 128)),       # shardable on dim 0
            "odd": jnp.zeros((7, 129 * 1024)),     # dim1 % 4 == 0
            "small": jnp.zeros((4,)),              # stays replicated
            "scalar": jnp.zeros(())}
    specs = fsdp_sharding(tree, mesh, min_size=1 << 10)
    assert specs["big"].spec == jax.sharding.PartitionSpec(None, "data", None) \
        or specs["big"].spec == jax.sharding.PartitionSpec("data", None, None)
    assert specs["small"].spec == jax.sharding.PartitionSpec()
    assert specs["scalar"].spec == jax.sharding.PartitionSpec()

    # sharded computation still matches replicated
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 128, 128))
    f = jax.jit(lambda t: jnp.sum(t ** 2))
    ref = float(f(x))
    xs = jax.device_put(x, fsdp_sharding({"x": x}, mesh, min_size=1)["x"])
    assert float(f(xs)) == pytest.approx(ref, rel=1e-6)


def _stacked_blocks(key, n_layers, width, num_heads):
    """Init n identical ResidualAttentionBlocks and stack their params."""
    from sic_tpu.models.layers import ResidualAttentionBlock
    block = ResidualAttentionBlock(num_heads, 4.0)
    x0 = jnp.zeros((1, 8, width))
    layers = [block.init(k, x0)["params"]
              for k in jax.random.split(key, n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers)
    return block, layers, stacked


def test_spmd_pipeline_matches_sequential():
    """4-stage GPipe over 8 ViT blocks == the sequential block loop; also
    composes with data parallelism on a (data, pipe) mesh."""
    from sic_tpu.parallel import spmd_pipeline
    width, heads = 64, 2
    block, layers, stacked = _stacked_blocks(jax.random.PRNGKey(0), 8,
                                             width, heads)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, width))

    ref = x
    for p in layers:
        ref = block.apply({"params": p}, ref)
    ref = np.asarray(ref)

    apply_block = lambda p, a: block.apply({"params": p}, a)
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "pipe"))
    out = spmd_pipeline(apply_block, stacked, x, mesh, axis="pipe",
                        batch_axis="data", n_microbatch=4)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    # pipe-only mesh, M != P
    mesh1 = make_mesh(shape=(8,), axis_names=("pipe",))
    out1 = spmd_pipeline(apply_block, stacked, x, mesh1, n_microbatch=2)
    np.testing.assert_allclose(np.asarray(out1), ref, rtol=2e-5, atol=2e-5)


def test_spmd_pipeline_grads_match_sequential():
    """The pipeline is differentiable: d(loss)/d(stacked params) equals the
    sequential trunk's grads (stacked), i.e. pp works for training."""
    from sic_tpu.parallel import spmd_pipeline
    # smallest geometry that still exercises a real schedule (2 stages x
    # 2 microbatches): the property is dimension-independent and the
    # grad-of-shard_map compile dominated the fast tier at larger sizes
    width, heads = 16, 2
    block, layers, stacked = _stacked_blocks(jax.random.PRNGKey(2), 2,
                                             width, heads)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 4, width))
    apply_block = lambda p, a: block.apply({"params": p}, a)
    mesh = make_mesh(shape=(2,), axis_names=("pipe",),
                     devices=jax.devices()[:2])

    def seq_loss(st):
        a = x
        def body(a, p):
            return apply_block(p, a), None
        a, _ = jax.lax.scan(body, a, st)
        return jnp.sum(a ** 2)

    def pp_loss(st):
        return jnp.sum(spmd_pipeline(apply_block, st, x, mesh,
                                     n_microbatch=2) ** 2)

    g_ref = jax.grad(seq_loss)(stacked)
    g_pp = jax.grad(pp_loss)(stacked)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5), g_ref, g_pp)


def test_pipeline_vit_trunk_titok():
    """pipeline_vit_trunk reproduces the TiTok encoder's sequential trunk
    from the real model param tree (stack_trunk on transformer_{i})."""
    from sic_tpu.config import TiTokSpec
    from sic_tpu.models.titok import TiTokEncoderViT
    from sic_tpu.parallel import pipeline_vit_trunk

    s = TiTokSpec(model_size="tiny")
    m = TiTokEncoderViT(s)
    lat = jax.random.normal(jax.random.PRNGKey(4), (s.num_latent_tokens, s.width))
    px = jax.random.uniform(jax.random.PRNGKey(5), (2, s.tile_px, s.tile_px, 3))
    params = m.init(jax.random.PRNGKey(6), px, lat)["params"]

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, s.width))
    from sic_tpu.models.layers import ResidualAttentionBlock
    block = ResidualAttentionBlock(s.num_heads, 4.0)
    ref = x
    for i in range(s.num_layers):
        ref = block.apply({"params": params[f"transformer_{i}"]}, ref)

    mesh = make_mesh(shape=(s.num_layers,), axis_names=("pipe",),
                     devices=jax.devices()[:s.num_layers])
    out = pipeline_vit_trunk(params, s.num_heads, x, mesh, n_microbatch=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# -- hybrid-trunk pipeline parallelism (stacked-cell layout) -------------------

def _pp_spec():
    from sic_tpu.config import tiny_spec
    # 2-layer tiny trunk with inserts at (0, 1): cell_size 1 -> 2 cells,
    # both gated on, pipelinable over 2 stages
    return tiny_spec(insert_pos_enc=(0, 1), insert_pos_dec=(0, 1))


def _named_and_cells_params(spec):
    from sic_tpu.models.codec import init_codec
    from sic_tpu.parallel import stack_hybrid_cells
    _, p0 = init_codec(spec, jax.random.PRNGKey(0), (256, 256))
    L = spec.titok.num_layers
    p1 = jax.tree.map(lambda x: x, p0)
    hc = p1["params"]["hybrid_codec"]
    hc["encoder"] = stack_hybrid_cells(hc["encoder"], L, spec.insert_pos_enc)
    hc["decoder"] = stack_hybrid_cells(hc["decoder"], L, spec.insert_pos_dec)
    return p0, p1


def test_cell_partition_math():
    """Cell partitioning of the shipped trunk geometries (fast-tier unit
    coverage; the full layout/forward/grad parity runs slow-tier)."""
    from sic_tpu.models.hybrid import cell_gates, cell_partition

    assert cell_partition(24, (3, 7, 11, 15, 19)) == 4      # flagship
    assert cell_gates(24, (3, 7, 11, 15, 19)) == [1.0] * 5 + [0.0]
    assert cell_partition(8, (1, 3, 5, 7)) == 2             # small_spec
    assert cell_gates(8, (1, 3, 5, 7)) == [1.0] * 4
    assert cell_partition(2, (0, 1)) == 1                   # pp test spec
    assert cell_partition(2, (3, 7)) == 2                   # no live inserts
    assert cell_gates(2, (3, 7)) == [0.0]


@pytest.mark.slow  # full-tier: two 256-px codec inits + applies
def test_hybrid_cells_layout_matches_sequential():
    """The stacked-cell trunk layout (PPConfig, nn.scan execution) is
    BIT-EXACT vs the named per-layer trunk, and the layout converters
    round-trip."""
    from sic_tpu.models.codec import Codec, init_codec
    from sic_tpu.models.hybrid import PPConfig
    from sic_tpu.parallel import unstack_hybrid_cells

    spec = _pp_spec()
    p0, p1 = _named_and_cells_params(spec)
    # converted layout == a fresh pp-mode init's layout
    _, p_ref = init_codec(spec, jax.random.PRNGKey(0), (256, 256),
                          pp=PPConfig())
    assert jax.tree.map(lambda t: t.shape, p1) \
        == jax.tree.map(lambda t: t.shape, p_ref)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (2, 256, 256, 3)).astype(np.float32))
    m0 = Codec(spec)
    m1 = Codec(spec, None, PPConfig())
    o0 = m0.apply(p0, x, need_full_decode=True)
    o1 = m1.apply(p1, x, need_full_decode=True)
    np.testing.assert_array_equal(np.asarray(o0["x_hat"]),
                                  np.asarray(o1["x_hat"]))

    enc_rt = unstack_hybrid_cells(
        p1["params"]["hybrid_codec"]["encoder"], spec.titok.num_layers,
        spec.insert_pos_enc)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        enc_rt, p0["params"]["hybrid_codec"]["encoder"])


@pytest.mark.slow  # full-tier: shard_map pipeline compile of the full codec
def test_hybrid_pp_forward_matches_sequential():
    """GPipe execution of the hybrid trunks (2 stages x 2 data, microbatch
    ring) reproduces the sequential forward within float tolerance."""
    from sic_tpu.models.codec import Codec
    from sic_tpu.models.hybrid import PPConfig

    spec = _pp_spec()
    p0, p1 = _named_and_cells_params(spec)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (4, 256, 256, 3)).astype(np.float32))
    o0 = Codec(spec).apply(p0, x, need_full_decode=True)

    mesh = make_mesh(shape=(2, 2), axis_names=("data", "pipe"),
                     devices=jax.devices()[:4])
    m = Codec(spec, None, PPConfig(mesh=mesh, batch_axis="data",
                                   n_microbatch=2))
    o1 = jax.jit(lambda p, x: m.apply(p, x, need_full_decode=True)["x_hat"])(
        p1, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0["x_hat"]),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow  # full-tier: fwd+bwd pipeline compile, ~7 min on CPU
def test_pp_train_step_matches_sequential():
    """The --pp training surface optimizes the same function as the
    sequential model: the full-codec training loss AND its gradients
    w.r.t. every param agree between the two layouts.

    Gradient-level comparison (per-leaf relative norm) rather than
    post-Adam params: Adam's first step is ~sign descent
    (update = lr*g/(sqrt(g^2)+eps)), so params whose grads are
    noise-level (e.g. attention k-biases — softmax shift invariance)
    would differ by a full step from pure float-reassociation noise."""
    from sic_tpu.models.codec import Codec
    from sic_tpu.models.hybrid import PPConfig
    from sic_tpu.parallel import batch_sharding, unstack_hybrid_cells
    import flax.traverse_util as tu

    spec = _pp_spec()
    p0, p1 = _named_and_cells_params(spec)
    x = np.random.default_rng(3).uniform(
        -1, 1, (4, 256, 256, 3)).astype(np.float32)

    def loss_of(model):
        def f(params, xb):
            out = model.apply(params, xb, need_full_decode=True)
            return (jnp.mean(jnp.abs(out["x"] - out["x_hat"]))
                    + 0.1 * out["bpp_loss"] + out["vq_loss"])
        return f

    m0 = Codec(spec)
    l0, g0 = jax.value_and_grad(loss_of(m0))(p0, jnp.asarray(x))

    mesh = make_mesh(shape=(2, 2), axis_names=("data", "pipe"),
                     devices=jax.devices()[:4])
    m1 = Codec(spec, None, PPConfig(mesh=mesh, batch_axis="data",
                                    n_microbatch=2))
    from sic_tpu.parallel import pp_sharding
    p1 = jax.device_put(p1, pp_sharding(p1, mesh, axis="pipe"))
    xg = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    l1, g1 = jax.jit(jax.value_and_grad(loss_of(m1)))(p1, xg)

    assert abs(float(l0) - float(l1)) < 5e-4, (float(l0), float(l1))

    L = spec.titok.num_layers
    un = jax.tree.map(lambda t: t, g1["params"])
    un["hybrid_codec"]["encoder"] = unstack_hybrid_cells(
        un["hybrid_codec"]["encoder"], L, spec.insert_pos_enc)
    un["hybrid_codec"]["decoder"] = unstack_hybrid_cells(
        un["hybrid_codec"]["decoder"], L, spec.insert_pos_dec)
    f0 = tu.flatten_dict(g0["params"])
    f1 = tu.flatten_dict(un)
    assert set(f0) == set(f1)
    for k in f0:
        a, b = np.asarray(f0[k], np.float64), np.asarray(f1[k], np.float64)
        denom = np.linalg.norm(a) + 1e-6
        rel = np.linalg.norm(a - b) / denom
        assert rel < 2e-2, ("/".join(k), rel)


def test_codec_params_layout_roundtrip():
    """Checkpoint-layout independence (round-4 advisor finding): the
    full-codec converters take a canonical tree to the stacked trunk_cells
    layout and back bit-exactly, and are no-ops when already in the target
    layout — so --pp checkpoints and deploy CLIs interoperate."""
    from sic_tpu.parallel import (codec_params_canonicalize,
                                  codec_params_stack)
    spec = _pp_spec()
    p_named, p_stacked = _named_and_cells_params(spec)

    stacked = codec_params_stack(p_named, spec)
    assert "trunk_cells" in stacked["params"]["hybrid_codec"]["encoder"]
    # already-stacked input passes through untouched
    again = codec_params_stack(stacked, spec)
    jax.tree.map(np.testing.assert_array_equal, again, stacked)
    # matches the reference stacking used by the PP tests
    jax.tree.map(np.testing.assert_array_equal, stacked, p_stacked)

    back = codec_params_canonicalize(stacked, spec)
    jax.tree.map(np.testing.assert_array_equal, back, p_named)
    # canonical input passes through untouched
    jax.tree.map(np.testing.assert_array_equal,
                 codec_params_canonicalize(p_named, spec), p_named)
