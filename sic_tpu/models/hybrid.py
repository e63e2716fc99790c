"""Hybrid TiTok + detail-branch codec (flax, NHWC, tile-batched).

TPU re-design of the reference hybrid model
(reference: src/models/codec_sq_fixbpp.py:48-439, src/titok/blocks.py:71-224).

Architecture notes vs the torch original:

- **Tiling is the parallel axis.**  Images are padded to multiples of
  ``tile_px`` (256) and reshaped to a ``(B*nH*nW)`` tile batch that the ViT
  consumes; under pjit this axis is sharded across the device mesh (see
  ``sic_tpu.parallel``), which is the TPU counterpart of the reference's
  data-parallel GPU loop.
- **Batch-major sequences** ``(B, S, D)`` everywhere; no LND permutes.
- **Freezing is an optimizer concern**: TiTok sub-trees are frozen via the
  ``trainable_mask`` predicate in ``sic_tpu.train``, not via module state.
- **remat** replaces ``torch.utils.checkpoint`` for the ``save_mem`` path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn

import jax.numpy as jnp

from .bottleneck import CompressiveBottleneck
from .convnext import ConvNeXtBlock
from .cross import InteractiveCrossAttn, tile_nhwc_to_tokens, tokens_to_tile_nhwc
from .layers import LayerNorm, ResidualAttentionBlock, scaled_normal_init
from .quantizer import L2VectorQuantizer
from .swin import SwinStack

from ..ops.quant import QDense

Dtype = Any

_VIT_SIZES = {"tiny": (128, 2, 2),  # test-scale, not in the reference table
              "small": (512, 8, 8), "base": (768, 12, 12),
              "large": (1024, 24, 16)}


@dataclasses.dataclass(frozen=True)
class TiTokSpec:
    """vq_model config counterpart (reference: config_test.yaml:20-34)."""
    model_size: str = "large"
    patch_size: int = 16
    num_latent_tokens: int = 32
    token_size: int = 12
    codebook_size: int = 4096
    commitment_cost: float = 0.25
    use_l2_norm: bool = True
    tile_px: int = 256

    @property
    def width(self) -> int:
        return _VIT_SIZES[self.model_size][0]

    @property
    def num_layers(self) -> int:
        return _VIT_SIZES[self.model_size][1]

    @property
    def num_heads(self) -> int:
        return _VIT_SIZES[self.model_size][2]

    @property
    def grid_size(self) -> int:
        return self.tile_px // self.patch_size


class PixelShuffle(nn.Module):
    """Depth-to-space with torch ``nn.PixelShuffle`` channel ordering so
    checkpoints port 1:1 (in channel = c*r*r + i*r + j)."""
    r: int = 2

    def __call__(self, x):
        B, H, W, C = x.shape
        r = self.r
        x = x.reshape(B, H, W, C // (r * r), r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(B, H * r, W * r, C // (r * r))


class _FeatBlock(nn.Module):
    """Per-insert-position detail refiner: 2 swin + 2 ConvNeXt
    (reference: codec_sq_fixbpp.py:75-79)."""
    feat_width: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = SwinStack(self.feat_width, 2, dtype=self.dtype, name="swin")(x)
        x = ConvNeXtBlock(self.feat_width, mlp_ratio=2.0, kernel_size=5,
                          dtype=self.dtype, name="convnext_0")(x)
        x = ConvNeXtBlock(self.feat_width, mlp_ratio=2.0, kernel_size=5,
                          dtype=self.dtype, name="convnext_1")(x)
        return x


def _maybe_remat(cls, remat: bool, static_argnums=()):
    """nn.remat for the save_mem path (torch checkpointing counterpart;
    argnum 0 is the module instance)."""
    return nn.remat(cls, static_argnums=static_argnums) if remat else cls


# -- pipeline-parallel trunk cells ---------------------------------------------

@dataclasses.dataclass(frozen=True)
class PPConfig:
    """Pipeline-parallel execution config for the hybrid trunks.

    With ``mesh=None`` the trunk still uses the stacked-cell param layout
    (leaves gain a leading cell axis; runs as a sequential ``nn.scan``) —
    that is also the init path.  With a mesh, the cells execute as a GPipe
    ppermute ring over ``mesh`` axis ``axis`` (parallel/pipeline.py), so
    each stage holds ``1/P`` of the trunk params: shard the cell leaves
    ``P(axis)`` and the trunk memory scales with the stage count.

    No reference counterpart — the reference is single-GPU torch
    (SURVEY.md §2.6); this is the TPU mesh-scaling surface.
    """
    mesh: Any = None
    axis: str = "pipe"
    batch_axis: Optional[str] = None
    n_microbatch: Optional[int] = None


def cell_partition(num_layers: int, insert_pos: Tuple[int, ...]) -> int:
    """Largest cell size ``k`` dividing ``num_layers`` with every insert
    position at a cell end (layer ``c*k + k-1``).  The shipped geometries
    partition exactly: 24 layers / inserts (3,7,11,15,19) -> k=4 (6 cells,
    1 insert-free); 8 layers / inserts (1,3,5,7) -> k=2 (4 cells)."""
    live = [p for p in insert_pos if p < num_layers]  # positions beyond the
    # trunk never fire in the sequential loop; ignore them here too
    for k in range(num_layers, 0, -1):
        if num_layers % k == 0 and all(p % k == k - 1 for p in live):
            return k
    raise ValueError(f"no cell partition for L={num_layers}, {insert_pos}")


def cell_gates(num_layers: int, insert_pos: Tuple[int, ...]):
    """Per-cell 0/1 interaction gates for :class:`TrunkCell` stacks."""
    k = cell_partition(num_layers, insert_pos)
    live = {p for p in insert_pos if p < num_layers}
    return [1.0 if (c * k + k - 1) in live else 0.0
            for c in range(num_layers // k)]


class TrunkCell(nn.Module):
    """One pipeline cell of a hybrid trunk: ``cell_size`` ViT layers, then
    a *gated* titok<->detail interaction (cross-attn + feat refiner).

    Cells are structurally identical so their params stack on a leading
    cell axis (``nn.scan`` layout) and pipeline over a mesh axis.  Cells
    whose last layer is not an insert position carry dead interaction
    params behind a 0-gate (``jnp.where`` — bit-exact skip); for the
    flagship geometry that is 1 cell of 6, ~4%% of trunk FLOPs.
    """
    titok_width: int
    num_heads: int
    cell_size: int
    feat_width: int
    num_attns: int
    grid_size: int
    extra_tokens: int
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, carry, gate, stack_shape: Tuple[int, int]):
        x, feat = carry
        rab = _maybe_remat(ResidualAttentionBlock, self.remat)
        for j in range(self.cell_size):
            x = rab(self.num_heads, 4.0, self.dtype, name=f"vit_{j}")(x)
        cross = _maybe_remat(InteractiveCrossAttn, self.remat,
                             static_argnums=(3,))
        f2, x2 = cross(self.titok_width, self.feat_width, self.num_attns,
                       self.grid_size, self.grid_size, self.extra_tokens,
                       dtype=self.dtype, name="inter")(feat, x, stack_shape)
        f2 = _maybe_remat(_FeatBlock, self.remat)(
            self.feat_width, self.dtype, name="feat_block")(f2)
        x = jnp.where(gate > 0.5, x2, x)
        feat = jnp.where(gate > 0.5, f2, feat)
        return (x, feat), None


def _make_cells(spec: TiTokSpec, insert_pos, feat_width, num_attns, remat,
                dtype, name="trunk_cells"):
    k = cell_partition(spec.num_layers, insert_pos)
    scan_cls = nn.scan(TrunkCell, variable_axes={"params": 0},
                       split_rngs={"params": True},
                       length=spec.num_layers // k,
                       in_axes=(0, nn.broadcast))
    return scan_cls(titok_width=spec.width, num_heads=spec.num_heads,
                    cell_size=k, feat_width=feat_width, num_attns=num_attns,
                    grid_size=spec.grid_size,
                    extra_tokens=spec.num_latent_tokens + 1,
                    remat=remat, dtype=dtype, name=name)


def _run_cells(cells_mod, pp: PPConfig, spec: TiTokSpec, insert_pos,
               feat_width, num_attns, remat, dtype, x, feat, stack_shape,
               initializing: bool):
    gates = jnp.asarray(cell_gates(spec.num_layers, insert_pos), x.dtype)
    if pp.mesh is None or initializing:
        (x, feat), _ = cells_mod((x, feat), gates, stack_shape)
        return x, feat
    from ..parallel.pipeline import spmd_pipeline
    cell_params = cells_mod.variables["params"]
    k = cell_partition(spec.num_layers, insert_pos)
    cell = TrunkCell(titok_width=spec.width, num_heads=spec.num_heads,
                     cell_size=k, feat_width=feat_width, num_attns=num_attns,
                     grid_size=spec.grid_size,
                     extra_tokens=spec.num_latent_tokens + 1,
                     remat=remat, dtype=dtype,
                     parent=None)  # detached: applied functionally per stage

    def apply_block(pg, act):
        p, g = pg
        (nx, nf), _ = cell.apply({"params": p}, act, g, stack_shape)
        return (nx, nf)

    x, feat = spmd_pipeline(apply_block, (cell_params, gates), (x, feat),
                            pp.mesh, pp.axis, pp.batch_axis, pp.n_microbatch)
    return x, feat


class HybridEncoder(nn.Module):
    """Frozen TiTok ViT encoder interleaved with a trainable detail branch
    (reference: codec_sq_fixbpp.py:48-183)."""
    spec: TiTokSpec
    insert_pos: Tuple[int, ...] = (3, 7, 11, 15, 19)
    feat_width: int = 768
    num_attns: int = 2
    remat: bool = False
    dtype: Optional[Dtype] = None
    pp: Optional[PPConfig] = None

    def setup(self):
        s = self.spec
        scale = s.width ** -0.5
        init = scaled_normal_init(scale)
        self.patch_embed = nn.Conv(s.width, (s.patch_size, s.patch_size),
                                   strides=s.patch_size, dtype=self.dtype)
        self.class_embedding = self.param("class_embedding", init, (1, s.width))
        self.positional_embedding = self.param(
            "positional_embedding", init, (s.grid_size ** 2 + 1, s.width))
        self.latent_token_positional_embedding = self.param(
            "latent_token_positional_embedding", init,
            (s.num_latent_tokens, s.width))
        self.ln_pre = LayerNorm(dtype=self.dtype)
        if self.pp is not None:
            self.trunk_cells = _make_cells(s, self.insert_pos,
                                           self.feat_width, self.num_attns,
                                           self.remat, self.dtype)
        else:
            rab = _maybe_remat(ResidualAttentionBlock, self.remat)
            self.transformer = [rab(s.num_heads, 4.0, self.dtype) for _ in range(s.num_layers)]
        self.ln_post = LayerNorm(dtype=self.dtype)
        self.conv_out = QDense(s.token_size, dtype=self.dtype,
                               sensitive=True)

        # detail branch
        self.pix_emb_proj = QDense(self.feat_width, dtype=self.dtype)
        self.feat_in = SwinStack(self.feat_width, 4, dtype=self.dtype)
        if self.pp is None:
            cross = _maybe_remat(InteractiveCrossAttn, self.remat, static_argnums=(3,))
            fb = _maybe_remat(_FeatBlock, self.remat)
            self.inter_blocks = {
                str(i): cross(s.width, self.feat_width, self.num_attns,
                              s.grid_size, s.grid_size, s.num_latent_tokens + 1,
                              dtype=self.dtype)
                for i in self.insert_pos}
            self.feat_blocks = {str(i): fb(self.feat_width, self.dtype)
                                for i in self.insert_pos}
        self.feat_out_swin = SwinStack(self.feat_width, 2, dtype=self.dtype)
        self.feat_out_down = nn.Conv(self.feat_width, (2, 2), strides=2,
                                     dtype=self.dtype)
        self.feat_out_ln = LayerNorm(dtype=self.dtype)
        self.feat_out_fc = QDense(self.feat_width, dtype=self.dtype)

    def __call__(self, pixel_values, latent_tokens):
        """pixel_values: (B, H, W, 3) in [0, 1], H/W multiples of tile_px;
        latent_tokens: (num_latent_tokens, width).
        Returns (z (BT, n_latent, token_size), feat (B, H/32, W/32, fw),
        stack_shape)."""
        s = self.spec
        x_emb = self.patch_embed(pixel_values)            # (B, H/16, W/16, width)
        feat_emb = self.pix_emb_proj(x_emb)

        x, stack_shape = tile_nhwc_to_tokens(x_emb, s.grid_size)
        BT = x.shape[0]
        cls = jnp.broadcast_to(self.class_embedding.astype(x.dtype),
                               (BT, 1, s.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.positional_embedding.astype(x.dtype)
        lat = jnp.broadcast_to(latent_tokens.astype(x.dtype)[None],
                               (BT, s.num_latent_tokens, s.width))
        lat = lat + self.latent_token_positional_embedding.astype(x.dtype)
        x = jnp.concatenate([x, lat], axis=1)             # (BT, 1+256+32, width)

        feat = self.feat_in(feat_emb)

        x = self.ln_pre(x)
        if self.pp is not None:
            x, feat = _run_cells(self.trunk_cells, self.pp, s,
                                 self.insert_pos, self.feat_width,
                                 self.num_attns, self.remat, self.dtype,
                                 x, feat, stack_shape,
                                 self.is_initializing())
        else:
            for i in range(s.num_layers):
                x = self.transformer[i](x)
                if i in self.insert_pos:
                    feat, x = self.inter_blocks[str(i)](feat, x, stack_shape)
                    feat = self.feat_blocks[str(i)](feat)

        z = x[:, 1 + s.grid_size ** 2:]
        z = self.ln_post(z)
        # TiTok's "fake 2D" projection: the torch code row-major *reshapes*
        # (B, N, width) to (B, width, N, 1) before the 1x1 conv_out — a
        # channel scramble, not a transpose — and pretrained weights expect
        # exactly that arrangement (reference: titok/blocks.py:140-143).
        BT2, N, W = z.shape
        z = z.reshape(BT2, N * W).reshape(BT2, W, N).transpose(0, 2, 1)
        z = self.conv_out(z)                              # (BT, n_latent, token_size)

        feat = self.feat_out_swin(feat)
        feat = self.feat_out_down(feat)                   # stride 16 -> 32
        feat = self.feat_out_fc(self.feat_out_ln(feat))
        return z, feat, stack_shape


class HybridDecoder(nn.Module):
    """Frozen TiTok ViT decoder + detail-branch upsampler
    (reference: codec_sq_fixbpp.py:186-300)."""
    spec: TiTokSpec
    insert_pos: Tuple[int, ...] = (3, 7, 11, 15, 19)
    feat_width: int = 768
    num_attns: int = 2
    remat: bool = False
    dtype: Optional[Dtype] = None
    pp: Optional[PPConfig] = None

    def setup(self):
        s = self.spec
        scale = s.width ** -0.5
        init = scaled_normal_init(scale)
        self.decoder_embed = QDense(s.width, dtype=self.dtype)
        self.class_embedding = self.param("class_embedding", init, (1, s.width))
        self.positional_embedding = self.param(
            "positional_embedding", init, (s.grid_size ** 2 + 1, s.width))
        self.mask_token = self.param("mask_token", init, (1, 1, s.width))
        self.latent_token_positional_embedding = self.param(
            "latent_token_positional_embedding", init,
            (s.num_latent_tokens, s.width))
        self.ln_pre = LayerNorm(dtype=self.dtype)
        if self.pp is not None:
            self.trunk_cells = _make_cells(s, self.insert_pos,
                                           self.feat_width, self.num_attns,
                                           self.remat, self.dtype)
        else:
            rab = _maybe_remat(ResidualAttentionBlock, self.remat)
            self.transformer = [rab(s.num_heads, 4.0, self.dtype) for _ in range(s.num_layers)]
        self.ln_post = LayerNorm(dtype=self.dtype)
        # (the TiTok decoder's original pixel ffn is dropped, as in the
        # reference: codec_sq_fixbpp.py:195)

        self.feat_up_conv = nn.Conv(self.feat_width * 4, (1, 1), dtype=self.dtype)
        self.feat_up_shuffle = PixelShuffle(2)
        self.feat_up_swin = SwinStack(self.feat_width, 4, dtype=self.dtype)
        if self.pp is None:
            cross = _maybe_remat(InteractiveCrossAttn, self.remat, static_argnums=(3,))
            fb = _maybe_remat(_FeatBlock, self.remat)
            self.inter_blocks = {
                str(i): cross(s.width, self.feat_width, self.num_attns,
                              s.grid_size, s.grid_size, s.num_latent_tokens + 1,
                              dtype=self.dtype)
                for i in self.insert_pos}
            self.feat_blocks = {str(i): fb(self.feat_width, self.dtype)
                                for i in self.insert_pos}

    def __call__(self, z_quantized, h_quantized, stack_shape: Tuple[int, int]):
        """z_quantized: (BT, n_latent, token_size); h_quantized:
        (B, H/32, W/32, feat_width).  Returns (titok_hat (B, H/16, W/16,
        width), feat (B, H/16, W/16, feat_width))."""
        s = self.spec
        nH, nW = stack_shape
        x = self.decoder_embed(z_quantized)               # (BT, n_latent, width)
        BT, seq_len, _ = x.shape

        mask = jnp.broadcast_to(self.mask_token.astype(x.dtype),
                                (BT, s.grid_size ** 2, s.width))
        cls = jnp.broadcast_to(self.class_embedding.astype(x.dtype),
                               (BT, 1, s.width))
        mask = jnp.concatenate([cls, mask], axis=1)
        mask = mask + self.positional_embedding.astype(x.dtype)
        x = x + self.latent_token_positional_embedding[:seq_len].astype(x.dtype)
        x = jnp.concatenate([mask, x], axis=1)            # (BT, 1+256+32, width)

        feat = self.feat_up_conv(h_quantized)
        feat = self.feat_up_shuffle(feat)                 # stride 32 -> 16
        feat = self.feat_up_swin(feat)

        x = self.ln_pre(x)
        if self.pp is not None:
            x, feat = _run_cells(self.trunk_cells, self.pp, s,
                                 self.insert_pos, self.feat_width,
                                 self.num_attns, self.remat, self.dtype,
                                 x, feat, stack_shape,
                                 self.is_initializing())
        else:
            for i in range(s.num_layers):
                x = self.transformer[i](x)
                if i in self.insert_pos:
                    feat, x = self.inter_blocks[str(i)](feat, x, stack_shape)
                    feat = self.feat_blocks[str(i)](feat)

        x = x[:, 1:1 + s.grid_size ** 2]
        x = self.ln_post(x)
        titok_hat = tokens_to_tile_nhwc(x, stack_shape, s.grid_size)
        return titok_hat, feat


class FeatMerge(nn.Module):
    """Prior fusion: titok_hat + feat_hat -> logits over the VQGAN codebook
    (reference: codec_sq_fixbpp.py:395-439)."""
    titok_width: int = 1024
    feat_width: int = 768
    n_embed: int = 256
    inner_width: int = 1024
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, titok, feat):
        titok = SwinStack(self.titok_width, 2, dtype=self.dtype, name="titok_in")(titok)
        feat = SwinStack(self.feat_width, 2, dtype=self.dtype, name="feat_in")(feat)
        h = jnp.concatenate([titok, feat], axis=-1)
        h = QDense(self.titok_width * 2, dtype=self.dtype, name="merge_fc1")(h)
        h = LayerNorm(dtype=self.dtype, name="merge_ln")(h)
        h = nn.silu(h)
        h = QDense(self.inner_width, dtype=self.dtype, name="merge_fc2")(h)
        h = SwinStack(self.inner_width, 4, dtype=self.dtype, name="merge_swin")(h)
        h = LayerNorm(dtype=self.dtype, name="ffn_ln")(h)
        h = QDense(self.inner_width * 2, dtype=self.dtype, name="ffn_fc1")(h)
        h = jnp.tanh(h)
        return QDense(self.n_embed, dtype=self.dtype, name="ffn_fc2",
                      sensitive=True)(h)


class HybridCodec(nn.Module):
    """Encoder + decoder + both quantizers (reference: codec_sq_fixbpp.py:303-392)."""
    spec: TiTokSpec
    insert_pos_enc: Tuple[int, ...] = (3, 7, 11, 15, 19)
    insert_pos_dec: Tuple[int, ...] = (3, 7, 11, 15, 19)
    feat_width: int = 768
    quant_dim: int = 64
    num_attns: int = 2
    remat: bool = False
    dtype: Optional[Dtype] = None
    pp: Optional[PPConfig] = None

    def setup(self):
        s = self.spec
        self.encoder = HybridEncoder(s, self.insert_pos_enc, self.feat_width,
                                     self.num_attns, self.remat, self.dtype,
                                     self.pp)
        self.decoder = HybridDecoder(s, self.insert_pos_dec, self.feat_width,
                                     self.num_attns, self.remat, self.dtype,
                                     self.pp)
        self.latent_tokens = self.param(
            "latent_tokens", scaled_normal_init(s.width ** -0.5),
            (s.num_latent_tokens, s.width))
        self.quantize = L2VectorQuantizer(s.codebook_size, s.token_size,
                                          s.commitment_cost, s.use_l2_norm)
        self.quantize_feat = CompressiveBottleneck(self.feat_width, self.quant_dim)

    def encode(self, x, training: bool = False, noise_rng=None):
        z, h, stack_shape = self.encoder(x, self.latent_tokens)
        z_quantized, z_result = self.quantize(z)
        h_quantized, h_result = self.quantize_feat(
            h, (x.shape[1], x.shape[2]), q_idx=0, training=training,
            noise_rng=noise_rng)
        return {"z_quantized": z_quantized, "z_result_dict": z_result,
                "h_quantized": h_quantized, "h_result_dict": h_result,
                "stack_shape": stack_shape}

    def decode(self, z_quantized, h_quantized, stack_shape):
        return self.decoder(z_quantized, h_quantized, stack_shape)

    def decode_z_indices(self, indices):
        return self.quantize.decode_indices(indices)

    def __call__(self, x, training: bool = False, noise_rng=None):
        out = self.encode(x, training, noise_rng)
        titok_hat, feat_hat = self.decode(out["z_quantized"],
                                          out["h_quantized"],
                                          out["stack_shape"])
        out["titok_hat"] = titok_hat
        out["feat_hat"] = feat_hat
        return out
