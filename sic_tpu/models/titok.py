"""Full TiTok tokenizer model (flax, NHWC, batch-major).

TPU re-design of the complete reference `TiTok` (reference:
src/titok/titok.py:73-211) and `PretrainedTokenizer` (titok/titok.py:30-71).
In the shipped codec the reference constructs TiTok once only to donate its
encoder/decoder weights to `Hybrid_Codec` and then deletes it
(codec_sq_fixbpp.py:459-467); this module makes the model itself available —
standalone 1-D tokenization (image -> 32 tokens -> image) including the
MaskGIT-VQGAN pixel path that the hybrid codec does not use.

Differences from the torch original:

- batch-major ``(B, S, D)`` sequences, NHWC images, no LND permutes;
- tiling (``make_img_stack``) is a reshape/transpose pair that XLA fuses
  into the patch-embed conv, and the tile axis is a batch axis that shards
  over the device mesh;
- the encoder keeps TiTok's "fake 2D" conv_out channel scramble so
  pretrained checkpoints port 1:1 (see ``HybridEncoder`` for the same
  trick on the hybrid path).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .hybrid import TiTokSpec
from .layers import LayerNorm, ResidualAttentionBlock, scaled_normal_init
from .maskgit_vqgan import MaskGITVQGANSpec, PixelDecoder, PixelQuantizer
from .quantizer import L2VectorQuantizer

from ..ops.quant import QDense

Dtype = Any


def make_img_stack(x, tile: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, nH*t, nW*t, C) -> (B*nH*nW, t, t, C) pixel tiles
    (reference: titok/titok.py:176-186, NHWC)."""
    B, H, W, C = x.shape
    nH, nW = H // tile, W // tile
    x = x.reshape(B, nH, tile, nW, tile, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * nH * nW, tile, tile, C), (nH, nW)


def inverse_img_stack(x, stack_shape: Tuple[int, int]):
    """Inverse of :func:`make_img_stack`
    (reference: titok/titok.py:188-198, NHWC)."""
    nH, nW = stack_shape
    BT, t1, t2, C = x.shape
    B = BT // (nH * nW)
    x = x.reshape(B, nH, nW, t1, t2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, nH * t1, nW * t2, C)


class TiTokEncoderViT(nn.Module):
    """Plain TiTok ViT encoder — no detail branch
    (reference: titok/blocks.py:71-144)."""
    spec: TiTokSpec
    dtype: Optional[Dtype] = None

    def setup(self):
        s = self.spec
        init = scaled_normal_init(s.width ** -0.5)
        self.patch_embed = nn.Conv(s.width, (s.patch_size, s.patch_size),
                                   strides=s.patch_size, dtype=self.dtype)
        self.class_embedding = self.param("class_embedding", init, (1, s.width))
        self.positional_embedding = self.param(
            "positional_embedding", init, (s.grid_size ** 2 + 1, s.width))
        self.latent_token_positional_embedding = self.param(
            "latent_token_positional_embedding", init,
            (s.num_latent_tokens, s.width))
        self.ln_pre = LayerNorm(dtype=self.dtype)
        self.transformer = [ResidualAttentionBlock(s.num_heads, 4.0, self.dtype)
                            for _ in range(s.num_layers)]
        self.ln_post = LayerNorm(dtype=self.dtype)
        self.conv_out = QDense(s.token_size, dtype=self.dtype,
                               sensitive=True)

    def __call__(self, pixel_values, latent_tokens):
        """pixel_values: (B, tile, tile, 3); latent_tokens: (N, width).
        Returns (B, num_latent_tokens, token_size)."""
        s = self.spec
        x = self.patch_embed(pixel_values)                # (B, g, g, width)
        B = x.shape[0]
        x = x.reshape(B, s.grid_size ** 2, s.width)
        cls = jnp.broadcast_to(self.class_embedding.astype(x.dtype),
                               (B, 1, s.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.positional_embedding.astype(x.dtype)
        lat = jnp.broadcast_to(latent_tokens.astype(x.dtype)[None],
                               (B, s.num_latent_tokens, s.width))
        lat = lat + self.latent_token_positional_embedding.astype(x.dtype)
        x = jnp.concatenate([x, lat], axis=1)

        x = self.ln_pre(x)
        for blk in self.transformer:
            x = blk(x)
        z = self.ln_post(x[:, 1 + s.grid_size ** 2:])
        # TiTok's "fake 2D" conv_out: a row-major reshape to (B, width, N, 1)
        # before the 1x1 conv scrambles channels; pretrained weights expect
        # exactly that arrangement (reference: titok/blocks.py:140-143).
        B2, N, W = z.shape
        z = z.reshape(B2, N * W).reshape(B2, W, N).transpose(0, 2, 1)
        return self.conv_out(z)                           # (B, N, token_size)


class TiTokDecoderViT(nn.Module):
    """Plain TiTok ViT decoder WITH the pixel ffn head the hybrid codec
    strips (reference: titok/blocks.py:147-224; the ffn at :192-197)."""
    spec: TiTokSpec
    ffn_out: int = 1024   # pixel-codebook logits (maskgit num_embeddings)
    dtype: Optional[Dtype] = None

    def setup(self):
        s = self.spec
        init = scaled_normal_init(s.width ** -0.5)
        self.decoder_embed = QDense(s.width, dtype=self.dtype)
        self.class_embedding = self.param("class_embedding", init, (1, s.width))
        self.positional_embedding = self.param(
            "positional_embedding", init, (s.grid_size ** 2 + 1, s.width))
        self.mask_token = self.param("mask_token", init, (1, 1, s.width))
        self.latent_token_positional_embedding = self.param(
            "latent_token_positional_embedding", init,
            (s.num_latent_tokens, s.width))
        self.ln_pre = LayerNorm(dtype=self.dtype)
        self.transformer = [ResidualAttentionBlock(s.num_heads, 4.0, self.dtype)
                            for _ in range(s.num_layers)]
        self.ln_post = LayerNorm(dtype=self.dtype)
        self.ffn_fc1 = QDense(2 * s.width, dtype=self.dtype)
        self.ffn_fc2 = QDense(self.ffn_out, dtype=self.dtype)

    def __call__(self, z_quantized):
        """z_quantized: (B, N, token_size) -> pixel-codebook logits
        (B, grid, grid, ffn_out)."""
        s = self.spec
        x = self.decoder_embed(z_quantized)
        B, seq_len, _ = x.shape
        mask = jnp.broadcast_to(self.mask_token.astype(x.dtype),
                                (B, s.grid_size ** 2, s.width))
        cls = jnp.broadcast_to(self.class_embedding.astype(x.dtype),
                               (B, 1, s.width))
        mask = jnp.concatenate([cls, mask], axis=1)
        mask = mask + self.positional_embedding.astype(x.dtype)
        x = x + self.latent_token_positional_embedding[:seq_len].astype(x.dtype)
        x = jnp.concatenate([mask, x], axis=1)

        x = self.ln_pre(x)
        for blk in self.transformer:
            x = blk(x)
        x = self.ln_post(x[:, 1:1 + s.grid_size ** 2])
        x = x.reshape(B, s.grid_size, s.grid_size, s.width)
        # ffn: 1x1 convs == Dense in NHWC (reference: blocks.py:192-197)
        x = jnp.tanh(self.ffn_fc1(x))
        return self.ffn_fc2(x)


class TiTok(nn.Module):
    """Image -> 32 1-D tokens -> image, via the MaskGIT-VQGAN pixel decoder
    (reference: titok/titok.py:73-211)."""
    spec: TiTokSpec = TiTokSpec()
    pixel: MaskGITVQGANSpec = MaskGITVQGANSpec()
    dtype: Optional[Dtype] = None

    def setup(self):
        s = self.spec
        self.encoder = TiTokEncoderViT(s, self.dtype)
        self.decoder = TiTokDecoderViT(s, self.pixel.num_embeddings, self.dtype)
        self.latent_tokens = self.param(
            "latent_tokens", scaled_normal_init(s.width ** -0.5),
            (s.num_latent_tokens, s.width))
        self.quantize = L2VectorQuantizer(s.codebook_size, s.token_size,
                                          s.commitment_cost, s.use_l2_norm)
        self.pixel_quantize = PixelQuantizer(self.pixel.num_embeddings,
                                             self.pixel.embedding_dim,
                                             self.pixel.commitment_cost)
        self.pixel_decoder = PixelDecoder(self.pixel, self.dtype)

    def encode(self, x):
        """x: (B, tile, tile, 3) -> (z_quantized, result_dict)
        (reference: titok.py:121-124)."""
        z = self.encoder(x, self.latent_tokens)
        return self.quantize(z)

    def decode(self, z_quantized):
        """(B, N, token_size) -> (B, tile, tile, 3)
        (reference: titok.py:126-132)."""
        logits = self.decoder(z_quantized)
        states = self.pixel_quantize.soft_decode(logits)
        return self.pixel_decoder(states)

    def decode_tokens(self, tokens):
        """(B, N) int tokens -> pixels (reference: titok.py:134-143)."""
        z_q = self.quantize.decode_indices(tokens)
        return self.decode(z_q)

    def decode_tokens_to_latent(self, tokens):
        """(B, N) -> pixel-codebook logits (reference: titok.py:156-167)."""
        z_q = self.quantize.decode_indices(tokens)
        return self.decoder(z_q)

    def decode_vqgan_latent(self, logits):
        """(reference: titok.py:169-175)"""
        return self.pixel_decoder(self.pixel_quantize.soft_decode(logits))

    def __call__(self, x):
        z_q, result = self.encode(x)
        return self.decode(z_q), result

    def forward_latent_concat(self, x):
        """Tile a large image, tokenize per tile, stitch the latent grid
        and decode once (reference: titok.py:200-211).  Returns (x_hat,
        y_hat) where y_hat is the pixel-decoder's pre-norm latent."""
        s = self.spec
        stack, stack_shape = make_img_stack(x, s.tile_px)
        _, result = self.encode(stack)
        logits = self.decode_tokens_to_latent(result["min_encoding_indices"])
        logits = inverse_img_stack(logits, stack_shape)
        states = self.pixel_quantize.soft_decode(logits)
        return self.pixel_decoder(states, return_latent=True)


class PretrainedTokenizer(nn.Module):
    """Frozen MaskGIT-VQGAN tokenizer shell (reference: titok.py:30-71)."""
    pixel: MaskGITVQGANSpec = MaskGITVQGANSpec()
    dtype: Optional[Dtype] = None

    def setup(self):
        from .maskgit_vqgan import PixelEncoder
        self.encoder = PixelEncoder(self.pixel, self.dtype)
        self.decoder = PixelDecoder(self.pixel, self.dtype)
        self.quantize = PixelQuantizer(self.pixel.num_embeddings,
                                       self.pixel.embedding_dim,
                                       self.pixel.commitment_cost)

    def encode(self, x):
        """(reference: titok.py:56-60)"""
        h = self.encoder(x)
        z_q, idx = self.quantize(h)
        return z_q, idx

    def decode(self, z_q):
        return self.decoder(z_q)

    def decode_from_indices(self, codes):
        """(reference: titok.py:66-69)"""
        return self.decoder(self.quantize.get_codebook_entry(codes))

    def __call__(self, x):
        z_q, idx = self.encode(x)
        return self.decode(z_q), idx
