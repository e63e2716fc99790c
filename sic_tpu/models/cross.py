"""Bidirectional titok <-> detail-feature exchange block (flax, NHWC).

Counterpart of ``Interactive_crossAttn_type4``
(reference: src/models/cross_blocks.py:39-98).  Per 256-px tile the detail
feature's 16x16 patch tokens and the ViT tile tokens are concatenated into
one sequence and run through ``num_attns`` self-attention blocks; the detail
path is updated via LN+Linear residual and the ViT path via a
**zero-initialized** Linear (ControlNet-style — frozen TiTok behavior is
preserved at init; reference: src/blocks/zero_conv.py:18-26).

Layout: sequences are batch-major ``(B*nTiles, S, D)``; the detail feature
arrives as full-resolution NHWC and is tiled/untiled with static reshapes.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import LayerNorm, ResidualAttentionBlock

from ..ops.quant import QDense

Dtype = Any


def tile_nhwc_to_tokens(x, tile: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, nH*t, nW*t, C) -> ((B*nH*nW), t*t, C), plus (nH, nW)."""
    B, H, W, C = x.shape
    nH, nW = H // tile, W // tile
    x = x.reshape(B, nH, tile, nW, tile, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * nH * nW, tile * tile, C), (nH, nW)


def tokens_to_tile_nhwc(tokens, stack_shape: Tuple[int, int], tile: int):
    """Inverse of :func:`tile_nhwc_to_tokens`."""
    nH, nW = stack_shape
    BT, S, C = tokens.shape
    B = BT // (nH * nW)
    x = tokens.reshape(B, nH, nW, tile, tile, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, nH * tile, nW * tile, C)


class InteractiveCrossAttn(nn.Module):
    titok_width: int
    feat_width: int
    num_attns: int = 2
    feat_patch_size: int = 16
    titok_patch_size: int = 16
    extra_titok_tokens: int = 33  # latent tokens + cls
    mlp_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feat, titok_tokens, stack_shape: Tuple[int, int]):
        """feat: (B, H16, W16, feat_width) full-res NHWC;
        titok_tokens: (B*nTiles, S_titok, titok_width)."""
        fp = self.feat_patch_size
        s_titok = self.titok_patch_size ** 2 + self.extra_titok_tokens
        zeros = nn.initializers.zeros

        feat_tokens, _ = tile_nhwc_to_tokens(feat, fp)

        titok_pos = self.param("titok_pos_emb", zeros, (s_titok, self.titok_width))
        feat_pos = self.param("feat_pos_emb", zeros, (fp * fp, self.feat_width))

        f_pos = feat_tokens + feat_pos.astype(feat_tokens.dtype)
        t_pos = titok_tokens + titok_pos.astype(titok_tokens.dtype)
        t_pos = QDense(self.feat_width, dtype=self.dtype,
                         name="titok_compress_proj")(t_pos)

        f = jnp.concatenate([t_pos, f_pos], axis=1)
        for i in range(self.num_attns):
            f = ResidualAttentionBlock(self.feat_width // 64, self.mlp_ratio,
                                       self.dtype, name=f"attn_{i}")(f)
        f_feat_new = f[:, -fp * fp:, :]
        f_titok_new = f[:, :-fp * fp, :]

        # detail update: LN + Linear residual
        h = LayerNorm(dtype=self.dtype, name="feat_add_ln")(f_feat_new)
        h = QDense(self.feat_width, dtype=self.dtype, name="feat_add_fc")(h)
        feat_tokens = feat_tokens + h

        # titok update through the zero-init gate
        g = QDense(self.feat_width * 2, dtype=self.dtype,
                     name="titok_decompress_fc")(f_titok_new)
        g = LayerNorm(dtype=self.dtype, name="titok_decompress_ln")(g)
        g = nn.silu(g)
        g = QDense(self.titok_width, kernel_init=zeros, bias_init=zeros,
                     dtype=self.dtype, name="zero_add")(g)
        titok_tokens = titok_tokens + g

        feat = tokens_to_tile_nhwc(feat_tokens, stack_shape, fp)
        return feat, titok_tokens
