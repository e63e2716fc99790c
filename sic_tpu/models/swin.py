"""Swin window attention (flax, NHWC, TPU-first).

Counterpart of the reference's detail-branch Swin blocks
(reference: src/blocks/swin_transformer.py:64-156, src/models/
codec_sq_fixbpp.py:33-45).  Windows become one extra batch axis so the whole
layer is a single batched attention einsum on the MXU; the cyclic shift is
``jnp.roll`` (a static lane rotation after XLA layout assignment); shift
masks are built in numpy at trace time and constant-folded.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm

from ..ops.quant import QDense

Dtype = Any


def _relative_index(window_size: int) -> np.ndarray:
    """(S, S, 2) table of pairwise offsets shifted to [0, 2*ws-2]."""
    coords = np.stack(np.meshgrid(np.arange(window_size), np.arange(window_size),
                                  indexing="ij"), axis=-1).reshape(-1, 2)
    rel = coords[None, :, :] - coords[:, None, :]
    return rel + window_size - 1


def _shift_masks(window_size: int) -> tuple:
    """Additive -inf masks for the shifted layout
    (reference: swin_transformer.py:42-55)."""
    d = window_size // 2
    s = window_size * window_size
    ul = np.zeros((s, s), np.float32)
    ul[-d * window_size:, :-d * window_size] = -np.inf
    ul[:-d * window_size, -d * window_size:] = -np.inf
    lr = np.zeros((window_size, window_size, window_size, window_size), np.float32)
    lr[:, -d:, :, :-d] = -np.inf
    lr[:, :-d, :, -d:] = -np.inf
    lr = lr.reshape(s, s)
    return ul, lr


def _full_shift_mask(nwh: int, nww: int, window_size: int) -> np.ndarray:
    """Per-window additive mask (nwh*nww, S, S), constant-folded by XLA."""
    ul, lr = _shift_masks(window_size)
    s = window_size * window_size
    mask = np.zeros((nwh, nww, s, s), np.float32)
    mask[-1, :, :, :] += ul          # last window row
    mask[:, -1, :, :] += lr          # last window column
    return mask.reshape(nwh * nww, s, s)


class WindowAttention(nn.Module):
    """Windowed MHSA with optional cyclic shift + relative position bias."""
    heads: int
    head_dim: int
    window_size: int
    shifted: bool
    relative_pos_embedding: bool
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws, hds = self.window_size, self.heads
        inner = hds * self.head_dim
        assert H % ws == 0 and W % ws == 0, (H, W, ws)
        nwh, nww = H // ws, W // ws
        s = ws * ws

        if self.shifted:
            d = ws // 2
            x = jnp.roll(x, shift=(-d, -d), axis=(1, 2))

        qkv = QDense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        nW = nwh * nww

        if self.relative_pos_embedding:
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (2 * ws - 1, 2 * ws - 1))
            idx = _relative_index(ws)
            bias = pos[idx[:, :, 0], idx[:, :, 1]]
        else:
            bias = self.param("pos_embedding", nn.initializers.normal(1.0), (s, s))
        bias = bias.astype(jnp.float32)

        if self.shifted:
            # fold the shift mask into the per-window bias tensor
            bias = bias[None] + jnp.asarray(_full_shift_mask(nwh, nww, ws))
        else:
            bias = bias[None]                              # (1, s, s)

        # fused NHWC Pallas kernel on TPU (window partition = block
        # decomposition, head split = VMEM lane slicing — no HBM
        # relayouts); plain-XLA einsum pipeline elsewhere
        from ..ops import window_attention_nhwc
        out = window_attention_nhwc(qkv, bias, self.head_dim ** -0.5, hds)
        out = QDense(C, dtype=self.dtype, name="to_out")(out)

        if self.shifted:
            d = ws // 2
            out = jnp.roll(out, shift=(d, d), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    """Pre-LN window-attention block (reference: swin_transformer.py:131-156)."""
    heads: int
    head_dim: int
    mlp_dim: int
    window_size: int
    shifted: bool
    relative_pos_embedding: bool
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(dtype=self.dtype, name="norm_attn")(x)
        x = x + WindowAttention(self.heads, self.head_dim, self.window_size,
                                self.shifted, self.relative_pos_embedding,
                                self.dtype, name="attention_block")(h)
        h = LayerNorm(dtype=self.dtype, name="norm_mlp")(x)
        h = QDense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = QDense(x.shape[-1], dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class SwinStack(nn.Module):
    """``get_swin`` counterpart: alternating-shift Swin layers at head_dim 64
    (reference: codec_sq_fixbpp.py:33-45).  NHWC in/out — the torch BCHW
    rearrange wrappers have no TPU analogue (NHWC is native)."""
    width: int
    num_layers: int
    mlp_ratio: float = 4.0
    window_size: int = 16
    inverse_shifted: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        assert self.width % 64 == 0
        for i in range(self.num_layers):
            shifted = (not bool(i % 2)) if self.inverse_shifted else bool(i % 2)
            rel = False if self.inverse_shifted else (i == 0)
            x = SwinBlock(self.width // 64, 64, int(self.width * self.mlp_ratio),
                          self.window_size, shifted, rel, self.dtype,
                          name=f"block_{i}")(x)
        return x
