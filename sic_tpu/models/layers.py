"""Shared transformer layers (flax, batch-major, TPU-first).

Re-designed counterparts of the reference's ViT building blocks
(reference: src/titok/blocks.py:26-64).  Differences from the torch design:

- batch-major ``(B, S, D)`` sequences (the torch code is ``(S, B, D)``);
- the qkv projection stays packed as one matmul so the whole block is two
  MXU-sized GEMM chains; torch ``nn.MultiheadAttention`` checkpoints port
  1:1 onto ``in_proj``/``out_proj``;
- optional ``dtype`` for bf16 compute with f32 params.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

import functools

from ..ops.quant import QDense

# torch nn.LayerNorm parity (eps 1e-5; flax default is 1e-6)
LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-5)


class MultiheadSelfAttention(nn.Module):
    """Packed-qkv self attention (torch ``nn.MultiheadAttention`` layout)."""
    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, attn_mask=None):
        d_model = x.shape[-1]
        assert d_model % self.num_heads == 0
        head_dim = d_model // self.num_heads

        qkv = QDense(3 * d_model, dtype=self.dtype, name="in_proj")(x)

        if attn_mask is None:
            # fused Pallas kernel on TPU: heads split by VMEM lane
            # slicing, logits never in HBM (ops/seq_attention.py);
            # plain einsum pipeline elsewhere — identical math
            from ..ops import seq_attention
            out = seq_attention(qkv, head_dim ** -0.5, self.num_heads)
        else:
            # masked path (CLIP text causal mask, S=77): XLA einsums
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(t):  # (B, S, D) -> (B, H, S, hd)
                B, S, _ = t.shape
                return t.reshape(B, S, self.num_heads,
                                 head_dim).transpose(0, 2, 1, 3)

            q, k, v = heads(q), heads(k), heads(v)
            scale = head_dim ** -0.5
            logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                                preferred_element_type=jnp.float32)
            logits = logits + attn_mask.astype(logits.dtype)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
            B, _, S, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(B, S, d_model)
        return QDense(d_model, dtype=self.dtype, name="out_proj")(out)


class MLP(nn.Module):
    """GELU MLP (torch ``c_fc``/``c_proj`` naming for ckpt porting)."""
    hidden: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = QDense(self.hidden, dtype=self.dtype, name="c_fc")(x)
        x = nn.gelu(x, approximate=False)
        return QDense(d, dtype=self.dtype, name="c_proj")(x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (reference: titok/blocks.py:26-64)."""
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, attn_mask=None):
        d_model = x.shape[-1]
        h = LayerNorm(dtype=self.dtype, name="ln_1")(x)
        x = x + MultiheadSelfAttention(self.num_heads, self.dtype,
                                       name="attn")(h, attn_mask)
        if self.mlp_ratio > 0:
            h = LayerNorm(dtype=self.dtype, name="ln_2")(x)
            x = x + MLP(int(d_model * self.mlp_ratio), self.dtype, name="mlp")(h)
        return x


def scaled_normal_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.normal(key, shape, dtype)
    return init
