"""Fused sequence self-attention (Pallas TPU kernel).

The titok ViT towers, the interactive cross-attention blocks, the MaskGIT
generator and the CLIP vision tower all run packed-qkv full self-attention
over short sequences (S = 289 titok / 545 cross / 257 CLIP) at batch x
tiles fan-out (reference: src/titok/blocks.py:26-64 is the torch block all
of them port from).  The XLA lowering materializes the f32 logits tensor
``(B, H, S, S)`` in HBM (684 MB/layer for ViT-L at the bench batch) plus
four head-split transposes per layer — all pure HBM traffic.

This kernel is the sequence-attention mirror of
``window_attention_nhwc`` (ops/window_attention.py): one program per
sequence, the packed (S, 3C) qkv tile resident in VMEM, heads split by
static lane slicing, logits/probabilities never touching HBM.  One HBM
round trip per layer: read (S, 3C), write (S, C).

Backward recomputes with plain einsums under XLA (custom_vjp) — identical
math to the reference path, so training gradients are unchanged.

Masked attention (only the CLIP text tower's causal mask, S = 77) keeps
the XLA path: the mask re-fetch per program would cost more than the tiny
sequence saves.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seq_attn_kernel(qkv_ref, o_ref, *, heads, scale):
    c3 = qkv_ref.shape[2]
    C = c3 // 3
    d = C // heads
    qkv = qkv_ref[0]                              # (S, 3C), compute dtype
    outs = []
    for h in range(heads):
        q = qkv[:, h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv[:, C + h * d:C + (h + 1) * d].astype(jnp.float32)
        v = qkv[:, 2 * C + h * d:2 * C + (h + 1) * d]
        dots = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
        outs.append(jnp.dot(probs, v, preferred_element_type=jnp.float32
                            ).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _seq_attn_pallas(qkv, scale: float, heads: int, interpret: bool = False):
    B, S, c3 = qkv.shape
    C = c3 // 3
    kern = functools.partial(_seq_attn_kernel, heads=heads, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, S, c3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * S * S * (C // heads),
            bytes_accessed=B * S * (c3 + C) * qkv.dtype.itemsize,
            transcendentals=B * heads * S * S),
        interpret=interpret,
    )(qkv)


def _seq_attn_reference(qkv, scale: float, heads: int):
    """Math-identical plain-XLA path (CPU fallback + backward recompute):
    the historical head-transpose einsum pipeline."""
    B, S, c3 = qkv.shape
    C = c3 // 3
    d = C // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):  # (B, S, C) -> (B, H, S, d)
        return t.reshape(B, S, heads, d).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(B, S, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def seq_attention(qkv, scale: float, heads: int):
    """qkv: (B, S, 3C) packed projection (channel layout [q | k | v],
    matching the torch in_proj weight layout); returns (B, S, C) in
    head-major channel order — exactly what out_proj expects.

    TPU runs the fused kernel; elsewhere (and under SIC_SEQ_ATTN=xla)
    the plain einsum pipeline.  The two are math-identical; both do f32
    logit accumulation and softmax.
    """
    if jax.devices()[0].platform != "tpu" or \
            os.environ.get("SIC_SEQ_ATTN", "pallas") != "pallas":
        return _seq_attn_reference(qkv, scale, heads)
    return _seq_attn_pallas(qkv, scale, heads)


def _fwd(qkv, scale, heads):
    return seq_attention(qkv, scale, heads), (qkv,)


def _bwd(scale, heads, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda a: _seq_attn_reference(a, scale, heads), qkv)
    return vjp(g)


seq_attention.defvjp(_fwd, _bwd)
