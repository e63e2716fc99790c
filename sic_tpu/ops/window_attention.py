"""Fused window attention (Pallas TPU kernel).

The Swin detail branch runs ~20+ window-attention layers per image at full
feature resolution (SURVEY.md §3 hot loops); this kernel keeps one window's
q/k/v, logits and probabilities resident in VMEM — one HBM round trip per
window instead of one per intermediate.

Shapes: windows are folded into the grid axis; each program handles one
(batch, head, window) triple with a (s, d) tile, s = window_size**2 (256 for
the shipped window 16), d = head_dim (64).  The additive bias tensor folds
the position bias and any shift mask, selected per window by the index map.

Backward passes recompute with plain einsums under XLA (custom_vjp) — the
kernel accelerates the forward/inference path without hand-written grads.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)              # (s, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    bias = bias_ref[0]                            # (s, s) f32
    dots = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32) + bias
    probs = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


def _forward_reference(q, k, v, bias, scale):
    """Plain-XLA equivalent (used for backward + as CPU fallback)."""
    G, s, d = q.shape
    nW = bias.shape[0]
    b32 = bias.reshape(1, nW, s, s)
    dots = jnp.einsum("gid,gjd->gij", q.astype(jnp.float32) * scale,
                      k.astype(jnp.float32))
    dots = (dots.reshape(G // nW, nW, s, s) + b32).reshape(G, s, s)
    probs = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
    return jnp.einsum("gij,gjd->gid", probs, v)


def _pallas_forward(q, k, v, bias, scale: float, interpret: bool = False):
    G, s, d = q.shape
    nW = bias.shape[0]
    kern = functools.partial(_attention_kernel, scale=scale)
    tile = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, s, d), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), lambda i: (i % nW, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, d), tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * s * s * d,
            bytes_accessed=G * (3 * s * d + s * d) * q.dtype.itemsize
            + nW * s * s * 4,
            transcendentals=G * s * s),
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention(q, k, v, bias, scale: float):
    """q, k, v: (G, s, d) with G a multiple of bias.shape[0];
    bias: (nW, s, s) additive logits bias (position bias + shift mask),
    indexed by ``g % nW``.  Returns (G, s, d).

    Implementation selection: the Pallas kernel is the TPU default.  An
    earlier standalone timing (G=512 single-op: 31.6 ms XLA vs 37.5 ms
    Pallas) picked XLA, but standalone op timings through the dev tunnel
    carry ~30-45 ms of fixed per-call overhead (input upload + RTT) that
    swamps the kernels; MARGINAL cost inside a jitted multi-block stack
    — timing 1-block vs 4-block stacks and subtracting — shows the
    kernel ahead at the shipped swin geometry (9.5 vs 11.9 ms/block,
    B=32 feat grid 32x32x768, one v5e).  Set SIC_WINDOW_ATTN=xla to
    force the einsum path (bench cross-checks both every run)."""
    if jax.devices()[0].platform != "tpu":
        return _forward_reference(q, k, v, bias, scale)
    if os.environ.get("SIC_WINDOW_ATTN", "pallas") == "pallas":
        return _pallas_forward(q, k, v, bias, scale)
    return _forward_reference(q, k, v, bias, scale)


def _fwd(q, k, v, bias, scale):
    return window_attention(q, k, v, bias, scale), (q, k, v, bias)


def _bwd(scale, res, g):
    q, k, v, bias = res
    # recompute probabilities with plain einsums; standard attention VJP
    G, s, d = q.shape
    nW = bias.shape[0]
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    dots = jnp.einsum("gid,gjd->gij", q32 * scale, k32)
    dots = (dots.reshape(G // nW, nW, s, s)
            + bias.reshape(1, nW, s, s)).reshape(G, s, s)
    probs = jax.nn.softmax(dots, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("gij,gid->gjd", probs, g32)
    dprobs = jnp.einsum("gid,gjd->gij", g32, v32)
    ddots = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("gij,gjd->gid", ddots, k32) * scale
    dk = jnp.einsum("gij,gid->gjd", ddots, q32 * scale)
    dbias = jnp.sum(ddots.reshape(G // nW, nW, s, s), axis=0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype))


window_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# NHWC-native fused window attention
#
# The (G, s, d) entry point above still needs the caller to materialize six
# full-tensor relayouts per layer (qkv split + head/window transposes in,
# the inverse coming out) — ~150 MB each at the shipped swin geometry,
# all pure HBM traffic.  This variant takes the packed qkv projection in
# its native (B, H, W, 3C) layout: the window partition IS the Pallas
# block decomposition (one program per (batch, window-row, window-col)),
# the head split is static lane slicing inside VMEM, and the output
# comes back in (B, H, W, C) ready for the out-projection.  No relayout
# touches HBM at all.
# ---------------------------------------------------------------------------


def _nhwc_kernel(qkv_ref, bias_ref, o_ref, *, heads, scale):
    ws = qkv_ref.shape[1]
    c3 = qkv_ref.shape[3]
    C = c3 // 3
    d = C // heads
    s = ws * ws
    qkv = qkv_ref[0].reshape(s, c3)               # lane dim unchanged
    bias = bias_ref[0]                            # (s, s) f32
    outs = []
    for h in range(heads):
        q = qkv[:, h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv[:, C + h * d:C + (h + 1) * d].astype(jnp.float32)
        v = qkv[:, 2 * C + h * d:2 * C + (h + 1) * d]
        dots = jnp.dot(q * scale, k.T,
                       preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
        o = jnp.dot(probs, v, preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1).reshape(ws, ws, C)


def _nhwc_pallas(qkv, bias, scale: float, heads: int,
                 interpret: bool = False):
    B, H, W, c3 = qkv.shape
    C = c3 // 3
    s = bias.shape[-1]
    ws = int(round(s ** 0.5))
    nwh, nww = H // ws, W // ws
    nB = bias.shape[0]                 # 1 (plain) or nwh*nww (shifted)
    kern = functools.partial(_nhwc_kernel, heads=heads, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B, nwh, nww),
        in_specs=[
            pl.BlockSpec((1, ws, ws, c3), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s),
                         lambda b, i, j, nww=nww, nB=nB:
                         ((i * nww + j) % nB, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, ws, C), lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nwh * nww * heads * s * s * (C // heads),
            bytes_accessed=B * H * W * (c3 + C) * qkv.dtype.itemsize
            + nwh * nww * s * s * 4,
            transcendentals=B * nwh * nww * heads * s * s),
        interpret=interpret,
    )(qkv, bias)


def _nhwc_reference(qkv, bias, scale: float, heads: int):
    """Math-identical plain-XLA path (CPU fallback + backward recompute):
    the historical transpose pipeline around :func:`_forward_reference`."""
    B, H, W, c3 = qkv.shape
    C = c3 // 3
    d = C // heads
    s = bias.shape[-1]
    ws = int(round(s ** 0.5))
    nwh, nww = H // ws, W // ws
    nW = nwh * nww
    t = qkv.reshape(B, nwh, ws, nww, ws, 3, heads, d)
    t = t.transpose(5, 0, 6, 1, 3, 2, 4, 7)
    t = t.reshape(3, B * heads * nW, s, d)
    out = _forward_reference(t[0], t[1], t[2],
                             jnp.broadcast_to(bias, (nW, s, s))
                             if bias.shape[0] != nW else bias, scale)
    out = out.reshape(B, heads, nwh, nww, ws, ws, d)
    return out.transpose(0, 2, 4, 3, 5, 1, 6).reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def window_attention_nhwc(qkv, bias, scale: float, heads: int):
    """qkv: (B, H, W, 3C) packed projection (channel layout
    [q heads*d | k heads*d | v heads*d], matching the torch qkv Dense);
    bias: (nW, s, s) additive logits bias, window-major row order.
    Returns (B, H, W, C) in head-major channel layout.

    TPU runs the fused NHWC kernel (no HBM relayouts); elsewhere the
    plain einsum pipeline.  SIC_WINDOW_ATTN=xla forces the einsum path.
    """
    if jax.devices()[0].platform != "tpu" or \
            os.environ.get("SIC_WINDOW_ATTN", "pallas") != "pallas":
        return _nhwc_reference(qkv, bias, scale, heads)
    return _nhwc_pallas(qkv, bias, scale, heads)


def _nhwc_bwd_kernel(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref, *,
                     heads, scale, nB):
    """Recompute-attention VJP for one window, all heads.

    Grid order is (nwh, nww, B): every program mapping to a given dbias
    block forms one contiguous run, so the f32 accumulator lives in VMEM
    across the run and is flushed to HBM exactly once.
    """
    ws = qkv_ref.shape[1]
    c3 = qkv_ref.shape[3]
    C = c3 // 3
    d = C // heads
    s = ws * ws
    qkv = qkv_ref[0].reshape(s, c3)
    bias = bias_ref[0]                               # (s, s) f32
    g = g_ref[0].reshape(s, C).astype(jnp.float32)
    dqs, dks, dvs = [], [], []
    db = jnp.zeros((s, s), jnp.float32)
    for h in range(heads):
        q = qkv[:, h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv[:, C + h * d:C + (h + 1) * d].astype(jnp.float32)
        v = qkv[:, 2 * C + h * d:2 * C + (h + 1) * d].astype(jnp.float32)
        gh = g[:, h * d:(h + 1) * d]
        dots = jnp.dot(q * scale, k.T,
                       preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(dots, axis=-1)
        dv = jnp.dot(probs.T, gh, preferred_element_type=jnp.float32)
        dprobs = jnp.dot(gh, v.T, preferred_element_type=jnp.float32)
        ddots = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                          keepdims=True))
        dq = jnp.dot(ddots, k, preferred_element_type=jnp.float32) * scale
        dk = jnp.dot(ddots.T, q, preferred_element_type=jnp.float32) * scale
        db = db + ddots
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)
    dqkv_ref[0] = dqkv.reshape(ws, ws, c3).astype(dqkv_ref.dtype)

    i, j, b = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    if nB == 1:
        first = (i == 0) & (j == 0) & (b == 0)
    else:
        first = b == 0

    @pl.when(first)
    def _init():
        dbias_ref[0] = db

    @pl.when(jnp.logical_not(first))
    def _acc():
        dbias_ref[0] += db


def _nhwc_bwd_pallas(qkv, bias, g, scale: float, heads: int,
                     interpret: bool = False):
    B, H, W, c3 = qkv.shape
    C = c3 // 3
    s = bias.shape[-1]
    ws = int(round(s ** 0.5))
    nwh, nww = H // ws, W // ws
    nB = bias.shape[0]
    if nB not in (1, nwh * nww):
        # a partially-shared bias would revisit dbias blocks
        # non-contiguously, breaking the in-VMEM accumulation run
        raise ValueError(f"bias rows must be 1 or {nwh * nww}, got {nB}")
    kern = functools.partial(_nhwc_bwd_kernel, heads=heads, scale=scale,
                             nB=nB)
    bias_map = lambda i, j, b, nww=nww, nB=nB: ((i * nww + j) % nB, 0, 0)
    blk = lambda i, j, b: (b, i, j, 0)
    return pl.pallas_call(
        kern,
        grid=(nwh, nww, B),
        in_specs=[
            pl.BlockSpec((1, ws, ws, c3), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), bias_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, ws, C), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ws, ws, c3), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), bias_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, c3), qkv.dtype),
            jax.ShapeDtypeStruct((nB, s, s), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=11 * B * nwh * nww * heads * s * s * (C // heads),
            bytes_accessed=B * H * W * (2 * c3 + C) * qkv.dtype.itemsize
            + 2 * nB * s * s * 4,
            transcendentals=B * nwh * nww * heads * s * s),
        interpret=interpret,
    )(qkv, bias, g)


def _nhwc_fwd(qkv, bias, scale, heads):
    return window_attention_nhwc(qkv, bias, scale, heads), (qkv, bias)


def _nhwc_bwd(scale, heads, res, g):
    qkv, bias = res
    if jax.devices()[0].platform == "tpu" and \
            os.environ.get("SIC_WINDOW_ATTN", "pallas") == "pallas":
        dqkv, dbias = _nhwc_bwd_pallas(qkv, bias, g, scale, heads)
        return dqkv, dbias.astype(bias.dtype)
    _, vjp = jax.vjp(lambda a, b: _nhwc_reference(a, b, scale, heads),
                     qkv, bias)
    return vjp(g)


window_attention_nhwc.defvjp(_nhwc_fwd, _nhwc_bwd)
