"""On-device rANS plane decoder (Pallas TPU kernel).

Decodes one four-part-prior symbol plane for many independent rANS
substreams entirely on the TPU, so the autoregressive 4-step detail decode
(sic_tpu.models.bottleneck) runs with ZERO host round trips: the host just
enqueues prior-CNN -> decode-kernel -> reconstruction dispatches and blocks
once at the end.  On a tunnel-attached chip this removes ~4x30 ms of serial
RTT per batch; on locally-attached chips it removes the host entirely from
the decode path.

Bit-level semantics are an exact port of the native decoder
(``sic_tpu/cpp/sic_rans.cc:146-229``, itself wire-compatible with the
reference coder, reference: src/cpp/rans/rans.cpp:101-187):

- 16-bit probability precision, byte-at-a-time renormalisation, L = 2^23;
- per-symbol CDF row selected by an int index; index < 0 emits 0 and leaves
  the stream untouched (skipped zero-scale positions);
- out-of-range symbols escape to 2-bit bypass chunks (count in saturating
  2-bit steps, then chunks LSB-first), exactly as the C++;
- decoder state (x, byte position) persists across planes — the kernel
  threads it through as an explicit (S, 2) array.

TPU mapping: rANS is inherently serial per stream, so parallelism comes
from B images x ``stream_part`` substreams.  Each kernel program decodes
**8 substreams in lockstep** — one per sublane — with every per-stream
scalar held as an (8, 1) vector; data-dependent branches (skip, escape,
refill) are per-lane ``where`` masks and stream-byte reads are masked
reductions over the VMEM-resident word buffer.

The walk is two-phase so the serial loop issues only cheap VPU work
(benchmarks/rans_kernel_ablation.py measured the original per-step one-hot
MXU matmuls at ~20 us/position — the entire kernel cost):

1. per 128-position chunk, ONE batched one-hot matmul gathers every
   position's CDF row, row length and symbol offset into a
   (128, 8, 128)-int32 VMEM scratch (position-major, one packed 128-lane
   row per position/lane: CDF values < 2^16 split into bf16-exact byte
   halves, length at lane ``_SIZE_COL``, biased offset at ``_OFF_COL``);
2. the serial fori_loop dynamic-indexes the scratch by position — no
   matmuls, no O(ncdf) masked gathers inside the loop.

All arithmetic is uint32/int32 — the result is exact.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PROB_BITS = 16
_RANS_L = 1 << 23
_MASK16 = (1 << _PROB_BITS) - 1
_BYPASS_BITS = 2
_BYPASS_MAX = (1 << _BYPASS_BITS) - 1
_LANES = 8    # substreams decoded in lockstep per kernel program
_CHUNK = 128  # positions walked per statically-addressed plane chunk
_SIZE_COL = 126  # packed-row lane holding the CDF row length (0 = skip)
_OFF_COL = 127   # packed-row lane holding the +32768-biased symbol offset


# -- host-side stream framing -------------------------------------------------

def split_substreams(stream: bytes) -> List[bytes]:
    """Parse the multi-substream container into per-part byte strings
    (format: sic_rans.cc:370-413 / reference py_rans.cpp:91-136)."""
    if len(stream) < 1:
        raise ValueError("empty rANS stream")
    flag = stream[0]
    nstreams = (flag >> 4) + 1
    per_header = 2 if (flag & 0x0F) == 1 else 4
    off = 1
    sizes = []
    total = 0
    if off + (nstreams - 1) * per_header > len(stream):
        raise ValueError("truncated rANS substream header")
    for _ in range(nstreams - 1):
        sz = int.from_bytes(stream[off:off + per_header], "little")
        off += per_header
        sizes.append(sz)
        total += sz
    if off + total > len(stream):
        raise ValueError("inconsistent rANS substream sizes")
    sizes.append(len(stream) - off - total)
    parts = []
    for sz in sizes:
        parts.append(stream[off:off + sz])
        off += sz
    return parts


def pack_substreams(parts: Sequence[bytes], word_bucket: int = 512):
    """Pad part byte strings into one uint32-word matrix + lengths + initial
    decoder states, row count padded to the kernel's 8-lane grouping.

    Returns ``(words (S, Wmax) uint32, lengths (S, 1) int32, state (S, 2)
    uint32)`` where ``state[:, 0]`` is the rANS state seeded from the first
    4 little-endian bytes (sic_rans.cc:148-161) and ``state[:, 1]`` the next
    byte position (4).  ``Wmax`` is rounded up to the next power of two at
    least ``word_bucket``: real per-image streams vary by a few hundred
    bytes, and every distinct Wmax is a separate kernel compile (~seconds
    over a remote-compile tunnel), so coarse geometric bucketing — not
    linear steps — keeps the compiled-shape set tiny.
    """
    S = -(-len(parts) // _LANES) * _LANES
    max_len = max((len(p) for p in parts), default=4)
    nwords = max(1, -(-max_len // 4))
    bucket = max(1, word_bucket)
    while bucket < nwords:
        bucket *= 2
    nwords = bucket
    words = np.zeros((S, nwords), dtype=np.uint32)
    lengths = np.zeros((S, 1), dtype=np.int32)
    state = np.zeros((S, 2), dtype=np.uint32)
    for i, p in enumerate(parts):
        if len(p) < 4:
            # match the native decoder's rejection of truncated substreams
            # (sic_dec_set_stream raises via PartDecoder::set_stream) so
            # untrusted uploads fail loudly on both decode paths
            raise ValueError(
                f"substream {i} is {len(p)} bytes; rANS needs >= 4")
        buf = np.frombuffer(p, dtype=np.uint8)
        padded = np.zeros(nwords * 4, dtype=np.uint8)
        padded[:buf.size] = buf
        words[i] = padded.view("<u4")
        lengths[i, 0] = len(p)
        state[i, 0] = int.from_bytes(p[:4], "little")
        state[i, 1] = 4
    return words, lengths, state


# -- kernel -------------------------------------------------------------------

def packed_gather_table(cdf_i32, offs, sizes):
    """Packed gather table for the chunk-level one-hot matmul — shared by
    the decode kernel and its encode mirror (ops/rans_encode.py), so the
    row layout can never drift between them.

    TPU matmuls truncate f32 inputs to bf16 passes, which cannot represent
    16-bit values, so every table entry is split into two byte halves —
    both bf16-exact — and recombined after the matmul.  Output lane layout
    per CDF row: lanes [0, width) the quantized CDF, ``_SIZE_COL`` the row
    length (low half only, length <= width < 256), ``_OFF_COL`` the symbol
    offset biased by +32768 into 0..65535.  A position whose index is < 0
    (or out of range) matches no one-hot row and gathers all-zero — length
    0 — which IS the skip marker."""
    ncdf, width = cdf_i32.shape
    col128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    pad = jnp.zeros((ncdf, 128 - width), jnp.int32)
    tbl_hi = jnp.concatenate([cdf_i32 >> 8, pad], axis=1)
    tbl_lo = jnp.concatenate([cdf_i32 & 0xFF, pad], axis=1)
    offs_b = offs.reshape(ncdf, 1) + 32768             # 0..65535
    sizes_col = sizes.reshape(ncdf, 1)
    tbl_hi = jnp.where(col128 == _OFF_COL, offs_b >> 8, tbl_hi)
    tbl_lo = jnp.where(col128 == _OFF_COL, offs_b & 0xFF, tbl_lo)
    tbl_lo = jnp.where(col128 == _SIZE_COL, sizes_col, tbl_lo)
    return jnp.concatenate([tbl_hi, tbl_lo], axis=1).astype(jnp.float32)


def _decode_kernel(idx_cm_ref, words_ref, len_ref, state_in_ref, cdf_ref,
                   sizes_ref, offs_ref, sym_ref, state_out_ref, rows_ref):
    npos = sym_ref.shape[1]
    nwords = words_ref.shape[1]
    ncdf, width = cdf_ref.shape

    # Mosaic has no unsigned reductions: hold the words as int32 bits and
    # bitcast the selected word back to uint32.
    words_i32 = jax.lax.bitcast_convert_type(words_ref[:, :], jnp.int32)
    tbl = packed_gather_table(cdf_ref[:, :], offs_ref[0, :], sizes_ref[0, :])
    lengths = len_ref[:, :]                            # (8, 1) int32

    word_ids = jax.lax.broadcasted_iota(jnp.int32, (1, nwords), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)  # width <= 126
    cdf_ids_f = jax.lax.broadcasted_iota(
        jnp.int32, (_CHUNK * _LANES, ncdf), 1)
    zero8 = jnp.zeros((_LANES, 1), jnp.uint32)

    def sel(mask, values):
        """Per-lane masked reduce: (8, N) mask x (8|1, N) values -> (8, 1)."""
        return jnp.sum(jnp.where(mask, values, jnp.zeros_like(values)),
                       axis=1, keepdims=True)

    def read_byte(pos):
        """Stream byte at per-lane ``pos`` (8, 1) -> (8, 1) uint32."""
        word_bits = sel(word_ids == (pos >> 2).astype(jnp.int32), words_i32)
        word = jax.lax.bitcast_convert_type(word_bits, jnp.uint32)
        shift = jnp.uint32(8) * (pos & 3)
        return (word >> shift) & jnp.uint32(0xFF)

    def refill_once(x, pos):
        need = jnp.logical_and(x < _RANS_L, pos < lengths.astype(jnp.uint32))
        b = read_byte(pos)
        x = jnp.where(need, (x << 8) | b, x)
        pos = jnp.where(need, pos + 1, pos)
        return x, pos

    def advance(x, pos, start, freq):
        """Consume (start, freq); refill while x < L (sic_rans.cc:208-216).
        While bytes remain the rANS invariant keeps x >= L, so post-advance
        x >= (x >> 16) >= 2^7 and two byte refills always reach 2^23; once
        the stream is exhausted refills are no-ops in the C++ too."""
        x = freq * (x >> _PROB_BITS) + (x & _MASK16) - start
        for _ in range(2):
            x, pos = refill_once(x, pos)
        return x, pos

    def raw2(x, pos):
        """2 raw bits + at most ONE refill (sic_rans.cc:219-227 exactly)."""
        val = x & jnp.uint32(_BYPASS_MAX)
        x, pos = refill_once(x >> _BYPASS_BITS, pos)
        return val, x, pos

    def make_body(lane_ids):
      def body(j, carry):
        x, pos, out_chunk = carry
        at_j = lane_ids == j                           # (1, 128)
        # the packed row for position j: CDF values in lanes [0, width),
        # row length at _SIZE_COL, biased offset at _OFF_COL — ONE dynamic
        # leading-dim load; no matmul, no O(ncdf) gather in the hot loop
        row = rows_ref[j]                              # (8, 128)
        size = row[:, _SIZE_COL:_SIZE_COL + 1]
        offset = row[:, _OFF_COL:_OFF_COL + 1] - 32768
        skip = size == 0
        max_value = size - 2

        cum = (x & _MASK16).astype(jnp.int32)          # (8, 1)
        # s = #{k in [1, size-1] : cdf[k] <= cum}  (linear scan at
        # sic_rans.cc:177-179, vectorized per lane; the size/offset tail
        # lanes are excluded because size - 1 <= width - 1 < _SIZE_COL)
        in_range = jnp.logical_and(col_ids >= 1, col_ids <= size - 1)
        s = jnp.sum(jnp.logical_and(in_range, row <= cum).astype(jnp.int32),
                    axis=1, keepdims=True)             # (8, 1)

        start = sel(col_ids == s, row).astype(jnp.uint32)
        nxt = sel(col_ids == s + 1, row).astype(jnp.uint32)
        x1, pos1 = advance(x, pos, start, nxt - start)

        # escape path (sic_rans.cc:185-201), per-lane masked.  Escapes are
        # rare, so the whole block sits behind a scalar lax.cond; inside,
        # fixed-bound masked loops replace the C++ while loops (Mosaic has
        # no vector-carry while).  Valid encoder output needs <= 3 count
        # reads (|symbol| <= 30000 -> n_bypass <= 8) and <= 8 chunk reads;
        # the 6/16 bounds also keep malformed streams terminating.
        is_escape = jnp.logical_and(s == max_value, jnp.logical_not(skip))

        def esc_branch(args):
            x, pos = args
            go = is_escape
            n_bypass = zero8
            for _ in range(6):
                val, x2, pos2 = raw2(x, pos)
                n_bypass = jnp.where(go, n_bypass + val, n_bypass)
                x = jnp.where(go, x2, x)
                pos = jnp.where(go, pos2, pos)
                go = jnp.logical_and(go, val == jnp.uint32(_BYPASS_MAX))
            raw_val = zero8
            for j2 in range(16):
                go = jnp.uint32(j2) < n_bypass
                val, x2, pos2 = raw2(x, pos)
                raw_val = jnp.where(
                    go, raw_val | (val << (_BYPASS_BITS * j2)), raw_val)
                x = jnp.where(go, x2, x)
                pos = jnp.where(go, pos2, pos)
            half = (raw_val >> 1).astype(jnp.int32)
            esc_value = jnp.where((raw_val & 1).astype(jnp.int32) == 1,
                                  -half - 1, half + max_value)
            return esc_value, x, pos

        def no_escape(args):
            x, pos = args
            return jnp.zeros((_LANES, 1), jnp.int32), x, pos

        esc_value, x3, pos3 = jax.lax.cond(
            jnp.any(is_escape), esc_branch, no_escape, (x1, pos1))
        value = jnp.where(is_escape, esc_value, s) + offset
        value = jnp.where(skip, 0, value)              # (8, 1)

        x_new = jnp.where(skip, x, x3)
        pos_new = jnp.where(skip, pos, pos3)
        out_chunk = jnp.where(jnp.broadcast_to(at_j, out_chunk.shape),
                              jnp.broadcast_to(value, out_chunk.shape),
                              out_chunk)
        return x_new, pos_new, out_chunk
      return body

    # Walk the plane in static 128-position chunks.  Per chunk: one
    # position-major one-hot matmul gathers every position's packed row
    # into the VMEM scratch, then the serial loop runs on scratch loads
    # plus (8, 1)/(8, 128) vector ops only.
    x = state_in_ref[:, 0:1]
    pos = state_in_ref[:, 1:2]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _CHUNK), 1)
    dims = (((1,), (0,)), ((), ()))
    for c in range(npos // _CHUNK):
        # chunk c's indexes, position-major, as ONE static lane-column
        # slice — Mosaic cannot shape-cast (8, 128) -> (1024, 1), so the
        # host hands the plane pre-laid-out as (CHUNK*LANES, nchunks)
        idx_t = idx_cm_ref[:, c:c + 1]                     # (1024, 1)
        onehot = (cdf_ids_f == idx_t).astype(jnp.float32)  # idx<0: zero row
        big = jax.lax.dot_general(onehot, tbl, dims,
                                  preferred_element_type=jnp.float32)
        comb = ((big[:, :128].astype(jnp.int32) << 8)
                | big[:, 128:].astype(jnp.int32))
        rows_ref[:, :, :] = comb.reshape(_CHUNK, _LANES, 128)
        out0 = jnp.zeros((_LANES, _CHUNK), jnp.int32)
        x, pos, out_chunk = jax.lax.fori_loop(
            0, _CHUNK, make_body(lane_ids), (x, pos, out0))
        sym_ref[:, c * _CHUNK:(c + 1) * _CHUNK] = out_chunk
    state_out_ref[:, :] = jnp.concatenate([x, pos], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rans_decode_plane(idx, words, lengths, state, cdf, sizes, offsets,
                      interpret: bool = False):
    """Decode one symbol plane for S independent substreams on device.

    Args:
      idx:     (S, npos) int32 CDF-row indexes (< 0 = skipped position).
      words:   (S, nwords) uint32 packed little-endian stream bytes.
      lengths: (S, 1) int32 byte length of each substream.
      state:   (S, 2) uint32 decoder state (x, byte position).
      cdf:     (ncdf, width) int32 quantized CDF rows.
      sizes:   (ncdf,) int32 per-row CDF lengths.
      offsets: (ncdf,) int32 per-row symbol offsets.

    ``S`` must be a multiple of 8 (``pack_substreams`` pads; pad ``idx``
    rows with -1).  Returns ``(symbols (S, npos) int32, new_state (S, 2)
    uint32)``.
    """
    S, npos_in = idx.shape
    assert S % _LANES == 0, f"S={S} must be a multiple of {_LANES}"
    assert cdf.shape[1] <= _SIZE_COL, (
        f"CDF width {cdf.shape[1]} exceeds the packed-row layout "
        f"({_SIZE_COL} value lanes); use the host decoder")
    # pad the plane to the kernel's 128-position chunking with skipped
    # (idx = -1) columns; they consume no stream bytes
    npos = -(-npos_in // _CHUNK) * _CHUNK
    if npos != npos_in:
        idx = jnp.pad(idx, ((0, 0), (0, npos - npos_in)),
                      constant_values=-1)
    ncdf, width = cdf.shape
    out, new_state = _decode_call(idx, words, lengths, state, cdf, sizes,
                                  offsets, interpret)
    return out[:, :npos_in], new_state


def chunk_colmajor(x):
    """(S, npos) plane -> (S//8 * CHUNK*LANES, nchunks) position-major
    chunk columns: ``M[g*1024 + p*8 + l, c] = x[g*8 + l, c*128 + p]``.
    Laid out on host/XLA because Mosaic cannot transpose in-kernel; the
    kernel then reads chunk ``c`` as one static lane-column slice."""
    S, npos = x.shape
    G, nchunks = S // _LANES, npos // _CHUNK
    x4 = x.reshape(G, _LANES, nchunks, _CHUNK).transpose(0, 3, 1, 2)
    return x4.reshape(G * _CHUNK * _LANES, nchunks)


def _decode_call(idx, words, lengths, state, cdf, sizes, offsets, interpret):
    S, npos = idx.shape
    ncdf, width = cdf.shape
    nchunks = npos // _CHUNK
    return pl.pallas_call(
        _decode_kernel,
        grid=(S // _LANES,),
        in_specs=[
            pl.BlockSpec((_CHUNK * _LANES, nchunks), lambda i: (i, 0)),
            pl.BlockSpec((_LANES, words.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((_LANES, 1), lambda i: (i, 0)),
            pl.BlockSpec((_LANES, 2), lambda i: (i, 0)),
            pl.BlockSpec((ncdf, width), lambda i: (0, 0)),
            pl.BlockSpec((1, ncdf), lambda i: (0, 0)),
            pl.BlockSpec((1, ncdf), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_LANES, npos), lambda i: (i, 0)),
            pl.BlockSpec((_LANES, 2), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, npos), jnp.int32),
            jax.ShapeDtypeStruct((S, 2), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((_CHUNK, _LANES, 128), jnp.int32)],
        interpret=interpret,
    )(chunk_colmajor(idx.astype(jnp.int32)), words,
      lengths.astype(jnp.int32), state,
      cdf.astype(jnp.int32), sizes.reshape(1, -1).astype(jnp.int32),
      offsets.reshape(1, -1).astype(jnp.int32))
