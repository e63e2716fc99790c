"""On-device rANS plane encoder (Pallas TPU kernel).

Encodes four-part-prior symbol planes for many independent rANS substreams
entirely on the TPU — the mirror of ``rans_decode.py``.  The symbols and
CDF indexes produced by the device encode chain never cross the host
boundary: only the finished entropy-coded words (~8x smaller than the
int16 symbol planes) are fetched.  On a tunnel-attached chip this removes
the packed-plane fetch AND the host coding from the single-image encode
path; on locally-attached chips it removes the host from the encode path
entirely.

Bit-level semantics are an exact port of the native encoder
(``sic_tpu/cpp/sic_rans.cc:40-135``, wire-compatible with the reference
coder, reference: src/cpp/rans/rans.cpp:29-99):

- rANS encoding is last-in-first-out: the C++ buffers Sym{start, range}
  entries across all ``encode_with_indexes`` calls and ``flush`` walks
  them in reverse, emitting renormalisation bytes.  The kernel therefore
  walks PRE-REVERSED position rows, planes passed last-to-first, with the
  (state, byte cursor, word buffer) threaded through the per-plane calls;
- per symbol: renormalise while ``x >= freq << 15`` (byte emission), then
  ``x = (x / freq) << 16 | (x % freq) + start`` (sic_rans.cc:40-50);
- out-of-range symbols escape to 2-bit bypass chunks: in reverse order the
  chunks come first (high chunk first), then the saturating count entries
  (remainder first), then the ``max_value`` slot symbol (sic_rans.cc:92-108
  reversed);
- the finished stream is ``LE32(final x) + emitted bytes reversed``
  (sic_rans.cc:111-133); the cheap byte reversal happens on host.

TPU mapping: identical to the decoder — 8 substreams in lockstep per
program, one scalar per sublane, masked (8, nwords) OR-writes for byte
emission.  Unlike decode, EVERYTHING the encoder needs per position —
(start, freq) from the CDF row, the escape flag, the bypass value and its
chunk count — depends only on the symbols and indexes, never on the rANS
state, so it is all precomputed per 128-position chunk with one batched
one-hot MXU matmul + vector ops into a (128, 8, 128)-int32 VMEM scratch
(benchmarks/rans_kernel_ablation.py measured in-loop one-hot matmuls at
~20 us/position — the entire kernel cost).  The serial loop is only
renormalisation byte emission plus the one operation rANS encode needs
that decode does not: an exact 31-bit / 16-bit integer division; at the
division point renormalisation guarantees ``x < freq * 2**15`` so the
quotient fits 15 bits, and a float32 reciprocal estimate corrected by
exact uint32 multiply-compare steps (at most 2 each way) reproduces the
integer division exactly.

Escape entries are bounded by 8 bypass chunks (16 bits): the encode chain
clamps symbols to +-30000 at the host boundary (models/bottleneck.py) and
table offsets are tiny, so ``raw_val`` < 2^16 always; if a wider value
ever appears the kernel raises the overflow flag and the caller falls
back to the host coder, exactly like a buffer overflow.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PROB_BITS = 16
_RANS_L = 1 << 23
_BYPASS_BITS = 2
_BYPASS_MAX = (1 << _BYPASS_BITS) - 1
_LANES = 8    # substreams encoded in lockstep per kernel program
_CHUNK = 128  # positions walked per statically-addressed plane chunk
_MAX_CHUNKS = 8    # bypass chunks: raw_val < 2^16 (see module docstring)
_MAX_COUNT = 2     # saturating count entries: n_bypass <= 8 -> nsat <= 2
# packed-row layout constants and the table builder are SHARED with the
# decode kernel — one definition, no encoder/decoder drift possible
from .rans_decode import _OFF_COL, _SIZE_COL, packed_gather_table  # noqa: E402


def _encode_kernel(sym_cm_ref, idx_cm_ref, cdf_ref, sizes_ref, offs_ref,
                   words_in_ref, meta_in_ref,
                   words_ref, meta_ref, sc_ref):
    """Encode one (pre-reversed) plane for 8 lockstep substreams.

    ``sym_cm``/``idx_cm`` arrive in the position-major chunk-column layout
    of ``rans_decode.chunk_colmajor`` (Mosaic cannot transpose in-kernel).
    meta rows are (8, 4) uint32: [x, byte cursor, overflow flag, 0].
    """
    npos = idx_cm_ref.shape[1] * _CHUNK
    nwords = words_in_ref.shape[1]
    ncdf = cdf_ref.shape[0]
    cap = jnp.uint32(nwords * 4)

    # Packed gather table, shared with the decoder so the row layout can
    # never drift between the two kernels (rans_decode.packed_gather_table).
    col128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    tbl = packed_gather_table(cdf_ref[:, :], offs_ref[0, :], sizes_ref[0, :])

    word_ids = jax.lax.broadcasted_iota(jnp.int32, (1, nwords), 1)
    cdf_ids_f = jax.lax.broadcasted_iota(
        jnp.int32, (_CHUNK * _LANES, ncdf), 1)

    def emit_byte(words, pos, ov, byte, emit):
        """Append ``byte`` at per-lane cursor ``pos`` where ``emit``.

        ``ov`` is uint32 (0 = fine) rather than bool: Mosaic cannot
        legalize an i1 ``scf.for`` loop carry on real TPUs (observed:
        "failed to legalize operation 'scf.for'" on v5e with a
        vector<8x128xi1> block argument), so the overflow flag stays an
        integer through the whole loop."""
        ok = pos < cap
        bad = jnp.logical_and(emit, jnp.logical_not(ok))
        ov = jnp.where(bad, jnp.uint32(1), ov)
        do = jnp.logical_and(emit, ok)
        mask = jnp.logical_and(word_ids == (pos >> 2).astype(jnp.int32), do)
        shift = jnp.uint32(8) * (pos & 3)
        words = jnp.where(mask, words | (byte << shift), words)
        pos = jnp.where(do, pos + 1, pos)
        return words, pos, ov

    def put_symbol(x, words, pos, ov, start, freq, active):
        """sic_rans.cc:40-50 under a per-lane mask; exact division via
        f32 reciprocal + uint32 correction (quotient < 2**15)."""
        x_max = freq << 15
        for _ in range(2):   # renorm: x < 2**31 drains in <= 2 byte steps
            emit = jnp.logical_and(active, x >= x_max)
            words, pos, ov = emit_byte(words, pos, ov, x & jnp.uint32(0xFF),
                                       emit)
            x = jnp.where(emit, x >> 8, x)
        # select, not jnp.maximum: Mosaic has no arith.maxui on v5e
        freq_safe = jnp.where(freq == 0, jnp.uint32(1), freq)
        # Mosaic has no uint32<->float32 casts on real TPUs; both values
        # are < 2**31 here (renorm bounds x < freq * 2**15 <= 2**31,
        # freq <= 2**16, quotient < 2**15) so int32 round-trips exactly.
        xf = jax.lax.bitcast_convert_type(x, jnp.int32).astype(jnp.float32)
        ff = jax.lax.bitcast_convert_type(
            freq_safe, jnp.int32).astype(jnp.float32)
        q = jax.lax.bitcast_convert_type((xf / ff).astype(jnp.int32),
                                         jnp.uint32)
        for _ in range(2):   # q too high: uint32 x - q*freq wrapped huge
            over = (q * freq_safe) > x
            q = jnp.where(over, q - 1, q)
        r = x - q * freq_safe
        for _ in range(2):   # q too low
            under = r >= freq_safe
            q = jnp.where(under, q + 1, q)
            r = jnp.where(under, r - freq_safe, r)
        x_new = (q << _PROB_BITS) + r + start
        return jnp.where(active, x_new, x), words, pos, ov

    def put_raw2(x, words, pos, ov, val, active):
        """sic_rans.cc:52-61 with nbits=2: x_max = 2**29, one byte max."""
        emit = jnp.logical_and(active, x >= jnp.uint32(1 << 29))
        words, pos, ov = emit_byte(words, pos, ov, x & jnp.uint32(0xFF), emit)
        x = jnp.where(emit, x >> 8, x)
        x_new = (x << _BYPASS_BITS) | val
        return jnp.where(active, x_new, x), words, pos, ov

    def u32(v):
        """int32 -> uint32 bitcast (Mosaic has no unsigned casts; every
        packed value is < 2**31 so the bitcast is exact)."""
        return jax.lax.bitcast_convert_type(v, jnp.uint32)

    def body(j, carry):
        x, pos, words, ov = carry
        # the packed row for position j — ONE dynamic leading-dim load;
        # no matmul, no O(ncdf) gather in the hot loop
        row = sc_ref[j]                                # (8, 128) int32
        start = u32(row[:, 0:1])
        freq = u32(row[:, 1:2])
        esc = row[:, 2:3] != 0
        raw_val = u32(row[:, 3:4])
        n_bypass = row[:, 4:5]
        rem = u32(row[:, 5:6])
        nsat = row[:, 6:7]
        active = row[:, 7:8] != 0
        ov = jnp.where(row[:, 8:9] != 0, jnp.uint32(1), ov)   # wide escape

        # escape entries come FIRST in reverse order (sic_rans.cc:92-108
        # walked backwards): chunks high-to-low, then the remainder count
        # entry, then the saturating kBypassMax count entries.
        def esc_branch(args):
            x, pos, words, ov = args
            for j2 in range(_MAX_CHUNKS - 1, -1, -1):
                go = jnp.logical_and(esc, j2 < n_bypass)
                chunk = (raw_val >> jnp.uint32(_BYPASS_BITS * j2)) \
                    & jnp.uint32(_BYPASS_MAX)
                x, words, pos, ov = put_raw2(x, words, pos, ov, chunk, go)
            x, words, pos, ov = put_raw2(x, words, pos, ov, rem, esc)
            for t in range(_MAX_COUNT):
                go = jnp.logical_and(esc, t < nsat)
                x, words, pos, ov = put_raw2(x, words, pos, ov,
                                             jnp.uint32(_BYPASS_MAX), go)
            return x, pos, words, ov

        x, pos, words, ov = jax.lax.cond(
            jnp.any(esc), esc_branch, lambda a: a, (x, pos, words, ov))

        x, words, pos, ov = put_symbol(x, words, pos, ov, start, freq,
                                       active)
        return x, pos, words, ov

    x = meta_in_ref[:, 0:1]
    pos = meta_in_ref[:, 1:2]
    ov = meta_in_ref[:, 2:3]        # uint32 0/1 — see emit_byte
    words = words_in_ref[:, :]
    col128b = col128                # (1, 128), broadcasts over positions
    dims = (((1,), (0,)), ((), ()))
    chunk_ids = jax.lax.broadcasted_iota(
        jnp.uint32, (1, _MAX_CHUNKS), 1)
    for c in range(npos // _CHUNK):
        # Phase 1 — batched per-chunk precompute (position-major rows).
        # Everything state-independent: the one-hot MXU gather of each
        # position's CDF row, the slot/escape split, (start, freq), the
        # bypass chunk count and its remainder/saturation decomposition.
        sym_t = sym_cm_ref[:, c:c + 1]                     # (1024, 1)
        idx_t = idx_cm_ref[:, c:c + 1]
        onehot = (cdf_ids_f == idx_t).astype(jnp.float32)  # idx<0: zero row
        big = jax.lax.dot_general(onehot, tbl, dims,
                                  preferred_element_type=jnp.float32)
        comb = ((big[:, :128].astype(jnp.int32) << 8)
                | big[:, 128:].astype(jnp.int32))          # (N, 128)
        size = comb[:, _SIZE_COL:_SIZE_COL + 1]
        offset = comb[:, _OFF_COL:_OFF_COL + 1] - 32768
        active = size != 0                                 # (N, 1)
        max_value = size - 2
        value = sym_t - offset
        neg = value < 0
        over = jnp.logical_and(jnp.logical_not(neg), value >= max_value)
        raw_val = jnp.where(
            neg, -2 * value - 1,
            jnp.where(over, 2 * (value - max_value), 0))   # int32 >= 0
        esc = jnp.logical_and(active, jnp.logical_or(neg, over))
        slot = jnp.where(jnp.logical_or(neg, over), max_value, value)
        slot = jnp.where(active, slot, 0)
        in_slot = col128b == slot
        start = jnp.sum(jnp.where(in_slot, comb, 0), axis=1, keepdims=True)
        nxt = jnp.sum(jnp.where(col128b == slot + 1, comb, 0),
                      axis=1, keepdims=True)
        freq = (nxt - start) & 0xFFFF       # uint16 wrap as the C++
        start = start & 0xFFFF
        shifts = u32(raw_val) >> (jnp.uint32(_BYPASS_BITS) * chunk_ids)
        n_bypass = jnp.sum((shifts != 0).astype(jnp.int32), axis=1,
                           keepdims=True)                  # (N, 1)
        # n_bypass <= _MAX_CHUNKS so divmod by kBypassMax=3 is two compares
        nsat = (n_bypass >= _BYPASS_MAX).astype(jnp.int32) \
            + (n_bypass >= 2 * _BYPASS_MAX).astype(jnp.int32)
        rem = n_bypass - _BYPASS_MAX * nsat
        wide = jnp.logical_and(esc, raw_val >= (1 << (2 * _MAX_CHUNKS)))
        packed = jnp.where(col128b == 0, start, 0)
        packed = jnp.where(col128b == 1, freq, packed)
        packed = jnp.where(col128b == 2, esc.astype(jnp.int32), packed)
        packed = jnp.where(col128b == 3, raw_val, packed)
        packed = jnp.where(col128b == 4, n_bypass, packed)
        packed = jnp.where(col128b == 5, rem, packed)
        packed = jnp.where(col128b == 6, nsat, packed)
        packed = jnp.where(col128b == 7, active.astype(jnp.int32), packed)
        packed = jnp.where(col128b == 8, wide.astype(jnp.int32), packed)
        sc_ref[:, :, :] = packed.reshape(_CHUNK, _LANES, 128)
        # Phase 2 — the serial walk: scratch loads + (8, 1)/(8, nwords)
        # vector ops only.
        x, pos, words, ov = jax.lax.fori_loop(
            0, _CHUNK, body, (x, pos, words, ov))
    words_ref[:, :] = words
    meta_ref[:, :] = jnp.concatenate(
        [x, pos, ov, jnp.zeros((_LANES, 1), jnp.uint32)], axis=1)


def _encode_call(sym, idx, cdf, sizes, offsets, words, meta, interpret):
    from sic_tpu.ops.rans_decode import chunk_colmajor
    S, npos = sym.shape
    ncdf, width = cdf.shape
    nwords = words.shape[1]
    nchunks = npos // _CHUNK
    row = lambda i: (i, 0)
    return pl.pallas_call(
        _encode_kernel,
        grid=(S // _LANES,),
        in_specs=[
            pl.BlockSpec((_CHUNK * _LANES, nchunks), row),
            pl.BlockSpec((_CHUNK * _LANES, nchunks), row),
            pl.BlockSpec((ncdf, width), lambda i: (0, 0)),
            pl.BlockSpec((1, ncdf), lambda i: (0, 0)),
            pl.BlockSpec((1, ncdf), lambda i: (0, 0)),
            pl.BlockSpec((_LANES, nwords), row),
            pl.BlockSpec((_LANES, 4), row),
        ],
        out_specs=[
            pl.BlockSpec((_LANES, nwords), row),
            pl.BlockSpec((_LANES, 4), row),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, nwords), jnp.uint32),
            jax.ShapeDtypeStruct((S, 4), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((_CHUNK, _LANES, 128), jnp.int32)],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(chunk_colmajor(sym), chunk_colmajor(idx), cdf, sizes, offsets,
      words, meta)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rans_encode_plane(sym, idx, words, meta, cdf, sizes, offsets,
                      interpret: bool = False):
    """Encode one PRE-REVERSED symbol plane for S substreams on device.

    Args:
      sym:   (S, npos) int32 symbols, reverse position order.
      idx:   (S, npos) int32 CDF-row indexes (< 0 = skipped position).
      words: (S, nwords) uint32 emission buffer (donated and returned).
      meta:  (S, 4) uint32 encoder state [x, byte cursor, overflow, 0];
             seed with x = 2**23 and zeros before the LAST plane, thread
             through calls ordered last plane -> first plane.
      cdf/sizes/offsets: the decoder's quantized CDF tables.

    Returns ``(words, meta)``.  ``S`` must be a multiple of 8; pad rows
    with idx = -1 (they consume nothing).
    """
    S, npos_in = sym.shape
    assert S % _LANES == 0, f"S={S} must be a multiple of {_LANES}"
    npos = -(-npos_in // _CHUNK) * _CHUNK
    if npos != npos_in:
        # skip-padding at the END of the walk: these are the FIRST
        # positions of the forward stream's padding, which is appended
        # after the real positions before reversal by the caller — any
        # skip placement is a no-op for the stream bytes
        sym = jnp.pad(sym, ((0, 0), (0, npos - npos_in)))
        idx = jnp.pad(idx, ((0, 0), (0, npos - npos_in)),
                      constant_values=-1)
    return _encode_call(sym.astype(jnp.int32), idx.astype(jnp.int32),
                        cdf.astype(jnp.int32),
                        sizes.reshape(1, -1).astype(jnp.int32),
                        offsets.reshape(1, -1).astype(jnp.int32),
                        words, meta, interpret)


# -- host-side driver ---------------------------------------------------------

def encode_buffer_words(npos_per_part: int, word_bucket: int = 512) -> int:
    """Emission-buffer width: 2 bytes per position, pow2-bucketed so the
    compiled-shape set stays tiny (same policy as the decoder's
    ``pack_substreams``).  Real streams average well under 1 byte per
    position; overflow is detected and reported by the kernel."""
    bucket = max(1, word_bucket)
    need = max(1, -(-npos_per_part * 2 // 4))
    while bucket < need:
        bucket *= 2
    return bucket


def split_plane_rows(plane_sym, plane_idx, nparts: int):
    """(B, n) planes -> (B*nparts, n//nparts) per-part rows, REVERSED along
    positions, matching the C++ contiguous part split
    (sic_rans.cc:297-308).  Requires ``n % nparts == 0`` (true for every
    shipped geometry; callers fall back to the host coder otherwise)."""
    B, n = plane_sym.shape
    assert n % nparts == 0, (n, nparts)
    each = n // nparts
    sym = plane_sym.reshape(B * nparts, each)[:, ::-1]
    idx = plane_idx.reshape(B * nparts, each)[:, ::-1]
    return sym, idx


def frame_substreams(parts: Sequence[bytes]) -> bytes:
    """Multi-substream container framing (sic_rans.cc:310-343, reference:
    src/cpp/py_rans/py_rans.cpp:91-136): flag byte carries the part count
    and header width; the last part's size is implied by the total."""
    nparts = len(parts)
    maximum = max((len(p) for p in parts[:-1]), default=0)
    per_header = 4 if maximum > 65535 else 2
    out = bytearray()
    out.append(((nparts - 1) << 4) + (1 if per_header == 2 else 0))
    for p in parts[:-1]:
        out += len(p).to_bytes(per_header, "little")
    for p in parts:
        out += p
    return bytes(out)


def finalize_streams(words: np.ndarray, meta: np.ndarray,
                     nstreams: int) -> Optional[List[bytes]]:
    """Fetched (S, nwords) uint32 + (S, 4) meta -> per-substream byte
    strings ``LE32(x) + emitted bytes reversed`` (sic_rans.cc:111-133).
    Returns None if any real lane overflowed its emission buffer."""
    if np.any(meta[:nstreams, 2] != 0):
        return None
    out = []
    raw = words.view(np.uint8).reshape(words.shape[0], -1)
    for i in range(nstreams):
        x = int(meta[i, 0])
        n = int(meta[i, 1])
        out.append(int.to_bytes(x, 4, "little") + bytes(raw[i, :n][::-1]))
    return out
