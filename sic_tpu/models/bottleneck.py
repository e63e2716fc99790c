"""Detail-branch compressive bottleneck: transforms + four-part entropy model.

flax re-design of the reference bottleneck
(reference: src/models/sq_bottleneck.py:55-253) in NHWC.  The flax module
holds the nets; :class:`BottleneckCoder` is the host-side driver that
orchestrates jitted device steps against the native rANS coder, reusing the
*same* compiled step functions on the encode and decode paths so both sides
walk bit-identical float trajectories.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyCoder, build_gaussian_tables
from ..entropy.fourpart import (combine_for_writing, forward_four_part_prior,
                                four_part_masks, process_with_mask,
                                separate_prior, add_uniform_noise)
from ..entropy.gaussian import build_indexes, gaussian_bits
from ..ops.rans_decode import pack_substreams, rans_decode_plane, split_substreams
from .dcvc import DepthConvBlock4


class CompressiveBottleneck(nn.Module):
    """Analysis/synthesis transforms + learned prior over the detail latent.

    Per-QP gain vectors select the operating rate (``bpp_num`` rates;
    reference: sq_bottleneck.py:60-61, 84).
    """
    feat_dim: int
    quant_dim: int
    bpp_num: int = 1

    def setup(self):
        f, q, b = self.feat_dim, self.quant_dim, self.bpp_num
        ones = nn.initializers.ones
        self.enc_q = self.param("enc_q", ones, (b, f))
        self.dec_q = self.param("dec_q", ones, (b, f))
        self.factorized_prior_vec = self.param("factorized_prior_vec", ones, (b, q))

        self.enc_trans_0 = [DepthConvBlock4(f), DepthConvBlock4(f)]
        self.enc_trans_1 = [DepthConvBlock4(f), DepthConvBlock4(q)]
        self.dec_trans_0 = [DepthConvBlock4(f), DepthConvBlock4(f)]
        self.dec_trans_1 = [DepthConvBlock4(f), DepthConvBlock4(f)]

        self.y_prior_fusion = [DepthConvBlock4(q * 2), DepthConvBlock4(q * 3)]
        self.y_spatial_prior_reduction = nn.Conv(q, (1, 1))
        self.y_spatial_prior_adaptors = [DepthConvBlock4(q * 2) for _ in range(3)]
        self.y_spatial_prior = [DepthConvBlock4(q * 2) for _ in range(3)]

    # ---- transforms -------------------------------------------------------
    def encode_transform(self, y, q_idx: int = 0):
        for blk in self.enc_trans_0:
            y = blk(y)
        y = y * self.enc_q[q_idx]
        for blk in self.enc_trans_1:
            y = blk(y)
        return y

    def decode_transform(self, y_hat, q_idx: int = 0):
        for blk in self.dec_trans_0:
            y_hat = blk(y_hat)
        y_hat = y_hat * self.dec_q[q_idx]
        for blk in self.dec_trans_1:
            y_hat = blk(y_hat)
        return y_hat

    # ---- prior ------------------------------------------------------------
    def prior_params(self, shape_bhw: Tuple[int, int, int], q_idx: int = 0):
        B, H, W = shape_bhw
        qp = jnp.broadcast_to(self.factorized_prior_vec[q_idx],
                              (B, H, W, self.quant_dim))
        p = qp
        for blk in self.y_prior_fusion:
            p = blk(p)
        return p  # (B, H, W, 3*quant_dim)

    def reduce_common(self, common_params):
        return self.y_spatial_prior_reduction(common_params)

    def spatial_step(self, step: int, y_hat_so_far, common_reduced):
        p = jnp.concatenate([y_hat_so_far, common_reduced], axis=-1)
        p = self.y_spatial_prior_adaptors[step - 1](p)
        for blk in self.y_spatial_prior:
            p = blk(p)
        scales, means = jnp.split(p, 2, axis=-1)
        return scales, means

    # ---- fused forward (training / bpp estimation) ------------------------
    def __call__(self, y, img_hw: Tuple[int, int], q_idx: int = 0,
                 training: bool = False, noise_rng: Optional[jax.Array] = None,
                 force_zero_thres: Optional[float] = None):
        y = self.encode_transform(y, q_idx)
        common = self.prior_params(y.shape[:3], q_idx)
        step_fns = [functools.partial(self.spatial_step, i) for i in (1, 2, 3)]
        out = forward_four_part_prior(
            y, common, step_fns, reduction_fn=self.reduce_common,
            training=training,
            force_zero_thres=None if training else force_zero_thres)
        y_hat = self.decode_transform(out.y_hat, q_idx)

        pixel_num = img_hw[0] * img_hw[1]
        # Noise-proxy bpp (differentiable) vs hard-quant bpp
        # (reference: sq_bottleneck.py:140-156).
        if noise_rng is not None:
            y_for_bit_noise = add_uniform_noise(out.y_res, noise_rng)
        else:
            y_for_bit_noise = out.y_res
        bits_noise = gaussian_bits(y_for_bit_noise, out.scales_hat, training=True)
        bpp_noise = jnp.mean(jnp.sum(bits_noise, axis=(1, 2, 3)) / pixel_num)
        bits_direct = gaussian_bits(jax.lax.stop_gradient(out.y_q),
                                    out.scales_hat, training=training)
        bpp_direct = jnp.mean(jnp.sum(bits_direct, axis=(1, 2, 3)) / pixel_num)
        bpp = bpp_noise if training else bpp_direct
        return y_hat, {"y_hat": y_hat, "bpp": bpp, "bpp_direct": bpp_direct,
                       "bpp_noise": bpp_noise}


@functools.partial(jax.jit, static_argnames=("nparts", "s_pad", "Bc",
                                             "chunks", "interpret"))
def _device_plane_step(idx_c, words, lens, st, cdf, cdf_len, cdf_off,
                       nparts, s_pad, Bc, chunks, interpret):
    """One fused device dispatch per autoregressive step of the on-device
    decode: substream row assembly -> Pallas rANS kernel -> per-chunk
    Bc-padded symbol planes.  ``chunks`` = ((start, real), ...)."""
    B = sum(real for _s, real in chunks)
    idx_real = (idx_c[0][:B] if len(chunks) == 1 else
                jnp.concatenate([a[:real] for a, (_s, real)
                                 in zip(idx_c, chunks)], axis=0))
    rows = idx_real.astype(jnp.int32).reshape(nparts, -1)
    rows = jnp.pad(rows, ((0, s_pad - nparts), (0, 0)), constant_values=-1)
    sym, st2 = rans_decode_plane(rows, words, lens, st, cdf, cdf_len,
                                 cdf_off, interpret=interpret)
    sym_plane = sym[:nparts].reshape(idx_real.shape)
    out = []
    for start, real in chunks:
        sp = sym_plane[start:start + real]
        if real < Bc:
            sp = jnp.pad(sp, ((0, Bc - real),) + ((0, 0),) * 3)
        out.append(sp)
    return tuple(out), st2


class BottleneckCoder:
    """Host driver: real bitstream compress/decompress for a bottleneck.

    Jits one function per coding stage and shares them between compress and
    decompress, guaranteeing the bit-exact round-trip.
    """

    #: Canonical coding batch.  EVERY compiled function feeding the coding
    #: trajectory (encode transform, priors, quantization, reconstruction)
    #: runs at this exact batch size, padding/chunking as needed: XLA
    #: executables compiled for different batch sizes produce different
    #: bf16 float results (measured: ~8% of CDF indexes flip between a
    #: B=32 and a B=1 executable on TPU), which desynchronizes the
    #: autoregressive decode of a stream encoded at another batch size.
    #: Within ONE executable, batch rows are computed independently, so
    #: pad rows cannot perturb real rows.  This constant is part of the
    #: coding contract — both sides of a stream must agree on it.
    CODING_BATCH = 8

    def __init__(self, module: CompressiveBottleneck, params,
                 force_zero_thres: Optional[float] = 0.12,
                 stream_part: int = 1, coding_batch: Optional[int] = None):
        import queue
        import threading
        self.module = module
        self.params = params
        self.force_zero_thres = force_zero_thres
        self.stream_part = stream_part
        self.coding_batch = coding_batch or self.CODING_BATCH
        self.tables = build_gaussian_tables("gaussian")
        self.coder = EntropyCoder(stream_part)
        # the native coder is stateful; guard it so pipelined callers can
        # overlap device dispatch with another image's host coding
        self.lock = threading.Lock()
        self.cdf_group = self.coder.add_cdf(
            self.tables.quantized_cdf, self.tables.cdf_length, self.tables.offset)
        # decoder pool: concurrent decompress() calls each check out their
        # own stateful decoder, so one request's rANS overlaps another's
        # device round trips
        self._dec_pool: "queue.SimpleQueue" = queue.SimpleQueue()
        self._dec_pool.put((self.coder, self.cdf_group))
        # encoder pool for encode_packed_many (NOT seeded with self.coder:
        # its encoder half is owned by encode_packed under self.lock)
        self._enc_pool: "queue.SimpleQueue" = queue.SimpleQueue()

        apply = module.apply

        @functools.partial(jax.jit, static_argnames=("q_idx",))
        def _encode_transform(params, y, q_idx):
            return apply(params, y, q_idx, method=CompressiveBottleneck.encode_transform)

        @functools.partial(jax.jit, static_argnames=("q_idx",))
        def _decode_transform(params, y_hat, q_idx):
            return apply(params, y_hat, q_idx, method=CompressiveBottleneck.decode_transform)

        thres = force_zero_thres

        def _idx_of(scales, step):
            """Step's CDF-index plane from full scales."""
            H, W, C = scales.shape[1:]
            mask = four_part_masks(H, W, C, scales.dtype)[step]
            scale_plane = combine_for_writing(scales * mask)
            # int16 halves the per-step device->host transfer on the
            # autoregressive decode chain (256 levels + skip -1 fit easily)
            return build_indexes(scale_plane, skip_thres=thres).astype(jnp.int16)

        # The encode and decode paths share these compiled functions and
        # exchange their *materialized* outputs (scales/means/idx), so both
        # sides see bit-identical values — the fused-jit analogue of the
        # reference's eager-op sharing (sq_bottleneck.py:202-216 invariant).
        @functools.partial(jax.jit, static_argnames=("shape_bhw", "q_idx"))
        def _prior(params, shape_bhw, q_idx):
            """Fused prior eval + step-0 index plane (one dispatch)."""
            common = apply(params, shape_bhw, q_idx,
                           method=CompressiveBottleneck.prior_params)
            quant_step, scales, means = separate_prior(common, "quantstep3")
            common_reduced = apply(params, common,
                                   method=CompressiveBottleneck.reduce_common)
            return (jnp.maximum(quant_step, 0.5), scales, means,
                    common_reduced, _idx_of(scales, 0))

        @functools.partial(jax.jit, static_argnames=("step",))
        def _spatial_step(params, step, y_hat_so_far, common_reduced):
            """Fused prior CNN + this step's index plane (one dispatch)."""
            scales, means = apply(params, step, y_hat_so_far, common_reduced,
                                  method=CompressiveBottleneck.spatial_step)
            return scales, means, _idx_of(scales, step)

        @functools.partial(jax.jit, static_argnames=("step",))
        def _write_plane(y_div, scales, means, step):
            """Quantize step's positions -> symbol plane (int32)."""
            H, W, C = y_div.shape[1:]
            mask = four_part_masks(H, W, C, y_div.dtype)[step]
            _, y_q, _, _ = process_with_mask(y_div, scales, means, mask,
                                             training=False,
                                             force_zero_thres=thres)
            return combine_for_writing(y_q).astype(jnp.int32)

        @functools.partial(jax.jit, static_argnames=("step",))
        def _recon_step(sym_plane, means, step):
            """Scatter an integer plane back under the step mask and add means."""
            B, H, W, Cq = sym_plane.shape
            mask = four_part_masks(H, W, Cq * 4, means.dtype)[step]
            full = jnp.concatenate([sym_plane.astype(means.dtype)] * 4, axis=-1)
            return (full + means) * mask

        @jax.jit
        def _pack_planes(planes):
            """[(sym, idx) x 4] -> one (4, 2, B, H, W, C/4) int16 array so
            the encode path crosses the host boundary exactly once (int16 is
            the coder's native symbol width — entropy_models.py:66-69 clamp
            — and halves the transfer)."""
            return jnp.stack([
                jnp.stack([jnp.clip(s, -30000, 30000).astype(jnp.int16),
                           i.astype(jnp.int16)])
                for s, i in planes])

        @functools.partial(jax.jit, static_argnames=("real", "nparts"))
        def _prep_rows(sym_plane, idx_plane, real, nparts):
            """(Bc, H, W, Cq) planes -> (real*nparts, n/nparts) int32 rows
            in REVERSE position order (rANS is LIFO), per-part split
            matching the C++ contiguous chunking (sic_rans.cc:297-308);
            int16 clamp matches the host boundary (entropy_models.py:67)."""
            s = jnp.clip(sym_plane[:real], -30000, 30000).astype(jnp.int32)
            i = idx_plane[:real].astype(jnp.int32)
            n = s.shape[1] * s.shape[2] * s.shape[3]
            s = s.reshape(real * nparts, n // nparts)[:, ::-1]
            i = i.reshape(real * nparts, n // nparts)[:, ::-1]
            return s, i

        self._prep_rows = _prep_rows
        self._encode_transform = _encode_transform
        self._decode_transform = _decode_transform
        self._prior = _prior
        self._spatial_step = _spatial_step
        self._write_plane = _write_plane
        self._recon_step = _recon_step
        self._pack_planes = _pack_planes
        # device-resident CDF tables for the on-device (Pallas) decoder
        self._dev_cdf = jnp.asarray(self.tables.quantized_cdf, jnp.int32)
        self._dev_cdf_len = jnp.asarray(self.tables.cdf_length, jnp.int32)
        self._dev_cdf_off = jnp.asarray(self.tables.offset, jnp.int32)

    def clone_with_stream_part(self, stream_part: int) -> "BottleneckCoder":
        """Shallow clone with its own native coder at a different substream
        count, SHARING every compiled device function (the jits close over
        module/params only — stream framing is purely host-side).  Used to
        exercise legacy stream_part-1 files without a recompile."""
        import copy
        import queue
        import threading
        c = copy.copy(self)
        c.stream_part = stream_part
        c.coder = EntropyCoder(stream_part)
        c.cdf_group = c.coder.add_cdf(self.tables.quantized_cdf,
                                      self.tables.cdf_length,
                                      self.tables.offset)
        c.lock = threading.Lock()
        c._dec_pool = queue.SimpleQueue()
        c._dec_pool.put((c.coder, c.cdf_group))
        c._enc_pool = queue.SimpleQueue()
        return c

    def _checkout_decoder(self):
        try:
            return self._dec_pool.get_nowait()
        except Exception:
            c = EntropyCoder(self.stream_part)
            g = c.add_cdf(self.tables.quantized_cdf, self.tables.cdf_length,
                          self.tables.offset)
            return (c, g)

    def _checkin_decoder(self, item):
        self._dec_pool.put(item)

    # -- public API ---------------------------------------------------------
    def forward(self, y, img_hw, q_idx: int = 0) -> Tuple[jax.Array, Dict[str, Any]]:
        fn = functools.partial(self.module.apply, self.params, training=False,
                               force_zero_thres=self.force_zero_thres)
        return jax.jit(fn, static_argnames=("img_hw", "q_idx"))(
            y, img_hw=tuple(img_hw), q_idx=q_idx)

    def _chunk_batches(self, B: int):
        """[(start, real_count)] covering B images in CODING_BATCH chunks."""
        Bc = self.coding_batch
        return [(s, min(Bc, B - s)) for s in range(0, B, Bc)]

    def _plan_chunk(self, yc, q_idx: int):
        """One coding-batch chunk of the device encode chain: the 4-step
        autoregressive prior walk producing the symbol/index planes and the
        simulated reconstruction.  SHARED by the host-coder and
        device-coder encode paths — the two must stay float-trajectory
        identical or their streams desync (see CODING_BATCH)."""
        p = self.params
        y_t = self._encode_transform(p, yc, q_idx)
        quant_step, scales, means, common, idx0 = self._prior(
            p, tuple(y_t.shape[:3]), q_idx)
        y_div = y_t / quant_step
        y_hat_so_far = jnp.zeros_like(y_div)
        planes = []
        for step in range(4):
            if step > 0:
                scales, means, idx = self._spatial_step(
                    p, step, y_hat_so_far, common)
            else:
                idx = idx0
            sym_plane = self._write_plane(y_div, scales, means, step)
            planes.append((sym_plane, idx))
            y_hat_so_far = y_hat_so_far + self._recon_step(sym_plane,
                                                           means, step)
        return planes, self._decode_transform(
            p, y_hat_so_far * quant_step, q_idx)

    def compress_plan_chunks(self, y, q_idx: int = 0):
        """Dispatch the device-side encode chain WITHOUT any host sync,
        per CODING_BATCH chunk; returns ``[(start, real, packed_dev,
        y_hat_dev), ...]`` in image order.

        All chunks are dispatched before this returns (dispatch is async),
        so a caller can fetch chunk j's packed planes — blocking only until
        THAT chunk's chain completes — and run its host rANS while chunks
        j+1.. are still computing on device: the per-chunk streaming encode
        (the reference's hot loop is strictly serial per image,
        compress.py:248-289).

        The chain runs at the coding batch (padded with zero images) so the
        float trajectory is identical to what any later decode — single
        image or batched — will recompute."""
        B = y.shape[0]
        Bc = self.coding_batch
        out = []
        for start, real in self._chunk_batches(B):
            yc = y[start:start + real]
            if real < Bc:
                yc = jnp.pad(yc, ((0, Bc - real),) + ((0, 0),) * (y.ndim - 1))
            planes, y_hat = self._plan_chunk(yc, q_idx)
            out.append((start, real, self._pack_planes(planes)[:, :, :real],
                        y_hat[:real]))
        return out

    def compress_device(self, y, q_idx: int = 0, interpret: bool = False):
        """Device chain + ON-DEVICE rANS encode (``ops.rans_encode``): the
        host boundary carries only the finished entropy words (~8x smaller
        than the packed int16 planes) plus a 16-byte meta row per
        substream.  Returns ``(streams, y_hat)`` with one PER-IMAGE framed
        bit stream per input image (the :meth:`encode_packed_many` wire
        semantics, byte-identical output).

        The emission buffer starts at ~0.5 byte/position and doubles on
        the kernel's overflow signal (each size is one cached compile);
        past 2 bytes/position — or if the plane doesn't split evenly
        across substreams — the packed planes are fetched and the host
        coder takes over, so this path can never fail, only fall back.
        """
        from ..ops.rans_encode import (finalize_streams, frame_substreams,
                                       rans_encode_plane)

        B = y.shape[0]
        Bc = self.coding_batch
        nparts = self.stream_part

        per_chunk = []        # (real, planes, y_hat) with device arrays
        for start, real in self._chunk_batches(B):
            yc = y[start:start + real]
            if real < Bc:
                yc = jnp.pad(yc, ((0, Bc - real),) + ((0, 0),) * (y.ndim - 1))
            planes, y_hat = self._plan_chunk(yc, q_idx)
            per_chunk.append((real, planes, y_hat[:real]))

        y_hat = (per_chunk[0][2] if len(per_chunk) == 1 else
                 jnp.concatenate([c[2] for c in per_chunk], axis=0))

        def _host_fallback():
            packed = np.concatenate(
                [np.asarray(self._pack_planes(planes)[:, :, :real])
                 for real, planes, _ in per_chunk], axis=2)
            return self.encode_packed_many(packed), y_hat

        H, W, Cq = (int(per_chunk[0][1][0][0].shape[1]),
                    int(per_chunk[0][1][0][0].shape[2]),
                    int(per_chunk[0][1][0][0].shape[3]))
        n = H * W * Cq
        if n % nparts != 0:
            return _host_fallback()
        npos = n // nparts
        S_real = B * nparts
        S = -(-S_real // 8) * 8

        # per plane step: concatenated reversed per-part rows of every
        # real image, padded to the kernel's 8-lane grouping with idx=-1
        step_rows = []
        for step in range(4):
            chunk_rows = [self._prep_rows(planes[step][0], planes[step][1],
                                          real, nparts)
                          for real, planes, _ in per_chunk]
            syms = jnp.concatenate([r[0] for r in chunk_rows])
            idxs = jnp.concatenate([r[1] for r in chunk_rows])
            if S != S_real:
                syms = jnp.pad(syms, ((0, S - S_real), (0, 0)))
                idxs = jnp.pad(idxs, ((0, S - S_real), (0, 0)),
                               constant_values=-1)
            step_rows.append((syms, idxs))

        npos_total = 4 * npos
        bucket = 512
        while bucket * 4 < npos_total // 2:     # start ~0.5 byte/position
            bucket *= 2
        cap = bucket
        while cap * 4 < npos_total * 2:         # cap at 2 bytes/position
            cap *= 2

        while True:
            words = jnp.zeros((S, bucket), jnp.uint32)
            meta = jnp.zeros((S, 4), jnp.uint32).at[:, 0].set(1 << 23)
            for step in (3, 2, 1, 0):           # LIFO flush order
                words, meta = rans_encode_plane(
                    step_rows[step][0], step_rows[step][1], words, meta,
                    self._dev_cdf, self._dev_cdf_len, self._dev_cdf_off,
                    interpret=interpret)
            words_np, meta_np = jax.device_get((words, meta))
            parts = finalize_streams(words_np, meta_np, S_real)
            if parts is not None:
                break
            if bucket >= cap:
                return _host_fallback()
            bucket *= 2

        streams = [frame_substreams(parts[b * nparts:(b + 1) * nparts])
                   for b in range(B)]
        return streams, y_hat

    def compress_plan(self, y, q_idx: int = 0):
        """One-shot form of :meth:`compress_plan_chunks`: returns
        (packed_planes device array, y_hat device array) concatenated over
        chunks, for callers that want a single fetch."""
        chunks = self.compress_plan_chunks(y, q_idx)
        if len(chunks) == 1:
            return chunks[0][2], chunks[0][3]
        return (jnp.concatenate([c[2] for c in chunks], axis=2),
                jnp.concatenate([c[3] for c in chunks], axis=0))

    def encode_packed(self, packed: np.ndarray) -> bytes:
        """Host rANS over a fetched packed-planes array."""
        with self.lock:
            self.coder.reset()
            for step in range(packed.shape[0]):
                self.coder.encode_with_indexes(packed[step, 0],
                                               packed[step, 1],
                                               self.cdf_group)
            self.coder.flush()
            return self.coder.get_encoded_stream()

    def encode_packed_many(self, packed: np.ndarray, workers: int = 8) -> list:
        """Per-image host rANS over a batched packed array (4, 2, B, ...):
        images fan out over a pool of native encoders (the ctypes calls
        release the GIL), instead of serializing on the shared coder.

        Uses a dedicated encoder pool: the decoder pool is seeded with
        ``self.coder``, whose ENCODER half belongs to ``encode_packed``
        under ``self.lock`` — sharing it here would race concurrent
        ``compress`` calls on one stateful native encoder."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        B = packed.shape[2]
        workers = min(workers, os.cpu_count() or 1, B)
        if B == 1 or workers <= 1:
            # single-core hosts: the fan-out only adds scheduling overhead
            return [self.encode_packed(packed[:, :, b:b + 1])
                    for b in range(B)]

        def _enc(b):
            try:
                coder, group = self._enc_pool.get_nowait()
            except Exception:
                coder = EntropyCoder(self.stream_part)
                group = coder.add_cdf(self.tables.quantized_cdf,
                                      self.tables.cdf_length,
                                      self.tables.offset)
            try:
                coder.reset()
                for step in range(packed.shape[0]):
                    coder.encode_with_indexes(packed[step, 0, b:b + 1],
                                              packed[step, 1, b:b + 1], group)
                coder.flush()
                return coder.get_encoded_stream()
            finally:
                self._enc_pool.put((coder, group))

        with ThreadPoolExecutor(max_workers=min(workers, B)) as pool:
            return list(pool.map(_enc, range(B)))

    def compress(self, y, q_idx: int = 0):
        """y: (B, H, W, feat_dim) -> (bit_stream bytes, y_hat).

        The whole four-step chain is device-resident — dispatches enqueue
        asynchronously and the host boundary is crossed exactly once with
        one packed planes array."""
        packed, y_hat = self.compress_plan(y, q_idx)
        return self.encode_packed(np.asarray(packed)), y_hat

    def _run_decode_chain(self, feat_shape, q_idx, get_symbols,
                          coding_batch: Optional[int] = None):
        """Shared 4-step autoregressive decode driver.

        The prior/recon chain runs at the coding batch (pad images beyond B
        are zeros and consume no stream bytes), reproducing the encoder's
        float trajectory exactly regardless of either side's batch size.
        ``get_symbols(step, idx_c, chunks, Bc)`` supplies each chunk's
        Bc-padded int symbol plane (host array or device array) — the only
        thing that differs between the host-coder, threaded-batched, and
        on-device (Pallas) decode paths."""
        p = self.params
        B, H, W, C = feat_shape
        Bc = coding_batch or self.coding_batch
        chunks = [(s, min(Bc, B - s)) for s in range(0, B, Bc)]
        quant_step, _scales, means0, common, idx0 = self._prior(
            p, (Bc, H, W), q_idx)
        y_hats = [jnp.zeros((Bc, H, W, C), dtype=quant_step.dtype)
                  for _ in chunks]
        means_c = [means0] * len(chunks)
        idx_c = [idx0] * len(chunks)
        for step in range(4):
            if step > 0:
                for ci in range(len(chunks)):
                    _s, means_c[ci], idx_c[ci] = self._spatial_step(
                        p, step, y_hats[ci], common)
            sym_chunks = get_symbols(step, idx_c, chunks, Bc)
            for ci in range(len(chunks)):
                y_hats[ci] = y_hats[ci] + self._recon_step(
                    jnp.asarray(sym_chunks[ci]), means_c[ci], step)
        outs = [self._decode_transform(p, yh * quant_step, q_idx)[:real]
                for yh, (_s, real) in zip(y_hats, chunks)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def decompress(self, bit_stream: bytes, feat_shape, q_idx: int = 0,
                   coding_batch: Optional[int] = None):
        """feat_shape: (B, H, W, quant_dim) of the transformed latent.
        ``coding_batch``: the stream's coding contract if it differs from
        this coder's default (carried in the c2df header)."""
        coder, group = self._checkout_decoder()

        def get_symbols(step, idx_c, chunks, Bc):
            # ONE transfer round for all chunks' index planes
            idx_np = jax.device_get(idx_c)
            idx_real = np.concatenate(
                [a[:real] for a, (_s2, real) in zip(idx_np, chunks)])
            sym_np = coder.decode_stream(idx_real, group)
            sym_np = sym_np.reshape(idx_real.shape)
            out, off = [], 0
            for _start, real in chunks:
                sp = np.zeros((Bc,) + sym_np.shape[1:], np.int16)
                sp[:real] = sym_np[off:off + real]
                off += real
                out.append(sp)
            return out

        try:
            coder.set_stream(bit_stream)
            return self._run_decode_chain(feat_shape, q_idx, get_symbols,
                                          coding_batch)
        finally:
            self._checkin_decoder((coder, group))

    def can_decompress_on_device(self, bit_stream: bytes, feat_shape) -> bool:
        """The on-device decoder needs equal-size substream chunks (true for
        power-of-two planes and stream_part) and a jax backend that can run
        the Pallas kernel (TPU, or CPU via interpret mode)."""
        if len(bit_stream) < 1:
            return False
        nparts = (bit_stream[0] >> 4) + 1
        B, H, W, C = feat_shape
        n_step = B * H * W * (C // 4)
        return n_step % nparts == 0 and (n_step // nparts) >= 1

    def decompress_device(self, bit_stream: bytes, feat_shape, q_idx: int = 0,
                          interpret: Optional[bool] = None,
                          coding_batch: Optional[int] = None):
        """Fully device-resident decompress: the four autoregressive steps
        chain prior-CNN -> Pallas rANS decode -> reconstruction dispatches
        asynchronously, so the host boundary is crossed once for the stream
        upload and once for the final fetch — vs 4 serial round trips on the
        host path (:meth:`decompress`).  Uses the SAME compiled prior/recon
        executables as the host path and encoder, so the float trajectory
        (and hence the index planes the decoder consumes) is bit-identical.

        Reference counterpart: the eager per-step decompress at
        src/models/sq_bottleneck.py:202-216 — there the entropy decode is
        host-side by construction; here it rides the MXU/VPU.
        """
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        B, H, W, C = feat_shape

        parts = split_substreams(bit_stream)
        nparts = len(parts)
        n_step = B * H * W * (C // 4)
        if n_step % nparts != 0:
            raise ValueError("substream count does not evenly divide plane")
        words_np, lens_np, state_np = pack_substreams(parts)
        words = jnp.asarray(words_np)
        lens = jnp.asarray(lens_np)
        s_pad = words.shape[0]
        state = {"st": jnp.asarray(state_np)}

        def get_symbols(step, idx_c, chunks, Bc):
            out, state["st"] = _device_plane_step(
                tuple(idx_c), words, lens, state["st"], self._dev_cdf,
                self._dev_cdf_len, self._dev_cdf_off, nparts=nparts,
                s_pad=s_pad, Bc=Bc, chunks=tuple(chunks),
                interpret=interpret)
            return out

        return self._run_decode_chain(feat_shape, q_idx, get_symbols,
                                      coding_batch)

    def decompress_batched(self, bit_streams, latent_shape, q_idx: int = 0,
                           workers: int = 8,
                           coding_batch: Optional[int] = None):
        """Decode B independent per-image streams with BATCHED device steps:
        each of the 4 autoregressive steps runs ONE prior eval round + ONE
        index-plane fetch for all B images, and the per-image host rANS
        decodes fan out on threads.  4 host syncs total instead of 4*B —
        the device-batching dual of ``CodecRuntime.encode_only_batched``.

        ``latent_shape``: (1, H, W, quant_dim) of each image's coded latent
        (all streams must share it).  Bit-exact with per-image decode at any
        batch size (the trajectory always runs at the coding batch)."""
        from concurrent.futures import ThreadPoolExecutor

        B = len(bit_streams)
        _, H, W, C = latent_shape
        coders = [self._checkout_decoder() for _ in bit_streams]

        def make_get_symbols(pool):
            def get_symbols(step, idx_c, chunks, Bc):
                idx_np = jax.device_get(idx_c)   # ONE round for all B

                def _dec(i):
                    coder, group = coders[i]
                    ci, off = divmod(i, Bc)
                    return coder.decode_stream(idx_np[ci][off], group)

                syms = list(pool.map(_dec, range(B)))
                out = []
                for ci, (start, real) in enumerate(chunks):
                    sp = np.zeros((Bc,) + idx_np[ci].shape[1:], np.int16)
                    sp[:real] = np.stack(
                        syms[start:start + real]).reshape(
                            (real,) + idx_np[ci].shape[1:])
                    out.append(sp)
                return out
            return get_symbols

        try:
            for (coder, _g), stream in zip(coders, bit_streams):
                coder.set_stream(stream)
            with ThreadPoolExecutor(max_workers=min(workers, B)) as pool:
                return self._run_decode_chain(
                    (B, H, W, C), q_idx, make_get_symbols(pool),
                    coding_batch)
        finally:
            for item in coders:
                self._checkin_decoder(item)

    def entropy_map(self, y, q_idx: int = 0):
        """Per-element hard-quant bit map (ablation-study helper;
        reference: sq_bottleneck.py:219-232)."""
        H, W = y.shape[1], y.shape[2]

        @functools.partial(jax.jit, static_argnames=("img_hw", "q_idx"))
        def _map(y, img_hw, q_idx):
            y_t = self.module.apply(
                self.params, y, q_idx,
                method=CompressiveBottleneck.encode_transform)
            common = self.module.apply(
                self.params, y_t.shape[:3], q_idx,
                method=CompressiveBottleneck.prior_params)
            step_fns = [
                functools.partial(
                    lambda step, yh, c: self.module.apply(
                        self.params, step, yh, c,
                        method=CompressiveBottleneck.spatial_step), i)
                for i in (1, 2, 3)]
            red = functools.partial(self.module.apply, self.params,
                                    method=CompressiveBottleneck.reduce_common)
            out = forward_four_part_prior(
                y_t, common, step_fns, reduction_fn=red, training=False,
                force_zero_thres=self.force_zero_thres)
            return gaussian_bits(out.y_q, out.scales_hat, training=False)

        return _map(y, (H, W), q_idx)

    def compress_decompress_entropy_map(self, y, img_hw, q_idx: int = 0):
        """Round-trip + bit map (reference: sq_bottleneck.py:234-253)."""
        emap = self.entropy_map(y, q_idx)
        y_hat, info = self.compress_decompress(y, img_hw, q_idx)
        info["entropy_map"] = emap
        return y_hat, info

    def compress_decompress(self, y, img_hw, q_idx: int = 0):
        """Round-trip with the reference's validity contract
        (reference: sq_bottleneck.py:202-216)."""
        B, H, W, _ = y.shape
        feat_shape = (B, H, W, self.module.quant_dim)
        stream, y_hat_enc = self.compress(y, q_idx)
        y_hat = self.decompress(stream, feat_shape, q_idx)
        assert float(jnp.sum(jnp.abs(y_hat - y_hat_enc))) == 0.0, \
            "entropy-coded reconstruction diverged from encoder simulation"
        bpp = len(stream) * 8 / (img_hw[0] * img_hw[1])
        _, est = self.forward(y, tuple(img_hw), q_idx)
        bpp_est = float(est["bpp"])
        return y_hat, {"y_hat": y_hat, "bpp": bpp, "bit_stream": stream,
                       "bpp_est": bpp_est, "bpp_diff": bpp - bpp_est}
