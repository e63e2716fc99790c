"""Top-level searchable generative codec: model + deployment runtime.

TPU re-design of the reference ``Codec`` LightningModule
(reference: src/models/codec_sq_fixbpp.py:442-922).  The flax :class:`Codec`
is pure compute (training logic lives in ``sic_tpu.train``); the host-side
:class:`CodecRuntime` drives real-bitstream ``encode_only`` / ``decode_only``
/ ``encode_decode`` against the native rANS coder, with every device stage
jitted once and shared between the encode and decode paths.

Stream layout parity: the semantic (TiTok token) stream is coded with a
uniform CDF over the codebook — the reference uses the external ``torchac``
arithmetic coder for this (codec_sq_fixbpp.py:861-864, 886-887); here it is
one more CDF group of the same rANS coder, removing the extra dependency and
the second coder implementation.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyCoder
from .bottleneck import BottleneckCoder, CompressiveBottleneck
from .hybrid import FeatMerge, HybridCodec, TiTokSpec
from .vqgan import VQGAN, VQGANSpec

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CodecSpec:
    """Full-model hyperparameters (reference: src/config/config_test.yaml)."""
    titok: TiTokSpec = TiTokSpec()
    vqgan: VQGANSpec = VQGANSpec()
    feat_width: int = 768            # feat_dim
    quant_dim: int = 64              # embed_dim of the detail bottleneck
    insert_pos_enc: Tuple[int, ...] = (3, 7, 11, 15, 19)
    insert_pos_dec: Tuple[int, ...] = (3, 7, 11, 15, 19)
    num_attns: int = 2
    merge_inner_width: int = 1024    # FeatMerge trunk width (reference: codec_sq_fixbpp.py:411)
    remat: bool = False              # save_mem
    force_zero_thres: float = 0.12

    @property
    def tile_px(self) -> int:
        return self.titok.tile_px


def get_padding_size(height: int, width: int, p: int = 256):
    """Pad-to-multiple, right/bottom only (reference: compression_model.py:13-22)."""
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return 0, new_w - width, 0, new_h - height


def pad_replicate(x, pads):
    """NHWC replicate-pad (l, r, t, b) — the reference's F.pad 'replicate'."""
    l, r, t, b = pads
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


class Codec(nn.Module):
    """Hybrid codec + VQGAN pixel decoder + prior fusion.

    ``pp`` switches the hybrid trunks to the stacked-cell layout and (when
    its mesh is set) GPipe pipeline execution (models/hybrid.py PPConfig).
    """
    spec: CodecSpec
    dtype: Optional[Dtype] = None
    pp: Optional[Any] = None

    def setup(self):
        s = self.spec
        self.hybrid_codec = HybridCodec(
            s.titok, s.insert_pos_enc, s.insert_pos_dec, s.feat_width,
            s.quant_dim, s.num_attns, s.remat, self.dtype, self.pp)
        self.vqgan = VQGAN(s.vqgan, self.dtype)
        self.prior_fusion = FeatMerge(s.titok.width, s.feat_width,
                                      s.vqgan.n_embed, s.merge_inner_width,
                                      dtype=self.dtype)

    # -- teacher path (frozen VQGAN encoder) ---------------------------------
    def encode_to_vqgan(self, x):
        """x in [-1, 1] -> (teacher latent, teacher indices)
        (reference: codec_sq_fixbpp.py:650-655)."""
        h = self.vqgan.encode_latent(x)
        h_q, _, info = self.vqgan.quantize(h)
        return h_q, info["indices"]

    # -- generative decode ----------------------------------------------------
    def decode_to_latent(self, titok_hat, feat_hat):
        """Soft codebook mixture from fused logits
        (reference: codec_sq_fixbpp.py:658-663)."""
        logits = self.prior_fusion(titok_hat, feat_hat)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        codebook = self.vqgan.quantize.codebook()
        latent = jnp.einsum("bhwn,nd->bhwd", probs, codebook)
        return latent.astype(logits.dtype), logits

    def decode_to_image(self, quantized_latent, return_pre: bool = False):
        return self.vqgan.decode(quantized_latent, return_pre=return_pre)

    # -- full forward (training) ----------------------------------------------
    def __call__(self, x, need_full_decode: bool = True,
                 training: bool = False, noise_rng=None,
                 return_pre_out: bool = False):
        """x: (B, H, W, 3) in [-1, 1] (the hybrid branch sees [0, 1];
        reference: codec_sq_fixbpp.py:673)."""
        enc = self.hybrid_codec(x * 0.5 + 0.5, training, noise_rng)
        latent, logits = self.decode_to_latent(enc["titok_hat"], enc["feat_hat"])
        pre_out = None
        if need_full_decode:
            if return_pre_out:
                x_hat, pre_out = self.decode_to_image(latent, return_pre=True)
            else:
                x_hat = self.decode_to_image(latent)
        else:
            x_hat = None
        return {"x": x, "x_hat": x_hat, "pre_out": pre_out,
                "bpp_loss": enc["h_result_dict"]["bpp"],
                "bpp_hard_quant": enc["h_result_dict"]["bpp_direct"],
                "vq_loss": enc["z_result_dict"]["quantizer_loss"],
                "logits": logits, "vqgan_latent": latent}

    # -- deployment stages (used jitted by CodecRuntime) ----------------------
    def encode_stage(self, x01):
        """[0,1] padded image -> (z token indices, detail latent, stack_shape)."""
        z, h, stack_shape = self.hybrid_codec.encoder(
            x01, self.hybrid_codec.latent_tokens)
        _, z_result = self.hybrid_codec.quantize(z)
        return z_result["min_encoding_indices"], h, stack_shape

    def decode_stage(self, z_indices, h_hat, stack_shape):
        """Token indices + decoded detail latent -> [-1,1] image."""
        z_hat = self.hybrid_codec.decode_z_indices(z_indices)
        titok_hat, feat_hat = self.hybrid_codec.decode(z_hat, h_hat, stack_shape)
        latent, _ = self.decode_to_latent(titok_hat, feat_hat)
        x_hat = self.decode_to_image(latent)
        return jnp.clip(x_hat, -1.0, 1.0)

    def init_all(self, x):
        """Touch every parameterized path so ``init`` creates the full tree
        (flax only materializes params on executed branches)."""
        out = self(x, need_full_decode=True)
        teacher = self.encode_to_vqgan(x)
        return out, teacher


def init_codec(spec: CodecSpec, rng, image_hw: Tuple[int, int] = None,
               dtype=None, pp=None):
    """Initialize the full Codec param tree on a dummy batch (one tile)."""
    hw = image_hw or (spec.tile_px, spec.tile_px)
    model = Codec(spec, dtype, pp)
    x = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    init_fn = jax.jit(functools.partial(model.init, method=Codec.init_all))
    params = init_fn(rng, x)
    return model, params


class EncodeRouter:
    """Link-adaptive encode-path policy: host packed-plane fetch + native
    rANS vs on-device Pallas rANS (fetch only the ~8x-smaller finished
    stream at the cost of the kernel's serial walk).

    Pure host-side state machine, extracted from CodecRuntime so the
    closed-loop behavior is unit-testable without a device.  Three design
    rules, each bought by a measured round-4 failure
    (BENCH_r04.json: 7/7 host picks while `fetch` ran 1158 ms/batch, ~3x
    the router's prediction):

    1. Route on the REALIZED host cost: ``host_spb`` is an EMA of
       seconds-per-byte over actual packed-plane fetches — stalls, RTT
       and serialization included — not a bandwidth estimate.
    2. Asymmetric adaptation: a worse-than-EMA observation gets weight
       0.7 (links degrade abruptly), a better one 0.3 (recovery is
       handled by exploration, not optimism).
    3. Minority-path exploration: the kernel-cost EMA updates only on
       the device path and the link cost only on the host path, so a
       one-sided router self-seals on stale priors.  Every
       ``explore_every``-th decision takes the minority path to keep
       both estimators live (and lets the policy flip back after a
       transient, the round-4 advisor's latch-up finding).
    """

    def __init__(self, dev_chunk_s: float = 0.09, dev_shrink: float = 8.0,
                 explore_every: int = 16):
        self.host_spb: Optional[float] = None   # realized host s/byte EMA
        self.link_bw: Optional[float] = None    # bytes/s EMA (observability)
        self.dev_chunk_s = dev_chunk_s          # kernel s/chunk EMA
        self.dev_shrink = dev_shrink            # packed/stream byte ratio EMA
        self.explore_every = explore_every
        self._n = 0                             # auto decisions taken
        self.last_explored = False              # observability

    def note_fetch(self, nbytes: int, secs: float) -> None:
        """Feed a realized device->host fetch (large transfers only —
        small ones measure RTT, not the transfer cost)."""
        if nbytes < (1 << 18) or secs <= 0:
            return
        bw = nbytes / secs
        self.link_bw = (bw if self.link_bw is None
                        else 0.5 * self.link_bw + 0.5 * bw)
        spb = secs / nbytes
        if self.host_spb is None:
            self.host_spb = spb
        elif spb > self.host_spb:
            self.host_spb = 0.3 * self.host_spb + 0.7 * spb
        else:
            self.host_spb = 0.7 * self.host_spb + 0.3 * spb

    def note_device_encode(self, dev_s: float, stream_bytes: int,
                           packed_bytes: int, n_chunks: int) -> None:
        """Feed a realized device-path encode (kernel walk + stream fetch)."""
        if self.host_spb is not None:
            # peel the fetch share off the measurement -> kernel EMA
            kern = max(dev_s - stream_bytes * self.host_spb, 1e-3)
            self.dev_chunk_s = (0.5 * self.dev_chunk_s
                                + 0.5 * kern / max(n_chunks, 1))
        if packed_bytes and stream_bytes:
            self.dev_shrink = (0.5 * self.dev_shrink
                               + 0.5 * packed_bytes / stream_bytes)

    def decide(self, packed_bytes: int, n_chunks: int) -> bool:
        """True -> device path.  Call only for auto-routable batches."""
        if self.host_spb is None:
            self.last_explored = False
            return False                 # first batch measures the link
        t_host = packed_bytes * self.host_spb
        t_dev = (n_chunks * self.dev_chunk_s
                 + packed_bytes / self.dev_shrink * self.host_spb)
        choice = t_dev < t_host
        self._n += 1
        self.last_explored = bool(
            self.explore_every and self._n % self.explore_every == 0)
        if self.last_explored:
            choice = not choice
        return choice


class CodecRuntime:
    """Host driver for real-bitstream deployment paths.

    (reference: codec_sq_fixbpp.py:849-922)
    """

    def __init__(self, spec: CodecSpec, params, dtype=None, stream_part: int = 1,
                 mesh=None, z_format: str = "rans",
                 device_entropy: str = "auto", quant: Optional[str] = None):
        """``mesh``: optional ``jax.sharding.Mesh`` — inputs get batch/tile
        sharding and params are replicated, so one process drives all chips
        (the reference's NCCL-DDP inference counterpart,
        reference: compress.py:33-55).

        ``z_format``: wire format of the semantic-token stream — ``"rans"``
        (native; one coder for both streams) or ``"torchac"`` (the
        reference's exact format, codec_sq_fixbpp.py:861-864).  Decode
        always accepts either via the ``z_coder`` argument regardless of
        this setting.

        ``quant``: ``"int8"`` serves the Dense-dominated towers with W8A8
        dynamic quantization on the MXU's int8 path (~2x bf16 peak; see
        ``ops/quant.py``).  The autoregressive entropy path is conv-only
        and stays float, so streams stay bit-compatible across modes —
        an int8 decoder decodes float-encoded files and vice versa; only
        the reconstruction differs slightly."""
        from ..ops.quant import quantize_dense_tree, quantized

        self.spec = spec
        self.model = Codec(spec, dtype)
        self.mesh = mesh
        assert quant in (None, "none", "int8"), quant
        self.quant = None if quant in (None, "none") else quant
        if self.quant == "int8":
            params = quantize_dense_tree(params)
        if mesh is not None:
            from ..parallel import shard_state
            params = shard_state(params, mesh)
        self.params = params

        apply = self.model.apply
        qmode = self.quant

        @jax.jit
        def _encode(p, x01):
            with quantized(qmode):   # read at trace time by QDense
                return apply(p, x01, method=Codec.encode_stage)

        @functools.partial(jax.jit, static_argnames=("stack_shape",))
        def _decode(p, z_indices, h_hat, stack_shape):
            with quantized(qmode):
                return apply(p, z_indices, h_hat, stack_shape,
                             method=Codec.decode_stage)

        @functools.partial(jax.jit, static_argnames=("stack_shape",))
        def _decode_u8(p, z_indices, h_hat, stack_shape):
            """Decode straight to uint8 pixels on device: the PNG-bound
            callers (CLI/service) never need floats, and the u8 fetch is
            4x smaller over the host link."""
            with quantized(qmode):
                x = apply(p, z_indices, h_hat, stack_shape,
                          method=Codec.decode_stage)
            return jnp.clip((x + 1.0) * 127.5, 0.0, 255.0).astype(jnp.uint8)

        self._encode = _encode
        self._decode = _decode
        self._decode_u8 = _decode_u8

        # detail-stream coder over the bottleneck parameter subtree
        # (conv-only, so quantize_dense_tree left it bit-identical — the
        # entropy trajectory is the same in every quant mode)
        bn_params = {"params": params["params"]["hybrid_codec"]["quantize_feat"]}
        bn_module = CompressiveBottleneck(spec.feat_width, spec.quant_dim)
        self.h_coder = BottleneckCoder(bn_module, bn_params,
                                       force_zero_thres=spec.force_zero_thres,
                                       stream_part=stream_part)

        import queue
        from concurrent.futures import ThreadPoolExecutor

        # semantic-stream coders: uniform CDF over the TiTok codebook.
        # Pooled (like the h-decoder pool) so concurrent requests never
        # serialize on one stateful native coder.
        K = spec.titok.codebook_size
        precision = 16
        freq = (1 << precision) // K
        self._z_cdf = np.zeros((1, K + 1), np.int32)
        self._z_cdf[0, 1:] = np.cumsum(np.full(K, freq, np.int64))
        self._z_cdf[0, -1] = 1 << precision
        self.stream_part = stream_part
        self._z_pool: "queue.SimpleQueue" = queue.SimpleQueue()
        self._z_pool.put(self._new_z_coder())
        # overlap host-side z coding with the device-bound h decode
        self._io = ThreadPoolExecutor(max_workers=4,
                                      thread_name_prefix="sic-z")

        # reference-format compat coder (stateless -> no pooling needed)
        from ..entropy.torchac_compat import UniformTorchacCodec
        assert z_format in ("rans", "torchac"), z_format
        self.z_format = z_format
        self.z_torchac = UniformTorchacCodec(K)
        assert device_entropy in ("auto", "host", "device"), device_entropy
        self.device_entropy = device_entropy

        # -- link-adaptive encode policy (see EncodeRouter) ---------------
        # Priors from the r3 ablations: ~0.09 s kernel walk per coding
        # chunk (RANS_ABLATION_r03b.json), 8x stream shrink
        # (ops/rans_encode.py).
        self.router = EncodeRouter()
        self.encode_path_counts = {"device": 0, "host": 0}  # observability

    @property
    def _link_bw(self) -> Optional[float]:
        """Measured link bandwidth (bytes/s EMA); bench observability."""
        return self.router.link_bw

    def _note_fetch(self, nbytes: int, secs: float) -> None:
        self.router.note_fetch(nbytes, secs)

    def _use_device_encode(self, packed_bytes: int, n_chunks: int) -> bool:
        """Route an encode batch: device rANS when the predicted kernel
        walk beats the packed-plane fetch at the realized host cost."""
        if self.device_entropy == "host" or self.mesh is not None:
            return False
        if self.device_entropy == "device":
            return True
        if jax.default_backend() != "tpu":
            return False
        return self.router.decide(packed_bytes, n_chunks)

    def _count_path(self, use_dev: bool) -> None:
        self.encode_path_counts["device" if use_dev else "host"] += 1

    def _use_device_entropy(self, h_bit_stream: bytes, latent_shape) -> bool:
        """Decide the h-stream decode path.  The on-device Pallas decoder
        wins when its ~2.6 us/serial-position cost beats the host path's 4
        tunnel round trips — i.e. on TPU with >= 4 substreams; ``"device"``
        forces it (tests / CPU interpret mode)."""
        if self.device_entropy == "host":
            return False
        if not self.h_coder.can_decompress_on_device(h_bit_stream, latent_shape):
            return False
        if self.device_entropy == "device":
            return True
        nparts = (h_bit_stream[0] >> 4) + 1
        return jax.default_backend() == "tpu" and nparts >= 4

    def _new_z_coder(self):
        K = self.spec.titok.codebook_size
        coder = EntropyCoder(self.stream_part)
        group = coder.add_cdf(self._z_cdf, np.array([K + 1], np.int32),
                              np.array([0], np.int32))
        return coder, group

    def _checkout_z(self):
        try:
            return self._z_pool.get_nowait()
        except Exception:
            return self._new_z_coder()

    def _encode_z(self, idx_np: np.ndarray) -> bytes:
        if self.z_format == "torchac":
            return self.z_torchac.encode(idx_np)
        coder, group = self._checkout_z()
        try:
            coder.reset()
            coder.encode_with_indexes(
                idx_np.astype(np.int32), np.zeros(idx_np.size, np.int16),
                group)
            coder.flush()
            return coder.get_encoded_stream()
        finally:
            self._z_pool.put((coder, group))

    def _decode_z(self, z_bit_stream: bytes, token_length: int,
                  z_coder: str) -> np.ndarray:
        if z_coder == "torchac":
            return self.z_torchac.decode(z_bit_stream, int(token_length))
        coder, group = self._checkout_z()
        try:
            coder.set_stream(z_bit_stream)
            return coder.decode_stream(
                np.zeros(int(token_length), np.int16), group)
        finally:
            self._z_pool.put((coder, group))

    # -- API parity with the reference deployment methods ---------------------
    def encode_only(self, x, timer=None) -> Dict[str, Any]:
        """x: (B, H, W, 3) in [-1, 1], H/W multiples of tile_px."""
        from ..utils.profiling import timed_stage

        B, H, W, _ = x.shape
        x01 = jnp.asarray(x) * 0.5 + 0.5
        if self.mesh is not None:
            from ..parallel import shard_batch
            x01 = shard_batch(x01, self.mesh)
        # Device entropy ENCODE is opt-in ("device") OR link-policy-routed,
        # not the unconditional "auto" default, unlike decode.  The
        # asymmetry is measured, not aesthetic (BENCH r3, one v5e via
        # tunnel): host-path decode needs 4 SERIAL round trips (one per
        # autoregressive plane), so the on-device decode kernel wins (112
        # vs 247 ms p50) — but host-path encode ships all packed planes in
        # ONE fetch, so at a HEALTHY link the encode kernel's sequential
        # walk costs more than the fetch it saves (189 vs 66 ms p50).  On
        # a degraded link the ~8x stream shrink flips the sign, which is
        # what ``_use_device_encode`` predicts from the measured bandwidth
        # (round-4 verdict item: link-robust batched encode).
        if B == 1 and self.mesh is None:
            Hl = H // 32
            Wl = W // 32
            pb = 4 * Hl * Wl * self.spec.quant_dim
            use_dev_enc = self._use_device_encode(pb, 1)
        else:
            use_dev_enc = False
        self._count_path(use_dev_enc)
        if use_dev_enc:
            with timed_stage(timer, "encode_device"):
                z_indices, h, _ = self._encode(self.params, x01)
                streams, _ = self.h_coder.compress_device(
                    h, q_idx=0,
                    interpret=jax.default_backend() != "tpu")
            stack_shape = (H // self.spec.tile_px, W // self.spec.tile_px)
            with timed_stage(timer, "fetch"):
                z_np = jax.device_get(z_indices)
            with timed_stage(timer, "h_rans"):
                h_bit_stream = streams[0]      # framed on device fetch
        else:
            with timed_stage(timer, "encode_device"):
                z_indices, h, _ = self._encode(self.params, x01)
                packed_dev, _ = self.h_coder.compress_plan(h, q_idx=0)
            # tile grid is a static function of the padded image size
            stack_shape = (H // self.spec.tile_px, W // self.spec.tile_px)

            with timed_stage(timer, "fetch"):
                # one batched device->host fetch for both streams' inputs
                t0 = time.perf_counter()
                z_np, packed = jax.device_get((z_indices, packed_dev))
                self._note_fetch(packed.nbytes, time.perf_counter() - t0)

            with timed_stage(timer, "h_rans"):
                h_bit_stream = self.h_coder.encode_packed(packed)

        with timed_stage(timer, "z_rans"):
            idx_np = z_np.reshape(-1)
            z_bit_stream = self._encode_z(idx_np)

        return {
            "z_bit_stream": z_bit_stream,
            "h_bit_stream": h_bit_stream,
            "img_shape": (H, W),
            "feat_shape": tuple(h.shape),
            "stack_shape": tuple(stack_shape),
            "token_length": int(idx_np.size),
            "z_indices_shape": tuple(np.asarray(z_indices).shape),
        }

    def encode_only_batched(self, x, timer=None) -> list:
        """Batched encode: ONE device pass for B images, then B independent
        per-image bitstreams (decodable one by one with :meth:`decode_only`).
        The throughput path for corpus indexing.

        The host work STREAMS per coding-batch chunk: chunk j's packed
        planes are fetched as soon as its device chain completes, and its
        host rANS runs on a worker thread while chunks j+1.. are still
        computing — the native coder releases the GIL, so the rANS write
        genuinely overlaps both later chunks' compute and their fetches.
        (Round-2 profile: a monolithic fetch + rANS serialized ~1.1 s of
        host-side work after the device finished; reference hot loop is
        fully serial per image, compress.py:248-289.)

        Note for ``timer`` readers: stages overlap by design here, so
        fetch + h_rans wall-clock sums exceed the pipeline's critical path.
        """
        from ..utils.profiling import timed_stage

        B, H, W, _ = x.shape
        if B == 1:
            # single-request callers (service uploads) get the latency
            # path: on TPU it entropy-codes the h stream on device and
            # fetches only the finished words.  Field-compatible output.
            return [self.encode_only(x, timer=timer)]
        x01 = jnp.asarray(x) * 0.5 + 0.5
        if self.mesh is not None:
            from ..parallel import shard_batch
            x01 = shard_batch(x01, self.mesh)

        stack_shape = (H // self.spec.tile_px, W // self.spec.tile_px)
        n_tiles = stack_shape[0] * stack_shape[1]

        with timed_stage(timer, "encode_device"):
            z_indices, h, _ = self._encode(self.params, x01)

        # route by predicted time at the measured link bandwidth: packed
        # plane bytes are a static function of the latent geometry
        # ((4 planes x 2 rows x int16) x B x Hl x Wl x Cq/4 =
        # 4*B*Hl*Wl*quant_dim), known before any fetch
        n_chunks = len(self.h_coder._chunk_batches(B))
        packed_bytes = 4 * B * int(h.shape[1]) * int(h.shape[2]) \
            * self.spec.quant_dim
        use_dev = self._use_device_encode(packed_bytes, n_chunks)
        self._count_path(use_dev)

        if use_dev:
            t0 = time.perf_counter()
            with timed_stage(timer, "h_rans"):
                h_streams, _ = self.h_coder.compress_device(
                    h, q_idx=0,
                    interpret=jax.default_backend() != "tpu")
            dev_s = time.perf_counter() - t0
            stream_bytes = sum(len(s) for s in h_streams)
            self.router.note_device_encode(dev_s, stream_bytes,
                                           packed_bytes, n_chunks)
            with timed_stage(timer, "z_rans"):
                z_np = jax.device_get(z_indices)
                z_streams = [self._encode_z(
                    z_np[b * n_tiles:(b + 1) * n_tiles].reshape(-1))
                    for b in range(B)]
        else:
            # z_indices / h are live from the routing dispatch above —
            # re-invoking self._encode here would pay the full encoder
            # forward twice on the default path (round-4 advisor finding)
            with timed_stage(timer, "encode_device"):
                chunk_plans = self.h_coder.compress_plan_chunks(h, q_idx=0)

            # the z fetch + z rANS ride a worker thread under the
            # bottleneck chunks' device compute
            def _z_all():
                with timed_stage(timer, "z_rans"):
                    z_np = jax.device_get(z_indices)
                    return [self._encode_z(
                        z_np[b * n_tiles:(b + 1) * n_tiles].reshape(-1))
                        for b in range(B)]

            z_future = self._io.submit(_z_all)

            h_streams: list = [None] * B
            pending = []
            for start, real, packed_dev, _yh in chunk_plans:
                with timed_stage(timer, "fetch"):
                    t0 = time.perf_counter()
                    packed = jax.device_get(packed_dev)  # blocks on THIS chunk
                    self._note_fetch(packed.nbytes, time.perf_counter() - t0)
                pending.append((start, real,
                                self._io.submit(
                                    self.h_coder.encode_packed_many, packed)))
            with timed_stage(timer, "h_rans"):
                for start, real, fut in pending:
                    h_streams[start:start + real] = fut.result()
            z_streams = z_future.result()

        feat_shape_1 = (1, h.shape[1], h.shape[2], h.shape[3])
        token_length = n_tiles * int(z_indices.shape[-1])
        return [{
            "z_bit_stream": z_streams[b],
            "h_bit_stream": h_streams[b],
            "img_shape": (H, W),
            "feat_shape": feat_shape_1,
            "stack_shape": stack_shape,
            "token_length": token_length,
            "z_indices_shape": (n_tiles, int(z_indices.shape[-1])),
        } for b in range(B)]

    def decode_only(self, z_bit_stream, h_bit_stream, img_shape, feat_shape,
                    stack_shape, token_length, z_indices_shape,
                    timer=None, z_coder: str = "rans",
                    coding_batch=None, output: str = "float",
                    **_ignored) -> jax.Array:
        """Returns x_hat (B, H, W, 3) clamped to [-1, 1], or uint8 pixels
        with ``output="u8"`` (converted on device; 4x smaller fetch).

        ``z_coder``: wire format of ``z_bit_stream`` — ``"rans"`` (ours) or
        ``"torchac"`` (reference-produced ``.c2df``).
        ``coding_batch``: the h-stream's coding contract if the file header
        carries one (None = this runtime's default)."""
        if coding_batch is not None:
            coding_batch = int(coding_batch)
            if not (1 <= coding_batch <= 512):
                raise ValueError(f"bad coding_batch: {coding_batch}")
        from ..utils.profiling import timed_stage

        # reference files store torch z_quantized.shape (BT, token_size, 1,
        # n_latent) here (codec_sq_fixbpp.py:860); ours is (BT, n_latent)
        zshape = tuple(int(s) for s in z_indices_shape)
        if len(zshape) == 4:
            zshape = (zshape[0], zshape[3])
        # these fields come from untrusted containers: bound the allocation
        # and require internal consistency before decoding anything
        token_length = int(token_length)
        if not (0 < token_length <= (1 << 24)) or \
                token_length != zshape[0] * zshape[1]:
            raise ValueError(
                f"inconsistent semantic-stream geometry: token_length="
                f"{token_length}, z_indices_shape={tuple(z_indices_shape)}")

        def _z():
            with timed_stage(timer, "z_rans"):
                sym = self._decode_z(z_bit_stream, token_length, z_coder)
                return jnp.asarray(sym.astype(np.int32).reshape(zshape))

        # host-side z coding overlaps the h decode's device round trips
        z_future = self._io.submit(_z)

        # feat_shape carries the pre-transform detail feature (B, H/32, W/32,
        # feat_width); the coded latent has quant_dim channels at the same grid.
        # Reference files store torch NCHW (codec_sq_fixbpp.py:867).
        fs = tuple(int(s) for s in feat_shape)
        if fs[1] == self.spec.feat_width and fs[-1] != self.spec.feat_width:
            fs = (fs[0], fs[2], fs[3], fs[1])
        B, Hf, Wf, _ = fs
        latent_shape = (B, Hf, Wf, self.spec.quant_dim)
        with timed_stage(timer, "h_rans"):
            if self._use_device_entropy(h_bit_stream, latent_shape):
                # fully device-resident: ONE round trip instead of 4
                h_hat = self.h_coder.decompress_device(
                    h_bit_stream, latent_shape, q_idx=0,
                    coding_batch=coding_batch)
            else:
                h_hat = self.h_coder.decompress(
                    h_bit_stream, latent_shape, q_idx=0,
                    coding_batch=coding_batch)
        z_indices = z_future.result()
        dec = self._decode_u8 if output == "u8" else self._decode
        with timed_stage(timer, "decode_device"):
            return dec(self.params, z_indices, h_hat, tuple(stack_shape))

    def decode_only_many(self, enc_results, workers: int = 4) -> list:
        """Concurrent decodes: each request checks out its own rANS decoder,
        so one stream's host coding overlaps another's device round trips.

        Each worker fully materializes its result before taking the next
        request: this bounds the in-flight dispatch backlog to ``workers``
        chains (unbounded async enqueue degrades pathologically on
        remote-dispatch links — measured 75x slower at 32 outstanding
        requests over the dev tunnel; scalar-slice fences don't help there
        because the link evaluates lazily) and matches what a server does
        with each response anyway."""
        from concurrent.futures import ThreadPoolExecutor

        def _one(e):
            x = self.decode_only(**e)
            np.asarray(x)               # full materialization fence
            return x

        with ThreadPoolExecutor(max_workers=workers) as pool:
            return list(pool.map(_one, enc_results))

    def decode_only_batched(self, enc_results, timer=None,
                            output: str = "float") -> jax.Array:
        """Throughput decode for same-shaped streams (e.g. one
        ``encode_only_batched`` output): the 4 autoregressive steps run
        device-BATCHED over all B streams — 4 host syncs total instead of
        4 per image — while the per-image host rANS fans out on threads.
        Returns x_hat (B, H, W, 3)."""
        from ..utils.profiling import timed_stage

        assert enc_results, "empty batch"
        first = enc_results[0]
        B = len(enc_results)
        for e in enc_results:
            assert tuple(e["stack_shape"]) == tuple(first["stack_shape"]), \
                "decode_only_batched needs same-shaped streams"
            # mixing contracts would replay the wrong float trajectory for
            # every non-first stream and decode them to garbage silently
            assert e.get("coding_batch") == first.get("coding_batch"), \
                "decode_only_batched needs a single coding_batch contract"

        n_latent = int(first["z_indices_shape"][-1])

        def _z():
            with timed_stage(timer, "z_rans"):
                outs = [self._decode_z(e["z_bit_stream"], e["token_length"],
                                       e.get("z_coder", "rans"))
                        for e in enc_results]
                return jnp.asarray(np.concatenate(outs).astype(np.int32)
                                   .reshape(-1, n_latent))

        z_future = self._io.submit(_z)

        fs = tuple(int(s) for s in first["feat_shape"])
        if fs[1] == self.spec.feat_width and fs[-1] != self.spec.feat_width:
            fs = (fs[0], fs[2], fs[3], fs[1])
        latent_shape = (1, fs[1], fs[2], self.spec.quant_dim)
        cb = first.get("coding_batch")
        cb = int(cb) if cb is not None else None
        if cb is not None and not (1 <= cb <= 512):
            raise ValueError(f"bad coding_batch: {cb}")
        with timed_stage(timer, "h_rans"):
            h_hat = self.h_coder.decompress_batched(
                [e["h_bit_stream"] for e in enc_results], latent_shape,
                coding_batch=cb)
        z_indices = z_future.result()
        dec = self._decode_u8 if output == "u8" else self._decode
        with timed_stage(timer, "decode_device"):
            return dec(self.params, z_indices, h_hat,
                       tuple(first["stack_shape"]))

    def round_trip_pipelined(self, batches):
        """Two-stage software pipeline over a list of same-shape image
        batches: batch k+1's encode (device pass + host rANS write) runs
        concurrently with batch k's batched decode, so the tunnel RTTs of
        one stage hide behind the device/host work of the other.  Returns
        the list of x_hat batch arrays."""
        from concurrent.futures import ThreadPoolExecutor

        outs = []
        with ThreadPoolExecutor(max_workers=2) as pool:
            enc_f = pool.submit(self.encode_only_batched, batches[0])
            for i in range(len(batches)):
                encs = enc_f.result()
                if i + 1 < len(batches):
                    enc_f = pool.submit(self.encode_only_batched,
                                        batches[i + 1])
                outs.append(self.decode_only_batched(encs))
        return outs

    def encode_decode_many(self, images, original_shapes=None,
                           workers: int = 2):
        """Thread-pipelined round-trips over a list of images: one image's
        host rANS overlaps the next image's device compute (the coders are
        lock-guarded).  Returns a list of (x_hat, bpp_dict, enc_result)."""
        from concurrent.futures import ThreadPoolExecutor
        shapes = original_shapes or [tuple(im.shape[-3:-1]) for im in images]
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return list(pool.map(self.encode_decode, images, shapes))

    def encode_decode(self, x, original_shape: Tuple[int, int]):
        """Round-trip with bpp accounting (reference: codec_sq_fixbpp.py:904-922)."""
        enc_result = self.encode_only(x)
        x_hat = self.decode_only(**enc_result)
        z_bits = len(enc_result["z_bit_stream"]) * 8
        h_bits = len(enc_result["h_bit_stream"]) * 8
        overhead_bits = 8 * 6  # 4 B height/width + 2 B token-stream length
        h, w = original_shape
        bpp_dict = {
            "z_bpp": z_bits / (h * w),
            "h_bpp": h_bits / (h * w),
            "overhead_bpp": overhead_bits / (h * w),
            "total_bpp": (z_bits + h_bits + overhead_bits) / (h * w),
        }
        return x_hat, bpp_dict, enc_result
