"""compress CLI: images -> searchable ``.c2df`` bitstreams + vector index.

Same surface and output layout as the reference driver
(reference: src/compress.py:203-333): per image pad-to-256 (replicate),
``encode_only``, CLIP embed + u8/zstd pack, ``pack_c2df`` into
``save_dir/bitstreams``, raw clip vecs into ``save_dir/clip_vecs``, and a
flat-IP index into ``save_dir/faiss``.

Parallelism is two-level: within one host, jit-internal batch sharding
drives every local chip from a single process (replacing per-rank DDP model
replicas, compress.py:33-55); across hosts, torchrun-style WORLD_SIZE/RANK
sharding splits the input list, every process writes its shard to the
shared ``save_dir``, and host 0 merges the index after a barrier
(compress.py:206-246, 293-306 — see sic_tpu.parallel.multihost).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from ..container import pack_c2df
from ..data import list_images, load_image
from ..models import get_padding_size, pad_replicate
from ..retrieval import VectorIndex
from ._common import init_func, load_clip_codec, load_runtime, progress


def build_index_from_saved(save_dir, model_id: str = "") -> int:
    """Host-0 epilogue: rebuild the flat-IP index from every clip vec saved
    under ``save_dir`` (all ranks' shards) — the reference's rank-0 merge,
    scan order sorted-by-name (reference: compress.py:295-306)."""
    save_dir = Path(save_dir)
    bit_dir, clip_dir, index_dir = (save_dir / "bitstreams",
                                    save_dir / "clip_vecs",
                                    save_dir / "faiss")
    npys = sorted(clip_dir.glob("*.npy"))
    if not npys:
        return 0
    db = None
    count = 0
    for npy in npys:
        doc_id = bit_dir / f"{npy.stem}.c2df"
        if not doc_id.exists():
            continue
        vec = np.load(npy)
        if db is None:
            db = VectorIndex(dim=int(vec.shape[0]))
        db.add(vec, str(doc_id))
        count += 1
    if db is not None:
        db.persist(index_dir, meta={"dim": db.dim, "metric": "ip",
                                    "model_id": model_id})
    return count


def compress_dir(rt, clip_codec, dataset_dir, save_dir, tile_px: int = 256,
                 batch_size: int = 8, shard=(0, 1), build_index: bool = True):
    """Images are bucketed by padded shape and encoded in device batches
    (one pass + one fetch per batch, per-image bitstreams) — the TPU
    counterpart of the reference's one-image-per-step DDP loop.

    ``shard=(rank, world)`` processes every ``world``-th image starting at
    ``rank`` (the DistributedSampler split); pass ``build_index=False`` on
    multi-process runs and let host 0 call :func:`build_index_from_saved`
    after the barrier."""
    save_dir = Path(save_dir)
    bit_dir = save_dir / "bitstreams"
    clip_dir = save_dir / "clip_vecs"
    index_dir = save_dir / "faiss"
    for d in (bit_dir, clip_dir, index_dir):
        d.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp

    from ..parallel.multihost import shard_list
    paths = shard_list(list_images(dataset_dir), *shard)
    records = []
    buckets = {}

    def flush(shape):
        batch = buckets.pop(shape, [])
        if not batch:
            return
        x = jnp.concatenate([b[2] for b in batch], axis=0)
        enc_results = rt.encode_only_batched(x)
        for (path, img, _), enc_result in zip(batch, enc_results):
            H, W = img.shape[:2]
            pads = get_padding_size(H, W, tile_px)
            clip_vec = clip_codec.image_to_unit_vec(img)
            clip_stream, clip_meta = clip_codec.quantize_u8_and_compress(clip_vec)
            enc_result["clip_stream"] = clip_stream
            enc_result["clip_meta"] = clip_meta
            header = {
                "version": 2,
                "model_id": clip_meta.get("model_id", ""),
                "embed_dim": int(clip_meta.get("dim", 0)),
                "quant_type": clip_meta.get("quant", "u8_symmetric_-1_1"),
                "image_hw": [int(H), int(W)],
                "padding": [int(p) for p in pads],
                # wire format of the semantic stream; absent in
                # reference-produced files (which are torchac-coded)
                "z_coder": rt.z_format,
                # h-stream coding contract: the decode-side trajectory must
                # replay at this coding batch (see BottleneckCoder)
                "coding_batch": rt.h_coder.coding_batch,
            }
            out_path = bit_dir / f"{path.stem}.c2df"
            out_path.write_bytes(pack_c2df(enc_result, header))
            np.save(clip_dir / f"{path.stem}.npy", clip_vec)
            records.append((clip_vec, str(out_path)))

    for path in progress(paths, desc="compress"):
        img = load_image(path)                       # (H, W, 3) in [-1, 1]
        H, W = img.shape[:2]
        pads = get_padding_size(H, W, tile_px)
        x = pad_replicate(jnp.asarray(img)[None], pads)
        shape = x.shape[1:3]
        buckets.setdefault(shape, []).append((path, img, x))
        if len(buckets[shape]) >= batch_size:
            flush(shape)
    for shape in list(buckets):
        flush(shape)

    if build_index:  # single-process epilogue; multi-process defers to host 0
        build_index_from_saved(save_dir, model_id=clip_codec.model_id)
    return len(records)


def main(argv=None):
    from ._common import respect_platform_env
    respect_platform_env()
    init_func()
    parser = argparse.ArgumentParser(description="sic_tpu compress")
    parser.add_argument("--base_config", type=str, help="path to base config")
    parser.add_argument("--ckpt_path", type=str, help="path to checkpoint")
    parser.add_argument("--dataset_dir", type=str, required=True)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--clip_ckpt", type=str, default=None,
                        help="open_clip torch checkpoint for CLIP weights")
    parser.add_argument("--bpe_path", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="device batch per padded-shape bucket")
    parser.add_argument("--gpu_idx", type=int, default=0,
                        help="accepted for surface parity; devices are "
                             "managed by the JAX mesh")
    parser.add_argument("--stream_part", type=int, default=None,
                        help="rANS substreams per stream (default 4: threaded host "
                             "coding + on-device decode; still "
                             "reference-decodable — the flag byte carries "
                             "the part count)")
    parser.add_argument("--quant", choices=["none", "int8"],
                        default=None,
                        help="serve the frozen towers W8A8 int8 on the MXU (2x bf16 peak; streams stay cross-mode decodable); default: SIC_QUANT env or none")
    parser.add_argument("--world_size", type=int, default=None,
                        help="number of processes (default: WORLD_SIZE env)")
    parser.add_argument("--rank", type=int, default=None,
                        help="this process's rank (default: RANK env)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 "
                             "(default: MASTER_ADDR:MASTER_PORT env)")
    args = parser.parse_args(argv)

    from ..parallel.multihost import barrier, setup_distributed
    rank, world = setup_distributed(args.rank, args.world_size,
                                    args.coordinator)

    t0 = time.time()
    rt, _cfg = load_runtime(args.base_config, args.ckpt_path,
                             stream_part=args.stream_part,
                             quant=args.quant)
    clip_codec = load_clip_codec(args.clip_ckpt, args.bpe_path)
    n = compress_dir(rt, clip_codec, args.dataset_dir, args.save_dir,
                     batch_size=args.batch_size, shard=(rank, world),
                     build_index=(world == 1))
    if world > 1:
        barrier("compress_done")      # all shards on disk
        if rank == 0:
            build_index_from_saved(args.save_dir,
                                   model_id=clip_codec.model_id)
        barrier("index_done")         # keep ranks alive until the merge lands
    print(f"[OK] rank {rank}/{world} compressed {n} images in "
          f"{time.time() - t0:.1f}s -> {args.save_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
