"""compress CLI: images -> searchable ``.c2df`` bitstreams + vector index.

Same surface and output layout as the reference driver
(reference: src/compress.py:203-333): per image pad-to-256 (replicate),
``encode_only``, CLIP embed + u8/zstd pack, ``pack_c2df`` into
``save_dir/bitstreams``, raw clip vecs into ``save_dir/clip_vecs``, and a
flat-IP index into ``save_dir/faiss``.  The torch DDP rank machinery
(compress.py:33-55) is replaced by jit-internal batch sharding; one process
drives the whole mesh.
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


def compress_dir(rt, clip_codec, dataset_dir, save_dir, tile_px: int = 256,
                 batch_size: int = 8):
    """Images are bucketed by padded shape and encoded in device batches
    (one pass + one fetch per batch, per-image bitstreams) — the TPU
    counterpart of the reference's one-image-per-step DDP loop."""
    save_dir = Path(save_dir)
    bit_dir = save_dir / "bitstreams"
    clip_dir = save_dir / "clip_vecs"
    index_dir = save_dir / "faiss"
    for d in (bit_dir, clip_dir, index_dir):
        d.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp
    paths = list_images(dataset_dir)
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

    if records:  # rank-0 epilogue counterpart (reference: compress.py:295-306)
        db = VectorIndex(dim=records[0][0].shape[0])
        for vec, doc_id in records:
            db.add(vec, doc_id)
        db.persist(index_dir, meta={"dim": db.dim, "metric": "ip",
                                    "model_id": clip_codec.model_id})
    return len(records)


def main(argv=None):
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
    args = parser.parse_args(argv)

    t0 = time.time()
    rt, _cfg = load_runtime(args.base_config, args.ckpt_path)
    clip_codec = load_clip_codec(args.clip_ckpt, args.bpe_path)
    n = compress_dir(rt, clip_codec, args.dataset_dir, args.save_dir,
                     batch_size=args.batch_size)
    print(f"[OK] compressed {n} images in {time.time() - t0:.1f}s "
          f"-> {args.save_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
