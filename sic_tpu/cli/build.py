"""build CLI: construct a vector index from ``.c2df`` files or raw images.

Same subcommands as the reference (reference: src/build.py:245-307):
``build`` (decode clip streams from a c2df dir — no model needed),
``build-images`` (batched CLIP encode), ``download`` (Picsum corpus
bootstrap; requires network egress).
"""
from __future__ import annotations

import argparse
import random
import sys
import traceback
from pathlib import Path

import numpy as np

from ..container import unpack_c2df
from ..data import list_images
from ..retrieval import VectorIndex, decode_clip_stream, preprocess_image
from ._common import load_clip_codec, progress


def build_index_from_c2df_dir(c2df_dir, index_dir) -> int:
    """(reference: build.py:71-103)"""
    files = sorted(Path(c2df_dir).glob("*.c2df"))
    if not files:
        raise FileNotFoundError(f"no .c2df files in {c2df_dir}")
    index = None
    model_id = ""
    for path in progress(files, desc="build"):
        enc_result, _ = unpack_c2df(path)
        vec = decode_clip_stream(enc_result["clip_stream"],
                                 enc_result["clip_meta"])
        model_id = (enc_result.get("clip_meta") or {}).get("model_id", model_id)
        if index is None:
            index = VectorIndex(dim=vec.shape[0])
        index.add(vec, str(path))
    index.persist(index_dir, meta={"dim": index.dim, "metric": "ip",
                                   "model_id": model_id})
    return index.ntotal


def build_index_from_image_dir(image_dir, index_dir, clip_ckpt=None,
                               bpe_path=None, batch_size: int = 32,
                               exts=None, limit=None, random_pick=False,
                               seed=None) -> int:
    """(reference: build.py:161-240)"""
    paths = list_images(image_dir, exts or
                        (".jpg", ".jpeg", ".png", ".webp", ".bmp"))
    if not paths:
        raise FileNotFoundError(f"no images in {image_dir}")
    if limit is not None and limit < len(paths):
        if random_pick:
            rng = random.Random(seed)
            paths = rng.sample(paths, limit)
        else:
            paths = paths[:limit]

    cc = load_clip_codec(clip_ckpt, bpe_path)
    index = VectorIndex(dim=cc.spec.embed_dim)
    for s in progress(range(0, len(paths), batch_size),
                      total=(len(paths) + batch_size - 1) // batch_size,
                      desc="build-images"):
        chunk = paths[s:s + batch_size]
        from PIL import Image
        batch = np.stack([preprocess_image(Image.open(p))
                          for p in chunk])
        vecs = cc.images_to_unit_vecs(batch)
        index.add_batch(vecs, [str(p) for p in chunk])
    index.persist(index_dir, meta={"dim": index.dim, "metric": "ip",
                                   "model_id": cc.model_id})
    return index.ntotal


def download_random_picsum(need: int, out_dir, size="512x512", seed=None,
                           timeout=20) -> int:
    """Picsum corpus bootstrap (reference: build.py:137-158).  Needs egress."""
    import urllib.request
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if "x" in size:
        w, h = size.split("x")
    else:
        w = h = size
    rng = random.Random(seed)
    got = 0
    for i in range(need):
        sid = rng.randint(0, 10 ** 9)
        url = f"https://picsum.photos/seed/{sid}/{int(w)}/{int(h)}"
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r:
                (out_dir / f"picsum_{sid}.jpg").write_bytes(r.read())
            got += 1
        except Exception as e:
            print(f"[WARN] download failed: {e}", file=sys.stderr)
    return got


def main(argv=None):
    from ._common import respect_platform_env
    respect_platform_env()
    ap = argparse.ArgumentParser(
        description="SIC build tool (build / build-images / download)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ap_dl = sub.add_parser("download")
    ap_dl.add_argument("--out_dir", type=Path, required=True)
    ap_dl.add_argument("--desired", type=int, required=True)
    ap_dl.add_argument("--size", type=str, default="512x512")
    ap_dl.add_argument("--seed", type=int, default=None)
    ap_dl.add_argument("--timeout", type=int, default=20)

    ap_build = sub.add_parser("build")
    ap_build.add_argument("--c2df_dir", type=Path, required=True)
    ap_build.add_argument("--index_dir", type=Path, required=True)

    ap_bimg = sub.add_parser("build-images")
    ap_bimg.add_argument("--image_dir", type=Path, required=True)
    ap_bimg.add_argument("--index_dir", type=Path, required=True)
    ap_bimg.add_argument("--clip_ckpt", type=str, default=None)
    ap_bimg.add_argument("--bpe_path", type=str, default=None)
    ap_bimg.add_argument("--batch_size", type=int, default=32)
    ap_bimg.add_argument("--exts", type=str, default="jpg,jpeg,png,webp,bmp")
    ap_bimg.add_argument("--limit", type=int, default=None)
    ap_bimg.add_argument("--random", action="store_true")
    ap_bimg.add_argument("--seed", type=int, default=None)

    args = ap.parse_args(argv)
    try:
        if args.cmd == "download":
            have = len(list_images(args.out_dir)) if args.out_dir.exists() else 0
            need = max(0, args.desired - have)
            if need <= 0:
                print(f"[INFO] already have {have} images")
                return
            got = download_random_picsum(need, args.out_dir, args.size,
                                         args.seed, args.timeout)
            print(f"[OK] downloaded {got} images (total {have + got})")
        elif args.cmd == "build":
            n = build_index_from_c2df_dir(args.c2df_dir, args.index_dir)
            print(f"[OK] built index over {n} bitstreams -> {args.index_dir}")
        elif args.cmd == "build-images":
            exts = tuple("." + e.strip().lstrip(".")
                         for e in args.exts.split(",") if e.strip())
            n = build_index_from_image_dir(
                args.image_dir, args.index_dir, args.clip_ckpt, args.bpe_path,
                batch_size=args.batch_size, exts=exts, limit=args.limit,
                random_pick=args.random, seed=args.seed)
            print(f"[OK] built index over {n} images -> {args.index_dir}")
    except Exception as e:
        print(f"[ERROR] {e}")
        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    main()
