"""search CLI: query-text / query-image / query-c2df over a built index.

Same subcommand surface and JSON stdout as the reference
(reference: src/search.py:126-175).  ``query-c2df`` needs no model — the
query vector is decoded straight from the bitstream's clip payload
(search.py:24-41).
"""
from __future__ import annotations

import argparse
import json
import sys
import traceback
from pathlib import Path

import numpy as np

from ..container import unpack_c2df
from ..retrieval import VectorIndex, decode_clip_stream
from ._common import load_clip_codec


def encode_c2df_query(c2df_path) -> np.ndarray:
    enc_result, _ = unpack_c2df(c2df_path)
    if "clip_stream" not in enc_result or "clip_meta" not in enc_result:
        raise ValueError(
            f"{c2df_path} has no clip_stream/clip_meta; cannot search")
    return decode_clip_stream(enc_result["clip_stream"],
                              enc_result["clip_meta"])


def do_search(q, index: VectorIndex, topk: int = 10):
    scores, ids = index.search(q, k=topk)
    out = []
    for score, i in zip(scores[0], ids[0]):
        if i < 0:
            continue
        out.append((index.ids[int(i)], float(score)))
    return out


def main(argv=None):
    from ._common import respect_platform_env
    respect_platform_env()
    ap = argparse.ArgumentParser(
        description="query-text / query-image / query-c2df")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ap_qt = sub.add_parser("query-text", help="searching with text")
    ap_qt.add_argument("--index_dir", type=Path, required=True)
    ap_qt.add_argument("--text", type=str, required=True)
    ap_qt.add_argument("--topk", type=int, default=10)
    ap_qt.add_argument("--clip_ckpt", type=str, default=None)
    ap_qt.add_argument("--bpe_path", type=str, default=None)

    ap_qi = sub.add_parser("query-image", help="searching with image")
    ap_qi.add_argument("--index_dir", type=Path, required=True)
    ap_qi.add_argument("--image", type=Path, required=True)
    ap_qi.add_argument("--topk", type=int, default=10)
    ap_qi.add_argument("--clip_ckpt", type=str, default=None)
    ap_qi.add_argument("--bpe_path", type=str, default=None)

    ap_qc = sub.add_parser("query-c2df", help="searching with .c2df")
    ap_qc.add_argument("--index_dir", type=Path, required=True)
    ap_qc.add_argument("--c2df", type=Path, required=True)
    ap_qc.add_argument("--topk", type=int, default=10)

    args = ap.parse_args(argv)
    try:
        index, meta = VectorIndex.load(args.index_dir)
        if args.cmd == "query-text":
            cc = load_clip_codec(args.clip_ckpt, args.bpe_path)
            q = cc.text_to_unit_vec(args.text)[0]
        elif args.cmd == "query-image":
            cc = load_clip_codec(args.clip_ckpt, args.bpe_path)
            from ..data import load_image
            q = cc.image_to_unit_vec(load_image(args.image))
        elif args.cmd == "query-c2df":
            q = encode_c2df_query(args.c2df)
        else:
            raise ValueError(f"Unknown behavior: {args.cmd}")

        results = do_search(q, index, topk=args.topk)
        print(json.dumps([{"path": p, "score": s} for p, s in results],
                         ensure_ascii=False, indent=2))
    except Exception as e:
        print(f"[ERROR] {e}")
        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    main()
