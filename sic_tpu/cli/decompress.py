"""decompress CLI: ``.c2df`` bitstreams -> PNG reconstructions.

(reference: src/decompress.py:79-140 — unpack, decode_only, negative-pad
crop, save.)
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from ..container import sanitize_enc_result_types, unpack_c2df
from ._common import init_func, load_runtime, progress, save_png


def _crop_and_save(save_dir, stem, img, header):
    l, r, t, b = header.get("padding", [0, 0, 0, 0])
    H, W = img.shape[:2]
    img = img[t:H - b if b else H, l:W - r if r else W]
    save_png(Path(save_dir) / f"{stem}.png", img)


def decompress_dir(rt, dataset_dir, save_dir, batch_size: int = 8):
    """Same-shape streams are decoded in device-batched groups (the 4
    autoregressive steps run once per group, not once per file) — the
    decode dual of compress_dir's shape-bucketed batching."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(dataset_dir).glob("*.c2df"))
    buckets = {}

    def flush(key):
        group = buckets.pop(key, [])
        if not group:
            return
        if len(group) == 1 or key is None:
            for stem, enc, header in group:
                # u8 conversion happens on device; the fetch is 4x smaller
                x = rt.decode_only(**enc, output="u8")
                _crop_and_save(save_dir, stem, np.asarray(x[0]), header)
            return
        x = rt.decode_only_batched([enc for _, enc, _ in group], output="u8")
        for i, (stem, _enc, header) in enumerate(group):
            _crop_and_save(save_dir, stem, np.asarray(x[i]), header)

    for path in progress(files, desc="decompress"):
        enc_result, header = unpack_c2df(path)
        enc_result = sanitize_enc_result_types(enc_result)
        enc_result["z_coder"] = header.get("z_coder", "torchac")
        # the h-stream coding contract the file was written under (the
        # decode trajectory must replay at the same coding batch).  A file
        # without the marker predates the contract: every pre-contract
        # writer — the reference (compress.py:209 batch_size=1) and older
        # sic_tpu encoders on the per-file path — ran the coding chain at
        # the file's own batch of 1, so that IS its trajectory; assuming
        # the new default instead could silently desync bf16 decodes.
        enc_result["coding_batch"] = int(header.get("coding_batch", 1))
        key = (tuple(enc_result["stack_shape"]),
               tuple(enc_result["feat_shape"]),
               int(enc_result["token_length"]),
               enc_result["coding_batch"])
        buckets.setdefault(key, []).append((path.stem, enc_result, header))
        if len(buckets[key]) >= batch_size:
            flush(key)
    for key in list(buckets):
        flush(key)
    return len(files)


def main(argv=None):
    from ._common import respect_platform_env
    respect_platform_env()
    init_func()
    parser = argparse.ArgumentParser(description="sic_tpu decompress")
    parser.add_argument("--base_config", type=str, help="path to base config")
    parser.add_argument("--ckpt_path", type=str, help="path to checkpoint")
    parser.add_argument("--dataset_dir", type=str, required=True,
                        help="directory of .c2df files")
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--gpu_idx", type=int, default=0,
                        help="accepted for surface parity")
    parser.add_argument("--stream_part", type=int, default=None,
                        help="rANS substreams per stream (default 4: threaded host "
                             "coding + on-device decode; still "
                             "reference-decodable — the flag byte carries "
                             "the part count)")
    parser.add_argument("--quant", choices=["none", "int8"],
                        default=None,
                        help="serve the frozen towers W8A8 int8 on the MXU (2x bf16 peak; streams stay cross-mode decodable); default: SIC_QUANT env or none")
    args = parser.parse_args(argv)

    t0 = time.time()
    rt, _cfg = load_runtime(args.base_config, args.ckpt_path,
                             stream_part=args.stream_part,
                             quant=args.quant)
    n = decompress_dir(rt, args.dataset_dir, args.save_dir)
    print(f"[OK] decompressed {n} files in {time.time() - t0:.1f}s "
          f"-> {args.save_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
