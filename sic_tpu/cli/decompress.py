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


def decompress_dir(rt, dataset_dir, save_dir):
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(dataset_dir).glob("*.c2df"))
    for path in progress(files, desc="decompress"):
        enc_result, header = unpack_c2df(path)
        enc_result = sanitize_enc_result_types(enc_result)
        # files without the marker predate this framework: they are
        # reference-produced and torchac-coded (codec_sq_fixbpp.py:861-864)
        x_hat = rt.decode_only(**enc_result,
                               z_coder=header.get("z_coder", "torchac"))
        img = np.asarray(x_hat[0])
        l, r, t, b = header.get("padding", [0, 0, 0, 0])
        H, W = img.shape[:2]
        img = img[t:H - b if b else H, l:W - r if r else W]
        save_png(save_dir / f"{path.stem}.png", img)
    return len(files)


def main(argv=None):
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
                        help="rANS substreams per stream (threaded host coding); default 1 for reference wire parity")
    args = parser.parse_args(argv)

    t0 = time.time()
    rt, _cfg = load_runtime(args.base_config, args.ckpt_path,
                             stream_part=args.stream_part)
    n = decompress_dir(rt, args.dataset_dir, args.save_dir)
    print(f"[OK] decompressed {n} files in {time.time() - t0:.1f}s "
          f"-> {args.save_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
