"""evaluate CLI: rate-distortion sweep over an image directory.

The reference ships no evaluation tool (its compress CLI's FID flags are
vestigial — reference: compress.py:330-331 never used); this closes that
gap: full-pipeline round-trips (real bitstreams) per image, reporting
bpp / PSNR / MS-SSIM (+ LPIPS when calibrated weights are supplied), as
JSON lines plus a mean summary.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from ..data import list_images, load_image
from ..metrics import ms_ssim, psnr
from ..models import get_padding_size, pad_replicate
from ._common import init_func, load_runtime, progress


def evaluate_dir(rt, dataset_dir, lpips_fn=None, out=sys.stdout):
    import jax.numpy as jnp
    paths = list_images(dataset_dir)
    if not paths:
        raise FileNotFoundError(f"no images in {dataset_dir}")
    sums = {}
    for path in progress(paths, desc="evaluate"):
        img = load_image(path)
        H, W = img.shape[:2]
        pads = get_padding_size(H, W, rt.spec.tile_px)
        x = pad_replicate(jnp.asarray(img)[None], pads)
        x_hat, bpp, _ = rt.encode_decode(x, (H, W))
        x_hat = x_hat[:, :H, :W]
        x_ref = jnp.asarray(img)[None]
        rec = {
            "path": str(path), "hw": [H, W],
            "bpp": round(bpp["total_bpp"], 6),
            "z_bpp": round(bpp["z_bpp"], 6),
            "h_bpp": round(bpp["h_bpp"], 6),
            "psnr": round(float(psnr(x_ref, x_hat)[0]), 4),
        }
        if min(H, W) >= 176:
            rec["ms_ssim"] = round(float(ms_ssim(x_ref, x_hat)[0]), 5)
        if lpips_fn is not None:
            rec["lpips"] = round(float(lpips_fn(x_ref, x_hat)[0]), 5)
        print(json.dumps(rec), file=out, flush=True)
        for k, v in rec.items():
            if isinstance(v, (int, float)) and k != "hw":
                sums.setdefault(k, []).append(v)
    summary = {"type": "summary", "n": len(paths),
               **{f"mean_{k}": round(float(np.mean(v)), 6)
                  for k, v in sums.items()}}
    print(json.dumps(summary), file=out, flush=True)
    return summary


def main(argv=None):
    from ._common import respect_platform_env
    respect_platform_env()
    init_func()
    ap = argparse.ArgumentParser(description="sic_tpu evaluate")
    ap.add_argument("--base_config", type=str, default=None)
    ap.add_argument("--ckpt_path", type=str, default=None)
    ap.add_argument("--dataset_dir", type=str, required=True)
    ap.add_argument("--lpips_lin", type=str, default=None,
                    help="LPIPS calibration heads (torch .pth)")
    ap.add_argument("--lpips_vgg", type=str, default=None,
                    help="torchvision VGG16 state dict")
    ap.add_argument("--quant", choices=["none", "int8"], default=None,
                    help="evaluate the int8 W8A8 serving mode's "
                         "rate-distortion (default: SIC_QUANT env or none)")
    args = ap.parse_args(argv)

    rt, _cfg = load_runtime(args.base_config, args.ckpt_path,
                            quant=args.quant)

    lpips_fn = None
    if args.lpips_lin and not args.lpips_vgg:
        print("[WARN] --lpips_lin without --lpips_vgg: the VGG16 backbone "
              "is UNCALIBRATED (random weights); reported lpips values are "
              "not comparable to the reference's", file=sys.stderr)
    if args.lpips_lin or args.lpips_vgg:
        import jax
        from ..models.lpips import LPIPS, port_lpips_params
        lp = LPIPS()
        dummy = np.zeros((1, 64, 64, 3), np.float32)
        params = lp.init(jax.random.PRNGKey(0), dummy, dummy)
        params = port_lpips_params(params, args.lpips_lin, args.lpips_vgg)
        lpips_fn = jax.jit(lambda a, b: lp.apply(params, a, b))

    evaluate_dir(rt, args.dataset_dir, lpips_fn)


if __name__ == "__main__":
    main()
