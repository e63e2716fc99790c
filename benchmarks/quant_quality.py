"""Quality cost of the int8 W8A8 serving mode on TRAINED weights.

Random-weight models overstate quantization error (no learned structure
to damp the cascade), so this harness first trains the tiny codec on the
procedural-texture corpus (the committed convergence recipe,
``train_convergence.py``), then round-trips the held-out val images
through a float runtime and an ``quant="int8"`` runtime built from the
SAME trained params, and reports:

- PSNR(recon, ground truth) in both modes — the number a user cares
  about: how much reconstruction quality the 2x-throughput mode costs;
- PSNR between the two reconstructions (mode agreement);
- bpp in both modes (the quantized encoder shifts symbol statistics).

    python benchmarks/quant_quality.py [--out QUANT_QUALITY_r03.json]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from train_convergence import psnr, run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="QUANT_QUALITY_r03.json")
    ap.add_argument("--steps_per_epoch", type=int, default=24)
    args = ap.parse_args()

    summary = run(steps_per_epoch=args.steps_per_epoch, epochs=(2, 5, 3),
                  batch=2, n_train=16, n_val=4, lr=1e-3, seed=0)
    params, val_x = summary.pop("_trained")

    from sic_tpu.config import tiny_spec
    from sic_tpu.models import CodecRuntime

    spec = tiny_spec()
    rt_f = CodecRuntime(spec, params)
    rt_q = CodecRuntime(spec, params, quant="int8")

    rows = []
    for i in range(val_x.shape[0]):
        x = val_x[i:i + 1]
        xh_f, bpp_f, _ = rt_f.encode_decode(x, x.shape[1:3])
        xh_q, bpp_q, _ = rt_q.encode_decode(x, x.shape[1:3])
        rows.append({
            "psnr_bf16": psnr(np.asarray(xh_f), x),
            "psnr_int8": psnr(np.asarray(xh_q), x),
            "psnr_int8_vs_bf16": psnr(np.asarray(xh_q), np.asarray(xh_f)),
            "bpp_bf16": bpp_f["total_bpp"],
            "bpp_int8": bpp_q["total_bpp"],
        })

    out = {
        "metric": "int8_quality_on_trained_tiny",
        "train_pix_psnr_end": summary["pix_psnr_end"],
        "n_val": len(rows),
        "psnr_bf16": round(float(np.mean([r["psnr_bf16"] for r in rows])), 3),
        "psnr_int8": round(float(np.mean([r["psnr_int8"] for r in rows])), 3),
        "psnr_delta": round(float(np.mean(
            [r["psnr_bf16"] - r["psnr_int8"] for r in rows])), 3),
        "psnr_mode_agreement": round(float(np.mean(
            [r["psnr_int8_vs_bf16"] for r in rows])), 3),
        "bpp_bf16": round(float(np.mean([r["bpp_bf16"] for r in rows])), 5),
        "bpp_int8": round(float(np.mean([r["bpp_int8"] for r in rows])), 5),
        "per_image": [{k: round(float(v), 3) for k, v in r.items()}
                      for r in rows],
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "per_image"}))


if __name__ == "__main__":
    main()
