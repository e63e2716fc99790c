"""Package the round-4 training artifacts (run after train_r4.py).

Produces everything VERDICT.md r3 item 1 asks to see, through the REAL
user surfaces:

1. exports the held-out eval crops as PNGs;
2. runs the ``sic-evaluate`` CLI (configs/config_small_r4.yaml + the
   trained checkpoint) over them -> rate-distortion JSON lines;
3. runs ``sic-compress`` then ``sic-decompress`` on one held-out image ->
   a real ``.c2df`` from the trained weights + its decoded PNG;
4. copies TRAIN_r04.json / PRETRAIN_VQGAN_r04.json / the reconstruction
   grid into the repo root.

    python benchmarks/finalize_r4_artifacts.py \
        --ckpt /tmp/r4/codec_ckpt --train_json /tmp/r4/TRAIN_r04.json \
        --pretrain_json /tmp/r4/PRETRAIN_VQGAN_r04.json \
        --recon /tmp/r4/recon_r04.png --outdir artifacts_r04
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--train_json", type=str, default="/tmp/r4/TRAIN_r04.json")
    ap.add_argument("--pretrain_json", type=str,
                    default="/tmp/r4/PRETRAIN_VQGAN_r04.json")
    ap.add_argument("--recon", type=str, default="/tmp/r4/recon_r04.png")
    ap.add_argument("--outdir", type=str, default="artifacts_r04")
    ap.add_argument("--config", type=str, default="configs/config_small_r4.yaml")
    ap.add_argument("--n_eval", type=int, default=8)
    ap.add_argument("--tag", type=str, default="r04")
    args = ap.parse_args()

    out = Path(args.outdir)
    (out / "heldout").mkdir(parents=True, exist_ok=True)

    # 1. export held-out crops (same deterministic set train_r4 evaluated)
    from PIL import Image

    from corpus_local import heldout_eval_set, load_corpus
    _, held = load_corpus()
    val_x = heldout_eval_set(held, px=256, n=args.n_eval,
                             procedural_frac=0.0)
    for i, img in enumerate(val_x):
        u8 = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(u8).save(out / "heldout" / f"val{i}.png")

    # 2. sic-evaluate over the held-out set (real bitstreams per image).
    # Subprocess with stdout piped to the file: in-process
    # redirect_stdout failed to capture the CLI's JSON lines (measured
    # round 5 — the CLI resolves its output stream before the redirect),
    # and an fd-level pipe captures regardless.
    import subprocess
    ev_path = out / f"EVAL_{args.tag}.json"
    with open(ev_path, "w") as f:
        subprocess.run(
            [sys.executable, "-m", "sic_tpu.cli.evaluate",
             "--base_config", args.config, "--ckpt_path", args.ckpt,
             "--dataset_dir", str(out / "heldout")],
            stdout=f, check=True, cwd=Path(__file__).resolve().parents[1])
    lines = [json.loads(ln) for ln in ev_path.read_text().splitlines() if ln]
    summary = [ln for ln in lines if ln.get("type") == "summary"][0]
    print("# evaluate summary:", json.dumps(summary), file=sys.stderr)

    # 3. real .c2df from the trained weights, decoded back
    from sic_tpu.cli import compress as comp_cli
    from sic_tpu.cli import decompress as decomp_cli
    (out / "bitstreams").mkdir(exist_ok=True)
    (out / "decoded").mkdir(exist_ok=True)
    comp_cli.main(["--base_config", args.config, "--ckpt_path", args.ckpt,
                   "--dataset_dir", str(out / "heldout"),
                   "--save_dir", str(out)])
    decomp_cli.main(["--base_config", args.config, "--ckpt_path", args.ckpt,
                     "--dataset_dir", str(out / "bitstreams"),
                     "--save_dir", str(out / "decoded")])
    c2dfs = sorted((out / "bitstreams").glob("*.c2df"))
    decs = sorted((out / "decoded").glob("*.png"))
    assert c2dfs and decs, (c2dfs, decs)
    # PSNR of the decoded-from-file pixels vs the source crop
    psnrs = []
    for d in decs:
        src = out / "heldout" / (d.stem + ".png")
        a = np.asarray(Image.open(src), np.float64)
        b = np.asarray(Image.open(d), np.float64)
        mse = float(np.mean((a - b) ** 2))
        psnrs.append(10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9)))
    c2df_report = {
        "n": len(c2dfs),
        "bytes": [c.stat().st_size for c in c2dfs],
        "decoded_psnr": [round(p, 3) for p in psnrs],
        "decoded_psnr_mean": round(float(np.mean(psnrs)), 3),
    }
    (out / f"C2DF_ROUNDTRIP_{args.tag}.json").write_text(json.dumps(c2df_report,
                                                            indent=1))
    print("# c2df roundtrip:", json.dumps(c2df_report), file=sys.stderr)

    # 4. copy run artifacts into the repo (dst keeps the source basename,
    # so round-5 runs land as TRAIN_r05.json etc. without edits here)
    for src in [args.train_json, args.pretrain_json, args.recon]:
        if Path(src).exists():
            shutil.copy(src, Path(src).name)
    print("# artifacts finalized ->", out, file=sys.stderr)


if __name__ == "__main__":
    main()
