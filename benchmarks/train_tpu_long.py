"""Long-run ON-TPU training: from scratch to a WORKING tiny compressor.

Extends the convergence proof (train_convergence.py) from "loss decreases"
to "the trained artifact compresses": the tiny codec trains through all
three reference stages ON THE TPU (reference schedule:
codec_sq_fixbpp.py:523-647), the final params are saved as an orbax
checkpoint, and the checkpoint is then evaluated through the REAL
deployment path — `CodecRuntime.encode_only` -> bitstream bytes ->
`decode_only` — on held-out textures, reporting measured bpp (from actual
stream bytes, not the training proxy) and PSNR, side by side with JPEG at
the closest achievable size (PIL quality sweep).

    python benchmarks/train_tpu_long.py [--out TRAIN_LONG_r03.json]
        [--ckpt_out checkpoints/tiny_textures] [--recon_dir recon/]
        [--cpu] [--batch 16] [--steps_per_epoch 60]

Outputs one JSON document with the training curves (feat loss, val-bpp
trajectory, controller moves, pix PSNR) and the deployment eval
(per-image bpp / PSNR / JPEG-matched PSNR), plus optional reconstruction
PNGs for eyeballing.
"""
from __future__ import annotations

import argparse
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from train_convergence import FreshSampler, make_corpus, psnr, texture


def jpeg_at_size(img_u8: np.ndarray, target_bytes: int):
    """Smallest-|size - target| JPEG for the image; returns
    (decoded float[-1,1], actual_bytes, quality).  PIL's quality floor
    (q=1) bounds how low JPEG can go — the actual bytes are reported so a
    mismatch is visible rather than hidden."""
    from PIL import Image
    best = None
    for q in range(1, 96):
        buf = io.BytesIO()
        Image.fromarray(img_u8).save(buf, format="JPEG", quality=q)
        size = buf.tell()
        score = abs(size - target_bytes)
        if best is None or score < best[0]:
            buf.seek(0)
            dec = np.asarray(Image.open(buf).convert("RGB"), np.float32)
            best = (score, dec / 127.5 - 1.0, size, q)
        if size > target_bytes * 2 and q > 8:
            break
    return best[1], best[2], best[3]


def deployment_eval(spec, params, n_images: int, recon_dir=None,
                    seed: int = 777):
    """Held-out textures through the REAL pipeline: encode_only ->
    bytes -> decode_only.  bpp is computed from actual z+h stream bytes
    (the payload a c2df carries for reconstruction; clip/index side-data
    excluded for rate fairness vs JPEG)."""
    import jax.numpy as jnp

    from sic_tpu.models import CodecRuntime

    rt = CodecRuntime(spec, params)
    rows = []
    for i in range(n_images):
        gt = texture(seed + i, px=256)                 # unseen seed range
        enc = rt.encode_only(jnp.asarray(gt[None]) )
        stream_bytes = len(enc["z_bit_stream"]) + len(enc["h_bit_stream"])
        bpp = 8.0 * stream_bytes / (256 * 256)
        x_hat = np.asarray(rt.decode_only(**enc))[0]
        p = psnr(x_hat, gt)

        gt_u8 = np.clip((gt + 1.0) * 127.5, 0, 255).astype(np.uint8)
        jdec, jbytes, jq = jpeg_at_size(gt_u8, stream_bytes)
        jp = psnr(jdec, gt)
        rows.append({"bpp": round(bpp, 4), "bytes": stream_bytes,
                     "psnr": round(p, 3),
                     "jpeg_bytes": jbytes, "jpeg_quality": jq,
                     "jpeg_psnr": round(jp, 3)})
        if recon_dir:
            from PIL import Image
            d = Path(recon_dir)
            d.mkdir(parents=True, exist_ok=True)
            rec_u8 = np.clip((x_hat + 1.0) * 127.5, 0, 255).astype(np.uint8)
            Image.fromarray(gt_u8).save(d / f"val{i}_gt.png")
            Image.fromarray(rec_u8).save(d / f"val{i}_sic.png")
        print(f"# eval {i}: {stream_bytes} B ({bpp:.3f} bpp) "
              f"PSNR {p:.2f} dB | JPEG {jbytes} B PSNR {jp:.2f} dB",
              file=sys.stderr, flush=True)
    return rows


def run(steps_per_epoch: int, epochs, batch: int, lr: float, band,
        seed: int, ckpt_out, recon_dir, n_eval: int, cpu: bool):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from sic_tpu.config import tiny_spec
    from sic_tpu.train import (ImgLossCfg, StageSpec, Trainer,
                               TrainingStrategy, create_train_state)

    dev = jax.devices()[0]
    print(f"# training on {dev.device_kind}", file=sys.stderr, flush=True)

    lmbda = tuple(2.0 ** i for i in range(-4, 7))
    mid = len(lmbda) // 2
    strategy = TrainingStrategy(
        learning_rate=lr, start_epoch=0,
        stages=(StageSpec(epochs[0], mid, lmbda, 10.0, 0.0),
                StageSpec(epochs[1], mid, lmbda, band[1], band[0]),
                StageSpec(epochs[2], mid, lmbda, band[1], band[0])))
    disc_start = (epochs[0] + epochs[1] + 1) * steps_per_epoch
    spec = tiny_spec()
    codec, state, steps = create_train_state(
        spec, strategy, jax.random.PRNGKey(seed),
        img_cfg=ImgLossCfg(disc_ndf=16, disc_num_layers=2,
                           perceptual="msssim", disc_start=disc_start))

    _, val_x = make_corpus(0, 8)
    sampler = FreshSampler(seed)
    trainer = Trainer(codec, state, steps, strategy)
    feat_step, pix_step, eval_step = steps

    hist = {"feat_loss": [], "val_bpp": [], "lmbda_idx": [], "stage": [],
            "pix_psnr": [], "controller_moves": [], "step_s": []}

    def val_psnr() -> float:
        out = trainer.codec.apply(trainer.state.params,
                                  jnp.asarray(val_x[:2]),
                                  need_full_decode=True)
        return psnr(np.asarray(out["x_hat"]), val_x[:2])

    t0 = time.time()
    for _ in range(sum(epochs)):
        epoch = int(trainer.state.epoch_for_strategy)
        stage, sspec = strategy.stage_at(epoch)
        step_fn = pix_step if stage == "pix" else feat_step
        if stage == "pix" and not hist["pix_psnr"]:
            hist["pix_psnr"].append(val_psnr())
        te = time.time()
        for bi in range(steps_per_epoch):
            xb = sampler.batch(batch)
            ts = time.time()
            trainer.state, logs = step_fn(trainer.state, jnp.asarray(xb))
            key = ("train/ae_loss" if stage == "pix"
                   else "train/align_loss")
            loss = float(logs[key])          # materializes: honest step fence
            hist["step_s"].append(time.time() - ts)
            if stage != "pix":
                hist["feat_loss"].append(loss)
        vals = [eval_step(trainer.state, jnp.asarray(val_x[i:i + batch]))
                for i in range(0, len(val_x), batch)]
        vbpp = float(np.mean([float(v["val/bpp"]) for v in vals]))
        idx_before = int(trainer.state.lmbda_idx)
        trainer.end_of_epoch({"val/bpp": vbpp})
        idx_after = (int(trainer.state.lmbda_idx)
                     if strategy.stage_at(epoch + 1)[0] == stage else None)
        hist["val_bpp"].append(vbpp)
        hist["lmbda_idx"].append(idx_before)
        hist["stage"].append(stage)
        if idx_after is not None and stage != "feat_wo_bpp":
            want = (1 if vbpp > sspec.bpp_upper
                    else -1 if vbpp < sspec.bpp_lower else 0)
            n_lmbda = int(np.asarray(trainer.state.lmbda_list).size)
            at_clamp = ((want > 0 and idx_before >= n_lmbda - 1)
                        or (want < 0 and idx_before <= 0))
            hist["controller_moves"].append(
                {"epoch": epoch, "val_bpp": round(vbpp, 5), "want": want,
                 "got": idx_after - idx_before, "at_clamp": bool(at_clamp)})
        print(f"# epoch {epoch} [{stage}] val_bpp={vbpp:.4f} "
              f"lmbda_idx={idx_before}"
              + (f"->{idx_after}" if idx_after is not None else "")
              + f" ({time.time() - te:.1f}s)", file=sys.stderr, flush=True)
    hist["pix_psnr"].append(val_psnr())
    train_wall = time.time() - t0

    params = {"params": trainer.state.params["params"]}
    if ckpt_out:
        from sic_tpu.checkpoint import save_codec_params
        path = save_codec_params(Path(ckpt_out).resolve(), params)
        print(f"# checkpoint -> {path}", file=sys.stderr, flush=True)

    eval_rows = deployment_eval(spec, params, n_eval, recon_dir)

    k = max(3, len(hist["feat_loss"]) // 8)
    total_steps = sum(epochs) * steps_per_epoch
    summary = {
        "metric": "tiny_tpu_long_train",
        "device": dev.device_kind,
        "steps_per_epoch": steps_per_epoch, "epochs": list(epochs),
        "total_train_steps": total_steps, "batch": batch, "px": 256,
        "lr": lr, "band": list(band),
        "feat_loss_first": round(float(np.mean(hist["feat_loss"][:k])), 4),
        "feat_loss_last": round(float(np.mean(hist["feat_loss"][-k:])), 4),
        "val_bpp_trajectory": [round(b, 4) for b in hist["val_bpp"]],
        "lmbda_idx_trajectory": hist["lmbda_idx"],
        "controller_moves": hist["controller_moves"],
        "controller_correct": all(
            m["got"] == m["want"]
            or (m["want"] != 0 and m["got"] == 0 and m["at_clamp"])
            for m in hist["controller_moves"]),
        "pix_psnr_start": round(hist["pix_psnr"][0], 3),
        "pix_psnr_end": round(hist["pix_psnr"][-1], 3),
        "pix_psnr_improved": hist["pix_psnr"][-1] > hist["pix_psnr"][0],
        "step_s_p50": round(float(np.median(hist["step_s"])), 4),
        "train_wall_s": round(train_wall, 1),
        "deployment_eval": eval_rows,
        "deploy_psnr_mean": round(float(np.mean(
            [r["psnr"] for r in eval_rows])), 3),
        "deploy_bpp_mean": round(float(np.mean(
            [r["bpp"] for r in eval_rows])), 4),
        "jpeg_matched_psnr_mean": round(float(np.mean(
            [r["jpeg_psnr"] for r in eval_rows])), 3),
        "beats_jpeg_at_matched_rate": bool(
            np.mean([r["psnr"] for r in eval_rows])
            > np.mean([r["jpeg_psnr"] for r in eval_rows])),
    }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="TRAIN_LONG_r03.json")
    ap.add_argument("--ckpt_out", type=str, default=None)
    ap.add_argument("--recon_dir", type=str, default=None)
    ap.add_argument("--steps_per_epoch", type=int, default=60)
    ap.add_argument("--epochs", type=int, nargs=3, default=(4, 12, 8))
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--band", type=float, nargs=2, default=(0.02, 0.065))
    ap.add_argument("--n_eval", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    summary = run(args.steps_per_epoch, tuple(args.epochs), args.batch,
                  args.lr, tuple(args.band), args.seed, args.ckpt_out,
                  args.recon_dir, args.n_eval, args.cpu)
    Path(args.out).write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
