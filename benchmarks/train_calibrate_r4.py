"""Rate-response calibration for the round-4 mid-scale training run.

Measures the equilibrium val-bpp as a function of lambda for the
``small_spec`` codec on the real-image corpus (corpus_local.py), so the
round-4 band + lambda ladder can be chosen where lambda actually has
rate leverage (VERDICT.md round 3: the tiny-scale band could not be
*held* because a x2 lambda ladder out-jumps any narrow band; the
reference's own stage-2 ladders step ~4%% — config_qp3_256train.yaml).

One run, no recompiles: feat warmup, then pix-stage segments at a
ladder of fixed lambdas (lambda is a traced scalar).  Reports per-segment
tail-mean val bpp + PSNR.

    python benchmarks/train_calibrate_r4.py --out CALIB_r04.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sic_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from corpus_local import CropSampler, heldout_eval_set, load_corpus
from train_convergence import psnr


def run(feat_steps: int, seg_steps: int, lambdas, batch: int, lr: float,
        seed: int, px: int = 256):
    import jax
    import jax.numpy as jnp

    from sic_tpu.config import small_spec
    from sic_tpu.train import (ImgLossCfg, StageSpec, TrainingStrategy,
                               create_train_state)

    spec = small_spec()
    lam_list = tuple(lambdas)
    strategy = TrainingStrategy(
        learning_rate=lr, start_epoch=0,
        stages=(StageSpec(1, 0, lam_list, 10.0, 0.0),
                StageSpec(1, 0, lam_list, 10.0, 0.0),
                StageSpec(90, 0, lam_list, 10.0, 0.0)))
    codec, state, (feat_step, pix_step, eval_step) = create_train_state(
        spec, strategy, jax.random.PRNGKey(seed),
        img_cfg=ImgLossCfg(disc_ndf=32, disc_num_layers=2,
                           perceptual="msssim", disc_start=1 << 30),
        tune_titok=True)

    train_imgs, held = load_corpus()
    sampler = CropSampler(train_imgs, px=px, seed=seed)
    val_x = heldout_eval_set(held, px=px, n=2 * batch)
    print(f"# corpus: {len(train_imgs)} train imgs, {len(held)} held out",
          file=sys.stderr, flush=True)

    def val_metrics():
        bpps, psnrs = [], []
        for i in range(0, len(val_x), batch):
            m = eval_step(state, jnp.asarray(val_x[i:i + batch]))
            out = codec.apply(state.params, jnp.asarray(val_x[i:i + batch]),
                              need_full_decode=True)
            bpps.append(float(m["val/bpp"]))
            psnrs.append(psnr(np.asarray(out["x_hat"]),
                              val_x[i:i + batch]))
        return float(np.mean(bpps)), float(np.mean(psnrs))

    t0 = time.time()
    # feat warmup at the first lambda
    for i in range(feat_steps):
        state, logs = feat_step(state, jnp.asarray(sampler.batch(batch)))
        if i % 100 == 0:
            print(f"# feat {i} loss {float(logs['train/align_loss']):.4f} "
                  f"bpp {float(logs['train/bpp']):.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    # stage -> pix (epoch_for_strategy jumps past the feat stages)
    state = state.replace(epoch_for_strategy=jnp.asarray(2, jnp.int32))
    segments = []
    for li, lam in enumerate(lam_list):
        state = state.replace(lmbda_idx=jnp.asarray(li, jnp.int32))
        traj = []
        for i in range(seg_steps):
            state, logs = pix_step(state, jnp.asarray(sampler.batch(batch)))
            if i % 50 == 0 or i == seg_steps - 1:
                traj.append({"step": i,
                             "bpp": round(float(logs["train/bpp"]), 5),
                             "rec": round(float(logs["train/rec_loss"]), 5)})
                print(f"# lam={lam} step {i} bpp {traj[-1]['bpp']} "
                      f"rec {traj[-1]['rec']} ({time.time() - t0:.0f}s)",
                      file=sys.stderr, flush=True)
        vbpp, vpsnr = val_metrics()
        segments.append({"lambda": lam, "train_traj": traj,
                         "val_bpp": round(vbpp, 5),
                         "val_psnr": round(vpsnr, 3)})
        print(f"## lam={lam}: val_bpp={vbpp:.5f} val_psnr={vpsnr:.2f}",
              file=sys.stderr, flush=True)

    return {"metric": "r4_rate_calibration", "spec": "small_spec",
            "batch": batch, "px": px, "lr": lr,
            "feat_steps": feat_steps, "seg_steps": seg_steps,
            "segments": segments, "wall_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="CALIB_r04.json")
    ap.add_argument("--feat_steps", type=int, default=600)
    ap.add_argument("--seg_steps", type=int, default=700)
    ap.add_argument("--lambdas", type=float, nargs="+",
                    default=[0.3, 1.0, 4.0, 16.0])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    summary = run(args.feat_steps, args.seg_steps, args.lambdas, args.batch,
                  args.lr, args.seed)
    Path(args.out).write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
