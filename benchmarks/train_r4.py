"""Round-4 headline training run: a mid-scale codec that makes
recognizable images, with the rate controller HOLDING a bpp band.

VERDICT.md round 3, item 1: train ``small_spec`` (ViT-small trunk,
196M params) from scratch on the richest local corpus (corpus_local.py:
89 labmaze textures + 3 photos + procedural mix) to PSNR >= 25 dB on
held-out images, with validation bpp inside ``[bpp_lower, bpp_upper]``
for >= 3 consecutive validation epochs, under the reference's 3-stage
schedule + lambda-index controller (codec_sq_fixbpp.py:523-647).

Calibration findings baked in (CALIB_r04.json + /tmp diag runs):
- lambda in the reference's 0.3..16 range CRUSHES the from-scratch detail
  stream to 0 bpp before it becomes useful; the live lambda decade for
  this corpus/model is ~1e-4..3e-2.  Stage-0/1 run at the reference's
  own warmup weight 1e-3 (config_qp3_256train.yaml stage0).
- a x2 lambda ladder out-jumps any narrow band (round-3 verdict); the
  ladder here is geometric with ~15% steps, reference-style fine
  spacing (the reference's stage-2 ladders step ~4-8%).

Data feeding: crops are pre-generated into a uint8 pool and refreshed by
a background thread — this host has ONE CPU, and per-batch PIL resizes
starve the TPU otherwise (measured: 0.33 s/step -> 1.4 s/step).

    python benchmarks/train_r4.py --out TRAIN_r04.json \
        --ckpt_out checkpoints/r4_small --recon recon_r04.png
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sic_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from corpus_local import CropSampler, heldout_eval_set, load_corpus
from train_convergence import psnr


class PooledSampler:
    """uint8 crop pool + background refresh thread.

    ``batch()`` is pure numpy indexing (microseconds); a daemon thread
    regenerates the pool from the augmenting CropSampler so the corpus
    keeps moving without ever blocking the device loop."""

    def __init__(self, images, px: int, seed: int, pool: int = 3072,
                 procedural_frac: float = 0.25):
        self.src = CropSampler(images, px=px, seed=seed,
                               procedural_frac=procedural_frac)
        self.rng = np.random.default_rng(seed + 1)
        self.pool = self._gen(pool)
        self._stop = False
        self._thread = threading.Thread(target=self._refresh_loop,
                                        daemon=True)
        self._thread.start()

    def _gen(self, n):
        out = np.empty((n, self.src.px, self.src.px, 3), np.uint8)
        for i in range(n):
            out[i] = np.clip((self.src.batch(1)[0] + 1.0) * 127.5,
                             0, 255).astype(np.uint8)
        return out

    def _refresh_loop(self, chunk: int = 64):
        while not self._stop:
            fresh = self._gen(chunk)
            idx = self.rng.integers(0, len(self.pool), size=chunk)
            self.pool[idx] = fresh
            time.sleep(0.05)

    def batch(self, n: int) -> np.ndarray:
        idx = self.rng.integers(0, len(self.pool), size=n)
        return self.pool[idx].astype(np.float32) / 127.5 - 1.0

    def batch_u8(self, n: int) -> np.ndarray:
        """uint8 view for on-device normalization: 4x less host->device
        upload per step — the step-time floor on a slow link."""
        idx = self.rng.integers(0, len(self.pool), size=n)
        return self.pool[idx]

    def stop(self):
        self._stop = True


class DeviceCropPool:
    """HBM-resident training pool: ONE bulk upload, then each batch is a
    jitted gather + on-device flip/rot augmentation keyed by the step
    counter — per-step host->device traffic is a single scalar.

    Exists because the tunnel bandwidth is not a constant: measured
    2.8 MB/s mid-run (vs ~40 healthy), at which even uint8 batch uploads
    (3 MB) dominate the 0.4 s train step.  Fresh crops trickle in between
    epochs (a small host-generated chunk scattered into the pool), so the
    corpus keeps moving at ~12 MB/epoch instead of ~750 MB."""

    def __init__(self, host_sampler: CropSampler, n_pool: int, batch: int,
                 seed: int = 0):
        import jax
        import jax.numpy as jnp

        self.src = host_sampler
        px = host_sampler.px
        pool = np.empty((n_pool, px, px, 3), np.uint8)
        for i in range(n_pool):
            pool[i] = np.clip((host_sampler.batch(1)[0] + 1.0) * 127.5,
                              0, 255).astype(np.uint8)
        self.dev_pool = jax.device_put(pool)
        self.batch = batch
        self._key = jax.random.PRNGKey(seed + 17)
        self._step = 0

        @jax.jit
        def draw(dev_pool, key, step):
            k = jax.random.fold_in(key, step)
            ki, kf, kr = jax.random.split(k, 3)
            idx = jax.random.randint(ki, (batch,), 0, n_pool)
            x = dev_pool[idx].astype(jnp.float32) / 127.5 - 1.0
            flip = jax.random.bernoulli(kf, shape=(batch,))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1], x)
            rot = jax.random.randint(kr, (batch,), 0, 4)
            xs = jnp.stack([x, jnp.rot90(x, 1, (1, 2)),
                            jnp.rot90(x, 2, (1, 2)),
                            jnp.rot90(x, 3, (1, 2))])
            return xs[rot, jnp.arange(batch)]

        @jax.jit
        def scatter(dev_pool, fresh, at):
            return dev_pool.at[at].set(fresh)

        self._draw = draw
        self._scatter = scatter

    def next(self):
        self._step += 1
        return self._draw(self.dev_pool, self._key, self._step)

    def refresh(self, n: int = 48):
        """Scatter ``n`` fresh host crops into the device pool (call
        between epochs; ~n*200KB upload)."""
        fresh = np.clip((self.src.batch(n) + 1.0) * 127.5,
                        0, 255).astype(np.uint8)
        rng = np.random.default_rng(1000 + self._step)
        at = rng.choice(self.dev_pool.shape[0], size=n, replace=False)
        self.dev_pool = self._scatter(self.dev_pool, fresh, at)

    def stop(self):
        """No background thread to stop (PooledSampler API compat; the
        round-4 run lost its finalization artifacts to this missing
        method — AttributeError after the full training loop)."""


def recon_grid(pairs, path, cols: int = 4):
    """[(gt, recon), ...] float[-1,1] -> one PNG grid (gt above recon)."""
    from PIL import Image
    u8 = lambda a: np.clip((a + 1.0) * 127.5, 0, 255).astype(np.uint8)
    rows = []
    for r in range(0, len(pairs), cols):
        chunk = pairs[r:r + cols]
        top = np.concatenate([u8(g) for g, _ in chunk], axis=1)
        bot = np.concatenate([u8(x) for _, x in chunk], axis=1)
        rows.append(np.concatenate([top, bot], axis=0))
    Image.fromarray(np.concatenate(rows, axis=0)).save(path)


def run(args):
    import jax.numpy as jnp

    from sic_tpu.config import small_spec
    from sic_tpu.train import (ImgLossCfg, StageSpec, Trainer,
                               TrainingStrategy, create_train_state)

    spec = small_spec()
    # geometric ~15% ladder over the live decade (see module docstring)
    ladder = tuple(round(args.lam_lo * (args.lam_hi / args.lam_lo)
                         ** (i / (args.ladder_n - 1)), 8)
                   for i in range(args.ladder_n))
    mid = args.ladder_init if args.ladder_init >= 0 else args.ladder_n // 2
    warm = (1e-3,) * 4
    band = tuple(args.band)
    # The FEAT stage carries the band floor too: round-5 measured (phaseB
    # first attempt) that at warm lambda the rate collapses DURING feat
    # (val bpp 0.154 -> 0.0095 in 4 epochs) long before any band exists,
    # so a long feat phase would hand the pix stage a dead stream and the
    # auto-band would calibrate around zero.  The below-band hinge
    # (TrainState.rate_floor) holds the feat-stage operating rate at the
    # target floor so alignment learns under a LIVE stream.
    strategy = TrainingStrategy(
        learning_rate=args.lr, start_epoch=0,
        stages=(StageSpec(args.feat_epochs[0], 0, warm, 10.0, 0.0),
                StageSpec(args.feat_epochs[1], 0, warm, 10.0, band[0]),
                StageSpec(args.pix_epochs, mid, ladder, band[1], band[0])))

    feat_total = sum(args.feat_epochs) * args.steps_per_epoch
    disc_start = feat_total + int(args.pix_epochs * args.steps_per_epoch
                                  * args.disc_at)
    codec_params = None
    teacher_apply = None
    if args.vqgan_ckpt:
        # phase-A pretrained VQGAN (pretrain_vqgan_r4.py) grafted into a
        # fresh codec init — the reference's pretrained-taming-VQGAN role
        # (codec_sq_fixbpp.py:459-483): frozen encoder teacher + warm
        # decoder/codebook for the pix stage
        import orbax.checkpoint as ocp
        from sic_tpu.models.codec import init_codec
        from sic_tpu.models.vqgan import VQGAN
        _, codec_params = init_codec(spec, jax.random.PRNGKey(args.seed),
                                     (256, 256))
        vq_template = jax.jit(VQGAN(spec.vqgan).init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32))
        with ocp.StandardCheckpointer() as ckptr:
            vq = ckptr.restore(Path(args.vqgan_ckpt).resolve(), vq_template)
        codec_params["params"]["vqgan"] = vq["params"]
        teacher_apply = jax.jit(
            lambda x: VQGAN(spec.vqgan).apply(vq, x)[0])
        print(f"# grafted pretrained VQGAN from {args.vqgan_ckpt}",
              file=sys.stderr, flush=True)
    codec, state, (feat_step, pix_step, eval_step) = create_train_state(
        spec, strategy, jax.random.PRNGKey(args.seed),
        img_cfg=ImgLossCfg(disc_ndf=32, disc_num_layers=2,
                           perceptual="msssim", disc_start=disc_start,
                           disc_weight=args.disc_weight,
                           align_weight=args.pix_align),
        tune_titok=True, codec_params=codec_params,
        donate=True)   # buffer donation: without it, pipelined steps keep
    # multiple 196M-param state copies live and HBM exhausts mid-epoch
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))

    train_imgs, held = load_corpus()
    sampler = DeviceCropPool(
        CropSampler(train_imgs, px=256, seed=args.seed),
        n_pool=args.pool, batch=args.batch, seed=args.seed)
    val_x = heldout_eval_set(held, px=256, n=args.val_n,
                             procedural_frac=0.0)   # held-out REAL images
    val_mix = heldout_eval_set(held, px=256, n=16, procedural_frac=0.25)
    # pre-place the val sets: re-uploading 12 MB per eval at a degraded
    # link would cost more than the eval itself
    val_x_dev = jax.device_put(jnp.asarray(val_x))
    val_mix_dev = jax.device_put(jnp.asarray(val_mix))
    # The training bar, stated up front (round-4 verdict, weak item 7):
    # the codec decodes THROUGH the VQGAN decoder, so the pretrained
    # teacher's own reconstruction PSNR on the SAME held-out set is the
    # reachable ceiling.  Success = codec held-out PSNR within 1.5 dB of
    # the teacher (absolute >= 25 dB is the stretch goal, meaningful only
    # if the teacher itself clears ~26.5).
    teacher_psnr = None
    if teacher_apply is not None:
        teacher_psnr = round(psnr(
            np.asarray(teacher_apply(val_x_dev[:8])), val_x[:8]), 3)
    print(f"# {n_params/1e6:.0f}M params; corpus {len(train_imgs)} imgs, "
          f"{len(held)} held out; ladder {ladder[0]}..{ladder[-1]} "
          f"({args.ladder_n}), band {band}; teacher heldout PSNR "
          f"{teacher_psnr}", file=sys.stderr, flush=True)

    decode_fn = jax.jit(lambda p, x: codec.apply(
        p, x, need_full_decode=True)["x_hat"])

    def val_metrics():
        bpps = []
        for i in range(0, len(val_mix), args.batch):
            m = eval_step(state, val_mix_dev[i:i + args.batch])
            bpps.append(float(m["val/bpp"]))
        xh = np.asarray(decode_fn(state.params, val_x_dev[:8]))
        return float(np.mean(bpps)), psnr(xh, val_x[:8])

    trainer = Trainer(codec, state, (feat_step, pix_step, eval_step),
                      strategy)

    # K steps per device dispatch: each dispatch marshals the ~1000-leaf
    # train state over the tunnel, and under congestion that per-dispatch
    # overhead (~1.4 s measured) dwarfs the 0.35 s compute step.  A
    # lax.scan over K steps — data drawn from the HBM pool INSIDE the
    # scan — pays it once per K.  (The jitted per-step fns inline when
    # traced here; losses come back as one (K,) array.)
    K = args.steps_per_dispatch

    def make_multi(step_fn, loss_key):
        def run(state, dev_pool, key, step0):
            def body(st, i):
                k = jax.random.fold_in(key, step0 + i)
                ki, kf, kr = jax.random.split(k, 3)
                idx = jax.random.randint(ki, (args.batch,), 0,
                                         dev_pool.shape[0])
                x = dev_pool[idx].astype(jnp.float32) / 127.5 - 1.0
                flip = jax.random.bernoulli(kf, shape=(args.batch,))
                x = jnp.where(flip[:, None, None, None], x[:, :, ::-1], x)
                rot = jax.random.randint(kr, (args.batch,), 0, 4)
                xs = jnp.stack([x, jnp.rot90(x, 1, (1, 2)),
                                jnp.rot90(x, 2, (1, 2)),
                                jnp.rot90(x, 3, (1, 2))])
                x = xs[rot, jnp.arange(args.batch)]
                st, logs = step_fn(st, x)
                return st, logs[loss_key]
            return jax.lax.scan(body, state, jnp.arange(K))
        return jax.jit(run, donate_argnums=(0,))

    feat_multi = make_multi(feat_step, "train/align_loss")
    pix_multi = make_multi(pix_step, "train/ae_loss")
    hist = {"val_bpp": [], "val_psnr": [], "lmbda": [], "lmbda_idx": [],
            "stage": [], "controller_moves": [], "step_s": []}
    t0 = time.time()
    total_epochs = sum(args.feat_epochs) + args.pix_epochs
    band_is_auto = args.auto_band
    for _ in range(total_epochs):
        epoch = int(trainer.state.epoch_for_strategy)
        stage, sspec = strategy.stage_at(epoch)
        if stage == "pix" and band_is_auto:
            # calibrate the pix band from the measured operating rate at
            # the stage transition — the reference tunes its bands to the
            # model/corpus offline the same way ("YOU MAY NEED TO ADJUST
            # THE lmbda_list FOR YOUR OWN BITRATE",
            # config_qp3_256train.yaml:105); +-25%% around the entry rate
            # gives the +-~7%%-per-ladder-step controller room to regulate
            band_is_auto = False
            b = max(float(hist["val_bpp"][-1]), 2e-3)
            band = (round(0.75 * b, 5), round(1.25 * b, 5))
            strategy = TrainingStrategy(
                learning_rate=args.lr, start_epoch=0,
                stages=(strategy.stages[0], strategy.stages[1],
                        StageSpec(args.pix_epochs, mid, ladder,
                                  band[1], band[0])))
            trainer.strategy = strategy
            # re-arm the below-band rate hinge at the calibrated floor
            # (end_of_epoch armed it with the pre-calibration band)
            trainer.state = trainer.state.replace(
                rate_floor=jnp.asarray(band[0], jnp.float32))
            print(f"# auto band from entry bpp {b:.5f}: {band}",
                  file=sys.stderr, flush=True)
            stage, sspec = strategy.stage_at(epoch)
        step_fn = pix_step if stage == "pix" else feat_step
        te = time.time()
        multi = pix_multi if stage == "pix" else feat_multi
        assert args.steps_per_epoch % K == 0, (args.steps_per_epoch, K)
        loss = 0.0
        for i in range(args.steps_per_epoch // K):
            trainer.state, losses = multi(
                trainer.state, sampler.dev_pool, sampler._key,
                sampler._step)
            sampler._step += K
            loss = float(losses[-1])    # fence: one host sync per K steps
        sampler.refresh()
        hist["step_s"].append((time.time() - te) / args.steps_per_epoch)

        state = trainer.state
        vbpp, vpsnr = val_metrics()
        idx_before = int(trainer.state.lmbda_idx)
        lam_before = float(np.asarray(trainer.state.lmbda_list)[idx_before])
        trainer.end_of_epoch({"val/bpp": vbpp})
        same_stage = strategy.stage_at(epoch + 1)[0] == stage
        idx_after = int(trainer.state.lmbda_idx) if same_stage else None
        hist["val_bpp"].append(round(vbpp, 5))
        hist["val_psnr"].append(round(vpsnr, 3))
        hist["lmbda"].append(lam_before)
        hist["lmbda_idx"].append(idx_before)
        hist["stage"].append(stage)
        if stage == "pix" and idx_after is not None:
            want = (1 if vbpp > sspec.bpp_upper
                    else -1 if vbpp < sspec.bpp_lower else 0)
            at_clamp = ((want > 0 and idx_before >= len(ladder) - 1)
                        or (want < 0 and idx_before <= 0))
            hist["controller_moves"].append(
                {"epoch": epoch, "val_bpp": round(vbpp, 5), "want": want,
                 "got": idx_after - idx_before, "at_clamp": at_clamp})
        print(f"# ep {epoch} [{stage}] loss {loss:.4f} "
              f"val_bpp {vbpp:.5f} val_psnr {vpsnr:.2f} "
              f"lam {lam_before:.5g} idx {idx_before}"
              + (f"->{idx_after}" if idx_after is not None else "")
              + f" ({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
        if args.ckpt_out and epoch % 8 == 7:
            from sic_tpu.checkpoint import save_codec_params
            save_codec_params(Path(args.ckpt_out).resolve(),
                              {"params": trainer.state.params["params"]})
        if args.out:
            # truncation-proof: the trajectory so far is always on disk
            Path(str(args.out) + ".partial").write_text(json.dumps(
                {"metric": "midscale_train_partial", "band": list(band),
                 "epochs_done": epoch + 1,
                 "val_bpp_trajectory": hist["val_bpp"],
                 "val_psnr_trajectory": hist["val_psnr"],
                 "lmbda_trajectory": hist["lmbda"],
                 "stage_trajectory": hist["stage"],
                 "controller_moves": hist["controller_moves"]}, indent=1))
    sampler.stop()
    train_wall = time.time() - t0

    params = {"params": trainer.state.params["params"]}
    ckpt_path = None
    if args.ckpt_out:
        from sic_tpu.checkpoint import save_codec_params
        ckpt_path = save_codec_params(Path(args.ckpt_out).resolve(), params)
        print(f"# checkpoint -> {ckpt_path}", file=sys.stderr, flush=True)

    # ---- deployment eval: REAL bitstreams through CodecRuntime ----------
    from sic_tpu.models import CodecRuntime
    rt = CodecRuntime(spec, params)
    pairs, deploy = [], []
    for i in range(min(len(val_x), 8)):
        gt = val_x[i]
        enc = rt.encode_only(jnp.asarray(gt[None]))
        nbytes = len(enc["z_bit_stream"]) + len(enc["h_bit_stream"])
        x_hat = np.asarray(rt.decode_only(**enc))[0]
        deploy.append({"bytes": nbytes,
                       "bpp": round(8.0 * nbytes / (256 * 256), 5),
                       "psnr": round(psnr(x_hat, gt), 3)})
        pairs.append((gt, x_hat))
        print(f"# deploy {i}: {deploy[-1]}", file=sys.stderr, flush=True)
    if args.recon:
        recon_grid(pairs, args.recon)

    # band-hold streak over pix-stage validation epochs
    pix_bpps = [b for b, s in zip(hist["val_bpp"], hist["stage"])
                if s == "pix"]
    streak = best = 0
    for b in pix_bpps:
        streak = streak + 1 if band[0] <= b <= band[1] else 0
        best = max(best, streak)
    end_streak = 0
    for b in reversed(pix_bpps):
        if band[0] <= b <= band[1]:
            end_streak += 1
        else:
            break

    pix_psnrs = [p for p, s in zip(hist["val_psnr"], hist["stage"])
                 if s == "pix"]
    summary = {
        "metric": "midscale_train",
        "spec": "small_spec", "params_M": round(n_params / 1e6, 1),
        "device": jax.devices()[0].device_kind,
        "batch": args.batch, "px": 256, "lr": args.lr,
        "steps_per_epoch": args.steps_per_epoch,
        "epochs": [args.feat_epochs[0], args.feat_epochs[1],
                   args.pix_epochs],
        "total_steps": total_epochs * args.steps_per_epoch,
        "band": list(band), "ladder": list(ladder),
        "ladder_init_idx": mid,
        "corpus": {"train_images": len(train_imgs),
                   "heldout_images": len(held), "pool": args.pool},
        "val_bpp_trajectory": hist["val_bpp"],
        "val_psnr_trajectory": hist["val_psnr"],
        "lmbda_trajectory": hist["lmbda"],
        "lmbda_idx_trajectory": hist["lmbda_idx"],
        "stage_trajectory": hist["stage"],
        "controller_moves": hist["controller_moves"],
        "controller_correct": all(
            m["got"] == m["want"]
            or (m["want"] != 0 and m["got"] == 0 and m["at_clamp"])
            for m in hist["controller_moves"]),
        "band_hold_best_streak": best,
        "band_hold_end_streak": end_streak,
        "band_held_3plus": best >= 3,
        "teacher_heldout_psnr": teacher_psnr,
        "bar": {"teacher_relative_db": 1.5, "absolute_db": 25.0},
        "pix_psnr_start": pix_psnrs[0] if pix_psnrs else None,
        "pix_psnr_end": pix_psnrs[-1] if pix_psnrs else None,
        "pix_psnr_max": max(pix_psnrs) if pix_psnrs else None,
        "deploy_eval": deploy,
        "deploy_psnr_mean": round(float(np.mean(
            [d["psnr"] for d in deploy])), 3),
        "deploy_bpp_mean": round(float(np.mean(
            [d["bpp"] for d in deploy])), 5),
        "step_s_p50": round(float(np.median(hist["step_s"])), 4),
        "train_wall_s": round(train_wall, 1),
        "ckpt": ckpt_path,
    }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="TRAIN_r04.json")
    ap.add_argument("--ckpt_out", type=str, default=None)
    ap.add_argument("--recon", type=str, default=None)
    ap.add_argument("--vqgan_ckpt", type=str, default=None,
                    help="phase-A pretrained VQGAN checkpoint "
                         "(pretrain_vqgan_r4.py)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--steps_per_epoch", type=int, default=250)
    ap.add_argument("--steps_per_dispatch", type=int, default=25,
                    help="train steps fused into one device dispatch "
                         "(lax.scan); amortizes per-dispatch tunnel "
                         "marshaling of the ~1000-leaf state")
    ap.add_argument("--feat_epochs", type=int, nargs=2, default=(2, 2))
    ap.add_argument("--pix_epochs", type=int, default=48)
    ap.add_argument("--band", type=float, nargs=2, default=(0.03, 0.06))
    ap.add_argument("--auto_band", action="store_true",
                    help="calibrate the pix band to +-25%% of the measured "
                         "rate at the feat->pix transition")
    ap.add_argument("--lam_lo", type=float, default=1e-4)
    ap.add_argument("--lam_hi", type=float, default=3e-2)
    ap.add_argument("--ladder_n", type=int, default=40)
    ap.add_argument("--ladder_init", type=int, default=-1)
    ap.add_argument("--disc_at", type=float, default=0.85,
                    help="fraction of pix steps after which the GAN starts")
    ap.add_argument("--disc_weight", type=float, default=0.3)
    ap.add_argument("--pix_align", type=float, default=0.0,
                    help="teacher-alignment anchor weight in the pix "
                         "objective (ImgLossCfg.align_weight)")
    ap.add_argument("--pool", type=int, default=3072)
    ap.add_argument("--val_n", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    summary = run(args)
    Path(args.out).write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
