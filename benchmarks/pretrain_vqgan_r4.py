"""Phase A of the round-4 training plan: pretrain the f16 VQGAN.

The reference codec is built ON TOP of a pretrained taming VQGAN (its
encoder is the frozen feat-stage teacher, its decoder/codebook the
generative pixel path — codec_sq_fixbpp.py:459-483); the checkpoint is
an external input there.  With zero egress, this script produces that
prerequisite locally: the conv-only VQGAN trains from scratch far faster
than the full hybrid codec (no ViT, no bottleneck), and the codec phase
(train_r4.py --vqgan_ckpt) then starts from a teacher that actually
reconstructs — the same division of labor as the reference.

Loss: L1 + 0.5*(1 - MS-SSIM) + codebook commitment (the reference's
VQLPIPSWithDiscriminator minus GAN/LPIPS — PSNR-first, no VGG ckpt in
this env).

    python benchmarks/pretrain_vqgan_r4.py --steps 6000 \
        --ckpt_out checkpoints/vqgan_r4 --out PRETRAIN_VQGAN_r04.json
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

from corpus_local import heldout_eval_set, load_corpus
from train_convergence import psnr


def run(args):
    import jax.numpy as jnp
    import optax

    from sic_tpu.config import small_spec
    from sic_tpu.metrics import ms_ssim
    from sic_tpu.models.vqgan import VQGAN
    from train_r4 import PooledSampler

    spec = small_spec().vqgan
    model = VQGAN(spec)
    rng = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params = jax.jit(model.init)(rng, dummy)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if args.resume:
        # continue a previous pretrain (round-4 verdict: the teacher was
        # still improving at its 5k-step budget; its ceiling gates the
        # codec's achievable PSNR).  Optimizer state restarts fresh, so
        # pair --resume with a reduced --lr for a warm continuation.
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(Path(args.resume).resolve(), params)
        print(f"# resumed VQGAN params from {args.resume}",
              file=sys.stderr, flush=True)

    tx = optax.adam(args.lr, b1=0.5, b2=0.9)
    opt_state = tx.init(params)

    def loss_fn(params, x):
        x_hat, emb_loss, _ = model.apply(params, x)
        rec = jnp.mean(jnp.abs(x - x_hat))
        p = jnp.mean(1.0 - ms_ssim(x, x_hat))
        loss = rec + 0.5 * p + emb_loss
        return loss, (rec, p, emb_loss, x_hat)

    @jax.jit
    def step(params, opt_state, x_u8):
        # batches ship as uint8 and normalize ON DEVICE: 4x less tunnel
        # upload per step (25 MB -> 6.3 MB at batch 32), which is the
        # step-time floor on a ~40 MB/s link
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    decode_fn = jax.jit(lambda p, x: model.apply(p, x)[0])

    train_imgs, held = load_corpus()
    sampler = PooledSampler(train_imgs, px=256, seed=args.seed,
                            pool=args.pool)
    val_x = heldout_eval_set(held, px=256, n=8, procedural_frac=0.0)

    print(f"# VQGAN {n_params/1e6:.1f}M params on "
          f"{jax.devices()[0].device_kind}", file=sys.stderr, flush=True)
    hist = {"step": [], "loss": [], "rec": [], "val_psnr": []}
    best_psnr = -1.0
    t0 = time.time()
    from collections import deque
    pending = deque()   # BOUNDED FENCE WINDOW: an unfenced loop pins every
    # step's host buffers (measured 130 GB RSS -> OOM at ~5k steps) and a
    # per-step fence serializes upload with compute (2.1 s/step); fencing
    # step i-3 keeps <= 3 uploads in flight — overlap with bounded memory
    l = 0.0
    for i in range(args.steps):
        params, opt_state, loss, aux = step(
            params, opt_state, jnp.asarray(sampler.batch_u8(args.batch)))
        pending.append(loss)
        if len(pending) > 3:
            l = float(pending.popleft())
        if i and args.ckpt_out and i % 1000 == 0 and not args.save_best:
            from sic_tpu.checkpoint import save_codec_params
            save_codec_params(Path(args.ckpt_out).resolve(), params)
        if i % args.eval_every == 0 or i == args.steps - 1:
            while pending:
                l = float(pending.popleft())
            xh = np.asarray(decode_fn(params, jnp.asarray(val_x)))
            vp = psnr(xh, val_x)
            hist["step"].append(i)
            hist["loss"].append(round(l, 4))
            hist["rec"].append(round(float(aux[0]), 4))
            hist["val_psnr"].append(round(vp, 3))
            print(f"# step {i}: loss {l:.4f} rec {float(aux[0]):.4f} "
                  f"val_psnr {vp:.2f} ({time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
            if args.save_best and args.ckpt_out and vp > best_psnr:
                # keep the best-evaluated params, not the final-step
                # lottery draw: val PSNR oscillates +-2.5 dB at these
                # lrs, and the teacher's ceiling gates the whole codec
                best_psnr = vp
                from sic_tpu.checkpoint import save_codec_params
                save_codec_params(Path(args.ckpt_out).resolve(), params)
    sampler.stop()

    ckpt_path = None
    if args.ckpt_out:
        ckpt_path = str(Path(args.ckpt_out).resolve())
        if not args.save_best:   # best mode already saved its winner
            from sic_tpu.checkpoint import save_codec_params
            ckpt_path = save_codec_params(Path(args.ckpt_out).resolve(),
                                          params)
        print(f"# checkpoint -> {ckpt_path}", file=sys.stderr, flush=True)

    return {"metric": "vqgan_pretrain", "params_M": round(n_params/1e6, 1),
            "steps": args.steps, "batch": args.batch, "lr": args.lr,
            "history": hist, "final_val_psnr": hist["val_psnr"][-1],
            "best_val_psnr": round(max(hist["val_psnr"]), 3),
            "saved": "best" if args.save_best else "final",
            "wall_s": round(time.time() - t0, 1), "ckpt": ckpt_path}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="PRETRAIN_VQGAN_r04.json")
    ap.add_argument("--ckpt_out", type=str, default=None)
    ap.add_argument("--resume", type=str, default=None,
                    help="checkpoint dir to continue from (params only)")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--pool", type=int, default=2048)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--save_best", action="store_true",
                    help="checkpoint the best-val_psnr params instead of "
                         "periodic/final saves")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    summary = run(args)
    Path(args.out).write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
