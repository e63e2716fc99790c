"""Jitted training / validation steps for the three-stage schedule.

Counterpart of the reference's manual-optimization ``training_step``
(reference: src/models/codec_sq_fixbpp.py:701-829).  One compiled function
per stage family; the lambda weight arrives as a traced scalar so rate
adaptation never recompiles.  Under a device mesh the batch axis is sharded
and XLA inserts the gradient all-reduces (the NCCL DDP counterpart).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.codec import Codec
from .losses import (adaptive_d_weight, adopt_weight, feat_align_loss,
                     hinge_d_loss, vanilla_d_loss)
from .state import TrainState, merge_params, split_params, stage_grad_mask


@dataclasses.dataclass(frozen=True)
class FeatLossCfg:
    """(reference: config_test.yaml:72-76)"""
    mse_weight: float = 1.0
    ce_weight: float = 0.25
    vq_weight: float = 1.0
    rate_push_w: float = 1.0
    # weight of the below-band rate hinge ``relu(rate_floor - bpp_noise)``
    # (see ImgLossCfg.rate_push_w for the mechanism note)


@dataclasses.dataclass(frozen=True)
class ImgLossCfg:
    """(reference: config_test.yaml:64-70, vqperceptual.py:38-41)

    ``perceptual`` selects the perceptual term of the NLL
    (reference: vqperceptual.py:67-78 uses LPIPS unconditionally):
    ``"lpips"`` needs a calibrated VGG16 backbone to be meaningful;
    ``"msssim"`` is the checkpoint-free fallback (1 - MS-SSIM, the same
    differentiable metric family the DCVC line trains with);
    ``"none"`` trains on L1 alone."""
    disc_start: int = 0
    disc_weight: float = 0.75
    disc_factor: float = 1.0
    codebook_weight: float = 1.0
    perceptual_weight: float = 1.0
    adaptive_disc_max: float = 1e4
    disc_num_layers: int = 3
    disc_ndf: int = 64
    disc_loss: str = "hinge"
    perceptual: str = "lpips"
    align_weight: float = 0.0
    rate_push_w: float = 1.0
    # The lambda*bpp rate term only ever pushes rate DOWN; once every
    # symbol's |y_res| < 0.5 and scales sit below force_zero_thres the
    # hard-quant stream is empty and the controller's lambda has no lever
    # to revive it (round-4 measured: val bpp pinned at 0.0 for 8 epochs
    # under 16 consecutive correct lambda-down moves).  The hinge
    # ``rate_push_w * relu(state.rate_floor - bpp_noise)`` adds an
    # upward rate gradient exactly when the (always-differentiable)
    # noise-proxy rate falls below the stage's band floor, making
    # collapse non-absorbing by construction.  rate_floor == 0 disables.
    # ``align_weight > 0`` keeps the feat-stage teacher-alignment terms
    # (latent MSE + index CE against the frozen VQGAN teacher) in the pix
    # objective at this weight.  The reference's pix stage drops them
    # (codec_sq_fixbpp.py:739-777) because it starts from a CONVERGED
    # feat model; a from-scratch run that enters pix mid-alignment loses
    # both rate and PSNR without the anchor (round-4 measured: val bpp
    # 0.057 -> 0.000 and PSNR 14.7 -> 12.3 in 10 unanchored pix epochs).


def _last_conv_apply(h_pre, w, b):
    """Re-apply the decoder's final 3x3 conv with kernel ``w`` (NHWC/HWIO)."""
    out = jax.lax.conv_general_dilated(
        h_pre, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def make_steps(codec: Codec, disc, lpips, feat_cfg: FeatLossCfg,
               img_cfg: ImgLossCfg, ae_tx, disc_tx,
               tune_titok: bool = False, donate: bool = False):
    """Build the jitted step functions.  ``disc``/``lpips`` are flax modules;
    ``ae_tx``/``disc_tx`` optax transforms.

    Gradients are taken w.r.t. the trainable subtree only — the frozen
    ViT/VQGAN-encoder params are closed over, so no gradient or optimizer
    buffers exist for them."""
    d_loss_fn = hinge_d_loss if img_cfg.disc_loss == "hinge" else vanilla_d_loss
    _split = functools.partial(split_params, tune_titok=tune_titok)
    # donation reuses the old state's buffers for the new state — required
    # headroom for billion-param single-chip training, but it invalidates
    # the caller's input state object (off by default for test friendliness)
    _jit = (functools.partial(jax.jit, donate_argnums=(0,)) if donate
            else jax.jit)

    if img_cfg.perceptual not in ("lpips", "msssim", "none"):
        raise ValueError(f"unknown perceptual mode: {img_cfg.perceptual!r}")

    def _nll(params_lpips, x, x_hat):
        rec = jnp.mean(jnp.abs(x - x_hat))
        if img_cfg.perceptual == "lpips":
            p = jnp.mean(lpips.apply(params_lpips, x, x_hat))
        elif img_cfg.perceptual == "msssim":
            from ..metrics import ms_ssim
            p = jnp.mean(1.0 - ms_ssim(x, x_hat))
        else:
            p = jnp.asarray(0.0, x.dtype)
        return rec + img_cfg.perceptual_weight * p, rec, p

    # ---- stage feat / feat_wo_bpp ------------------------------------------
    @_jit
    def feat_step(state: TrainState, x) -> Tuple[TrainState, Dict]:
        rng, noise_rng = jax.random.split(state.rng)
        lmbda = state.current_lmbda()
        teacher_latent, teacher_idx = codec.apply(
            state.params, x, method=Codec.encode_to_vqgan)
        trainable, frozen = _split(state.params)

        def loss_fn(trainable):
            out = codec.apply(merge_params(trainable, frozen), x,
                              need_full_decode=False,
                              training=True, noise_rng=noise_rng)
            loss, logs = feat_align_loss(
                out["vqgan_latent"], out["logits"], teacher_latent,
                teacher_idx, out["vq_loss"], out["bpp_loss"],
                mse_weight=feat_cfg.mse_weight, ce_weight=feat_cfg.ce_weight,
                vq_weight=feat_cfg.vq_weight, sq_weight=lmbda)
            rate_push = feat_cfg.rate_push_w * jax.nn.relu(
                state.rate_floor - out["bpp_loss"])
            loss = loss + rate_push
            logs["train/rate_push"] = rate_push
            logs["train/align_loss"] = loss
            logs["train/bpp"] = out["bpp_loss"]
            logs["train/bpp_hard_quant"] = out["bpp_hard_quant"]
            logs["train/lambda"] = lmbda
            return loss, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        grads = stage_grad_mask(grads, "feat")
        updates, opt_state = ae_tx.update(grads, state.opt_state_ae, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return state.replace(params=merge_params(trainable, frozen),
                             opt_state_ae=opt_state,
                             global_step=state.global_step + 1, rng=rng), logs

    # ---- stage pix: generator + discriminator -------------------------------
    @_jit
    def pix_step(state: TrainState, x) -> Tuple[TrainState, Dict]:
        rng, noise_rng = jax.random.split(state.rng)
        lmbda = state.current_lmbda()
        disc_factor = adopt_weight(img_cfg.disc_factor, state.global_step,
                                   img_cfg.disc_start)
        if img_cfg.align_weight > 0.0:
            teacher_latent, teacher_idx = codec.apply(
                state.params, x, method=Codec.encode_to_vqgan)
        trainable, frozen = _split(state.params)

        def gen_loss_fn(trainable):
            params = merge_params(trainable, frozen)
            out = codec.apply(params, x, need_full_decode=True, training=True,
                              noise_rng=noise_rng, return_pre_out=True)
            x_hat = out["x_hat"]

            def nll_of(xh):
                nll, _, _ = _nll(state.lpips_params, x, xh)
                return nll

            def g_of(xh):
                logits_fake, _ = disc.apply(
                    {"params": state.disc_params,
                     "batch_stats": state.disc_stats},
                    xh, train=True, mutable=["batch_stats"])
                return -jnp.mean(logits_fake)

            nll, rec, p = _nll(state.lpips_params, x, x_hat)
            g_loss = g_of(x_hat)

            w_last = params["params"]["vqgan"]["decoder"]["conv_out"]["kernel"]
            b_last = jax.lax.stop_gradient(
                params["params"]["vqgan"]["decoder"]["conv_out"]["bias"])
            h_pre = jax.lax.stop_gradient(out["pre_out"])
            d_weight = adaptive_d_weight(
                w_last,
                lambda w: nll_of(_last_conv_apply(h_pre, w, b_last)),
                lambda w: g_of(_last_conv_apply(h_pre, w, b_last)),
                disc_weight=img_cfg.disc_weight,
                max_weight=img_cfg.adaptive_disc_max)

            loss = (nll + d_weight * disc_factor * g_loss
                    + img_cfg.codebook_weight * out["vq_loss"]
                    + lmbda * out["bpp_loss"])
            rate_push = img_cfg.rate_push_w * jax.nn.relu(
                state.rate_floor - out["bpp_loss"])
            loss = loss + rate_push
            if img_cfg.align_weight > 0.0:
                align, _ = feat_align_loss(
                    out["vqgan_latent"], out["logits"], teacher_latent,
                    teacher_idx, out["vq_loss"], out["bpp_loss"],
                    mse_weight=feat_cfg.mse_weight,
                    ce_weight=feat_cfg.ce_weight,
                    vq_weight=0.0, sq_weight=0.0)  # vq/rate already above
                loss = loss + img_cfg.align_weight * align
                extra_logs = {"train/pix_align_loss": align}
            else:
                extra_logs = {}
            logs = {
                **extra_logs,
                "train/rate_push": rate_push,
                "train/ae_loss": loss, "train/nll_loss": nll,
                "train/rec_loss": rec, "train/p_loss": p,
                "train/g_loss": g_loss, "train/d_weight": d_weight,
                "train/quant_loss": out["vq_loss"],
                "train/bpp": out["bpp_loss"],
                "train/bpp_hard_quant": out["bpp_hard_quant"],
                "train/lambda": lmbda, "train/disc_factor": disc_factor,
            }
            return loss, (logs, x_hat)

        (loss, (logs, x_hat)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(trainable)
        grads = stage_grad_mask(grads, "pix")
        updates, opt_ae = ae_tx.update(grads, state.opt_state_ae, trainable)
        trainable = optax.apply_updates(trainable, updates)
        params = merge_params(trainable, frozen)

        # discriminator pass on detached tensors (reference: :763-777)
        x_hat = jax.lax.stop_gradient(x_hat)

        def disc_loss_fn(disc_params):
            v = {"params": disc_params, "batch_stats": state.disc_stats}
            logits_real, mut = disc.apply(v, x, train=True,
                                          mutable=["batch_stats"])
            v = {"params": disc_params, "batch_stats": mut["batch_stats"]}
            logits_fake, mut = disc.apply(v, x_hat, train=True,
                                          mutable=["batch_stats"])
            d_loss = disc_factor * d_loss_fn(logits_real, logits_fake)
            aux = {"train/disc_loss": d_loss,
                   "train/logits_real": jnp.mean(logits_real),
                   "train/logits_fake": jnp.mean(logits_fake)}
            return d_loss, (aux, mut["batch_stats"])

        (_, (d_logs, disc_stats)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)
        d_updates, opt_disc = disc_tx.update(d_grads, state.opt_state_disc,
                                             state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        logs.update(d_logs)
        return state.replace(
            params=params, opt_state_ae=opt_ae, disc_params=disc_params,
            disc_stats=disc_stats, opt_state_disc=opt_disc,
            global_step=state.global_step + 1, rng=rng), logs

    # ---- validation ----------------------------------------------------------
    @jax.jit
    def eval_step(state: TrainState, x) -> Dict[str, jax.Array]:
        lmbda = state.current_lmbda()
        teacher_latent, teacher_idx = codec.apply(
            state.params, x, method=Codec.encode_to_vqgan)
        out = codec.apply(state.params, x, need_full_decode=True,
                          training=False)
        align, _ = feat_align_loss(
            out["vqgan_latent"], out["logits"], teacher_latent, teacher_idx,
            out["vq_loss"], out["bpp_loss"], mse_weight=feat_cfg.mse_weight,
            ce_weight=feat_cfg.ce_weight, vq_weight=feat_cfg.vq_weight,
            sq_weight=lmbda, split="val")
        nll, rec, p = _nll(state.lpips_params, x, out["x_hat"])
        # checkpoint-selection loss; +100 outside stage pix is applied by the
        # host loop (reference: codec_sq_fixbpp.py:821-828)
        saved_loss = rec + lmbda * out["bpp_loss"] * 2.0
        return {"val/align_loss": align, "val/rec_loss": rec,
                "val/p_loss": p, "val/nll_loss": nll,
                "val/bpp": out["bpp_loss"], "val/saved_loss": saved_loss}

    return feat_step, pix_step, eval_step
