"""Host-side training loop: stage schedule, rate control, checkpoints.

The reference has **no training entry script** — it relies on a Lightning
``main.py`` convention (SURVEY.md §1 note).  This module is the explicit
harness: epoch loop with per-epoch strategy selection
(reference: codec_sq_fixbpp.py:554-593), validation-bpp lambda controller
(:608-639), stage-transition checkpoints (:577-582) and orbax persistence of
the schedule state.
"""
from __future__ import annotations

import dataclasses

import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp


from ..models.codec import Codec, CodecSpec
from ..models.discriminator import NLayerDiscriminator
from ..models.lpips import LPIPS
from .state import (TrainState, make_ae_optimizer, make_disc_optimizer)
from .steps import FeatLossCfg, ImgLossCfg, make_steps
from .strategy import TrainingStrategy


def create_train_state(spec: CodecSpec, strategy: TrainingStrategy,
                       rng, feat_cfg: FeatLossCfg = FeatLossCfg(),
                       img_cfg: ImgLossCfg = ImgLossCfg(),
                       image_hw=None, tune_titok: bool = False,
                       codec_params=None, dtype=None,
                       donate: bool = False, mu_dtype=None,
                       frozen_dtype=None, lpips_lin=None, lpips_vgg=None,
                       pp=None):
    """Initialize models, optimizers and the jitted step functions.

    Single-chip big-model knobs: ``donate=True`` reuses state buffers
    across steps; ``mu_dtype=jnp.bfloat16`` halves Adam first-moment
    memory; ``frozen_dtype=jnp.bfloat16`` stores the frozen backbones in
    bf16 (they are inference-only).

    ``lpips_lin``/``lpips_vgg``: torch checkpoints for the LPIPS
    calibration heads and VGG16 backbone.  With ``img_cfg.perceptual ==
    "lpips"`` and no backbone checkpoint, the perceptual term would score
    features of a RANDOM network — a loud warning is emitted and callers
    should prefer ``perceptual="msssim"`` in checkpoint-free environments
    (the reference always has torchvision's VGG16 available;
    taming/modules/losses/lpips.py:11-123)."""
    from .state import cast_frozen_params

    # validate config BEFORE any model init — a bad flag must fail in
    # milliseconds, not after the full codec/LPIPS build
    if img_cfg.perceptual not in ("lpips", "msssim", "none"):
        raise ValueError(f"unknown perceptual mode: {img_cfg.perceptual!r}")

    r_codec, r_disc, r_lpips, r_state = jax.random.split(rng, 4)
    hw = image_hw or (spec.tile_px, spec.tile_px)
    codec = Codec(spec, dtype, pp)
    if codec_params is None:
        from ..models.codec import init_codec
        _, codec_params = init_codec(spec, r_codec, hw, dtype, pp=pp)
    if frozen_dtype is not None:
        codec_params = cast_frozen_params(codec_params, frozen_dtype,
                                          tune_titok)

    disc = NLayerDiscriminator(ndf=img_cfg.disc_ndf,
                               n_layers=img_cfg.disc_num_layers)
    dummy = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    disc_vars = disc.init(r_disc, dummy, train=False)

    lpips = LPIPS()
    lpips_params = lpips.init(r_lpips, dummy, dummy)
    if lpips_lin or lpips_vgg:
        from ..models.lpips import port_lpips_params
        lpips_params = port_lpips_params(lpips_params, lpips_lin, lpips_vgg)
    if img_cfg.perceptual == "lpips" and not lpips_vgg:
        import warnings
        warnings.warn(
            "perceptual='lpips' without --lpips_vgg: the VGG16 backbone is "
            "UNCALIBRATED (random weights) and the perceptual loss is "
            "meaningless. Pass a torchvision VGG16 checkpoint or train with "
            "perceptual='msssim'.", stacklevel=2)

    ae_tx, opt_state_ae = make_ae_optimizer(codec_params,
                                            strategy.learning_rate, tune_titok,
                                            mu_dtype=mu_dtype)
    disc_tx = make_disc_optimizer(strategy.learning_rate)

    start = strategy.start_epoch
    _, stage0 = strategy.stage_at(start)
    state = TrainState(
        params=codec_params,
        opt_state_ae=opt_state_ae,
        disc_params=disc_vars["params"],
        disc_stats=disc_vars.get("batch_stats", {}),
        opt_state_disc=disc_tx.init(disc_vars["params"]),
        lpips_params=lpips_params,
        global_step=jnp.asarray(0, jnp.int32),
        epoch_for_strategy=jnp.asarray(start, jnp.int32),
        lmbda_idx=jnp.asarray(stage0.init_lmbda_idx, jnp.int32),
        lmbda_list=jnp.asarray(stage0.lmbda_list, jnp.float32),
        rate_floor=jnp.asarray(stage0.bpp_lower, jnp.float32),
        rng=r_state,
    )
    steps = make_steps(codec, disc, lpips, feat_cfg, img_cfg, ae_tx, disc_tx,
                       tune_titok=tune_titok, donate=donate)
    return codec, state, steps


# -- orbax checkpointing -------------------------------------------------------

def save_checkpoint(ckpt_dir, state: TrainState, step: Optional[int] = None,
                    name: Optional[str] = None):
    import orbax.checkpoint as ocp
    path = Path(ckpt_dir).resolve()
    path.mkdir(parents=True, exist_ok=True)
    tag = name if name is not None else f"step_{step or int(state.global_step)}"
    # Multi-process runs: EVERY rank must call this (orbax's atomic-commit
    # protocol runs coordination-service barriers whenever
    # jax.process_count() > 1 — a rank-0-only save deadlocks the job), and
    # the leaves must not be jax.Arrays (the schedule scalars are
    # host-local SingleDeviceSharding, which orbax refuses to serialize
    # multi-host).  State is replicated, so materializing to numpy on
    # every rank is consistent; orbax then writes from the primary and
    # the other ranks just participate in the barriers.
    if jax.process_count() > 1:
        import numpy as _np
        state = jax.tree.map(
            lambda x: _np.asarray(x) if isinstance(x, jax.Array) else x,
            state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / tag, state, force=True)
    return str(path / tag)


def load_checkpoint(ckpt_path, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(ckpt_path).resolve(), template)


# -- the loop -------------------------------------------------------------------

@dataclasses.dataclass
class Trainer:
    """Drives the 3-stage schedule over data iterables.

    ``train_data`` / ``val_data`` are callables returning fresh iterables of
    (B, H, W, 3) float arrays in [-1, 1] per epoch.
    """
    codec: Codec
    state: TrainState
    steps: tuple                      # (feat_step, pix_step, eval_step)
    strategy: TrainingStrategy
    ckpt_dir: Optional[str] = None
    log_fn: Callable[[Dict], None] = lambda logs: None
    log_every: int = 50

    def train_epoch(self, train_data: Iterable) -> str:
        """One epoch at the current schedule position; returns stage name."""
        epoch = int(self.state.epoch_for_strategy)
        stage, spec = self.strategy.stage_at(epoch)
        feat_step, pix_step, _ = self.steps
        step_fn = pix_step if stage == "pix" else feat_step

        for i, batch in enumerate(train_data):
            self.state, logs = step_fn(self.state, jnp.asarray(batch))
            if i % self.log_every == 0:
                self.log_fn({k: float(v) for k, v in logs.items()}
                            | {"epoch": epoch, "stage": stage})
        return stage

    def validate(self, val_data: Iterable) -> Dict[str, float]:
        _, _, eval_step = self.steps
        sums: Dict[str, float] = {}
        n = 0
        for batch in val_data:
            metrics = eval_step(self.state, jnp.asarray(batch))
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        means = {k: v / max(n, 1) for k, v in sums.items()}
        epoch = int(self.state.epoch_for_strategy)
        stage, _ = self.strategy.stage_at(epoch)
        if stage != "pix":  # only final-stage ckpts can win the monitor
            means["val/saved_loss"] = means.get("val/saved_loss", 0.0) + 100.0
        return means

    def end_of_epoch(self, val_metrics: Optional[Dict[str, float]] = None):
        """Advance the schedule; adjust lambda; write stage checkpoints."""
        epoch = int(self.state.epoch_for_strategy)
        stage, spec = self.strategy.stage_at(epoch)

        if val_metrics is not None and stage != "feat_wo_bpp":
            new_idx = self.strategy.adjust_lmbda_idx(
                epoch, int(self.state.lmbda_idx), val_metrics["val/bpp"])
            self.state = self.state.replace(
                lmbda_idx=jnp.asarray(new_idx, jnp.int32))

        next_epoch = epoch + 1
        next_stage, next_spec = self.strategy.stage_at(next_epoch)
        if next_stage != stage:
            if self.ckpt_dir:
                save_checkpoint(self.ckpt_dir, self.state,
                                name=f"{stage}_epo_for_strategy_{epoch}")
            # stage change resets the lambda schedule (reference: :571-575)
            # and re-arms the rate floor at the new stage's band edge (the
            # below-band hinge that makes rate collapse non-absorbing;
            # round-4 failure: val bpp 0.042 -> 0.0 with 16 correct
            # lambda-down moves and no recovery lever)
            self.state = self.state.replace(
                lmbda_idx=jnp.asarray(next_spec.init_lmbda_idx, jnp.int32),
                lmbda_list=jnp.asarray(next_spec.lmbda_list, jnp.float32),
                rate_floor=jnp.asarray(next_spec.bpp_lower, jnp.float32))
        self.state = self.state.replace(
            epoch_for_strategy=jnp.asarray(next_epoch, jnp.int32))

    def log_images(self, batch) -> Dict[str, Any]:
        """Reconstruction pairs for the image logger
        (reference: codec_sq_fixbpp.py:832-838)."""
        out = self.codec.apply(self.state.params, jnp.asarray(batch),
                               need_full_decode=True)
        return {"x": out["x"], "x_hat": out["x_hat"]}

    def fit(self, train_data_fn, val_data_fn, epochs: Optional[int] = None):
        total = epochs if epochs is not None else (
            self.strategy.total_epochs - int(self.state.epoch_for_strategy))
        for _ in range(total):
            t0 = time.time()
            stage = self.train_epoch(train_data_fn())
            val = self.validate(val_data_fn()) if val_data_fn else None
            self.end_of_epoch(val)
            self.log_fn({"epoch_done": int(self.state.epoch_for_strategy) - 1,
                         "stage": stage, "epoch_s": time.time() - t0,
                         **({f"mean_{k}": v for k, v in val.items()} if val else {})})
            self._epoch_barrier()
        if self.ckpt_dir:
            save_checkpoint(self.ckpt_dir, self.state, name="last")

    def _epoch_barrier(self):
        """Re-align the ranks each epoch in multi-process runs: only rank 0
        writes stage checkpoints / logs, and letting the other ranks race
        minutes ahead turns the next collective into a gloo timeout.
        No-op single-process."""
        import jax
        if jax.process_count() <= 1:
            return
        from ..parallel.multihost import barrier
        barrier(f"epoch_{int(self.state.epoch_for_strategy)}")
