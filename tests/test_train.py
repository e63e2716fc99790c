"""Training-harness tests on the tiny spec: one feat step, one pix step,
lambda controller, frozen-param invariance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sic_tpu.train import (FeatLossCfg, ImgLossCfg, Trainer, TrainingStrategy,
                           StageSpec, create_train_state, is_frozen_path)
from tests.test_codec_e2e import TINY

STRAT = TrainingStrategy(
    learning_rate=1e-4, start_epoch=0,
    stages=(StageSpec(1, 0, (1.0, 2.0), 2.0, 0.001),
            StageSpec(1, 0, (1.0, 2.0), 0.012, 0.007),
            StageSpec(1, 0, (1.0, 2.0), 0.015, 0.010)))


@pytest.fixture(scope="module")
def harness():
    codec, state, steps = create_train_state(
        TINY, STRAT, jax.random.PRNGKey(0),
        img_cfg=ImgLossCfg(disc_start=0, disc_ndf=16, disc_num_layers=2))
    return codec, state, steps


def _frozen_leaves(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {tuple(k.key for k in kp): np.asarray(v) for kp, v in flat
            if is_frozen_path(tuple(k.key for k in kp))}


def test_feat_step_updates_and_freezes(harness):
    codec, state, (feat_step, _, _) = harness
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3), minval=-1.0)
    before = _frozen_leaves(state.params)
    bn_before = np.asarray(
        state.params["params"]["hybrid_codec"]["quantize_feat"]["enc_q"])
    state2, logs = feat_step(state, x)
    assert np.isfinite(logs["train/align_loss"])
    after = _frozen_leaves(state2.params)
    for k in before:
        np.testing.assert_array_equal(before[k], after[k]), k
    bn_after = np.asarray(
        state2.params["params"]["hybrid_codec"]["quantize_feat"]["enc_q"])
    assert not np.array_equal(bn_before, bn_after), "trainable param did not move"
    # vqgan decoder must stay frozen during feat stages
    np.testing.assert_array_equal(
        np.asarray(state.params["params"]["vqgan"]["decoder"]["conv_out"]["kernel"]),
        np.asarray(state2.params["params"]["vqgan"]["decoder"]["conv_out"]["kernel"]))


def test_pix_step_runs_gan(harness):
    codec, state, (_, pix_step, _) = harness
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 256, 256, 3), minval=-1.0)
    state2, logs = pix_step(state, x)
    for k in ("train/ae_loss", "train/disc_loss", "train/d_weight",
              "train/rec_loss", "train/g_loss"):
        assert np.isfinite(logs[k]), k
    # vqgan decoder DOES move in stage pix
    assert not np.array_equal(
        np.asarray(state.params["params"]["vqgan"]["decoder"]["conv_out"]["kernel"]),
        np.asarray(state2.params["params"]["vqgan"]["decoder"]["conv_out"]["kernel"]))
    # discriminator moved
    assert not np.array_equal(
        np.asarray(state.disc_params["conv_out"]["kernel"]),
        np.asarray(state2.disc_params["conv_out"]["kernel"]))


def test_eval_step_and_lambda_controller(harness):
    codec, state, (_, _, eval_step) = harness
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 256, 256, 3), minval=-1.0)
    metrics = eval_step(state, x)
    assert np.isfinite(metrics["val/bpp"])
    # controller: bpp above band raises idx, below lowers, clamped
    assert STRAT.adjust_lmbda_idx(1, 0, 1.0) == 1
    assert STRAT.adjust_lmbda_idx(1, 1, 1.0) == 1     # clamped at top
    assert STRAT.adjust_lmbda_idx(1, 1, 0.0001) == 0
    assert STRAT.adjust_lmbda_idx(1, 0, 0.0001) == 0  # clamped at bottom
    assert STRAT.adjust_lmbda_idx(1, 0, 0.01) == 0    # inside band


def test_stage_schedule():
    assert STRAT.stage_at(0)[0] == "feat_wo_bpp"
    assert STRAT.stage_at(1)[0] == "feat"
    assert STRAT.stage_at(2)[0] == "pix"
    assert STRAT.stage_at(99)[0] == "pix"
    assert STRAT.total_epochs == 3


@pytest.mark.slow  # full-tier: heavy compile, coverage duplicated by faster fast-tier tests
def test_uncalibrated_lpips_warns_and_msssim_mode_trains():
    """perceptual='lpips' with no VGG ckpt must warn loudly; the
    checkpoint-free 'msssim' mode must train the pix stage end to end
    (reference loss: vqperceptual.py:67-78 — LPIPS-only, backbone always
    available there)."""
    import pytest as _pytest
    with _pytest.warns(UserWarning, match="UNCALIBRATED"):
        create_train_state(
            TINY, STRAT, jax.random.PRNGKey(11),
            img_cfg=ImgLossCfg(disc_ndf=16, disc_num_layers=2,
                               perceptual="lpips"))

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # msssim mode must NOT warn
        codec, state, (_, pix_step, eval_step) = create_train_state(
            TINY, STRAT, jax.random.PRNGKey(12),
            img_cfg=ImgLossCfg(disc_ndf=16, disc_num_layers=2,
                               perceptual="msssim"))
    x = jax.random.uniform(jax.random.PRNGKey(13), (1, 256, 256, 3),
                           minval=-1.0)
    state2, logs = pix_step(state, x)
    # 1 - MS-SSIM of two unrelated images sits in (0, 2]
    assert 0.0 < float(logs["train/p_loss"]) <= 2.0
    assert np.isfinite(logs["train/ae_loss"])
    m = eval_step(state2, x)
    assert np.isfinite(m["val/nll_loss"])


def test_unknown_perceptual_mode_rejected():
    with pytest.raises(ValueError, match="perceptual"):
        create_train_state(
            TINY, STRAT, jax.random.PRNGKey(14),
            img_cfg=ImgLossCfg(disc_ndf=16, disc_num_layers=2,
                               perceptual="vgg"))


@pytest.mark.slow  # full-tier: heavy compile, coverage duplicated by faster fast-tier tests
def test_remat_training_step():
    """save_mem path: remat'd modules train (stack_shape kept static)."""
    import dataclasses
    spec = dataclasses.replace(TINY, remat=True)
    codec, state, (feat_step, _, _) = create_train_state(
        spec, STRAT, jax.random.PRNGKey(7),
        img_cfg=ImgLossCfg(disc_start=0, disc_ndf=16, disc_num_layers=2))
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 256, 256, 3), minval=-1.0)
    state2, logs = feat_step(state, x)
    assert np.isfinite(logs["train/align_loss"])


def test_rate_floor_pushes_rate_up(harness):
    """The below-band rate hinge gives the trainer an UPWARD rate lever.

    Round-4 failure mode: lambda*bpp only ever pushes rate down, and at
    tiny scale Adam's loss-scale invariance means no lambda value can
    push it back up (train_convergence.py calibration note) — collapse
    is absorbing.  With ``state.rate_floor`` armed above the operating
    rate, ``rate_push_w * relu(rate_floor - bpp_noise)`` must (a) report
    a positive hinge, and (b) move training bpp UP over a few steps,
    while the un-armed control keeps drifting down — the sign flip the
    old loss could never produce."""
    codec, state0, (feat_step, _, _) = harness
    # batch 1 reuses the (1, 256, 256, 3) feat_step compile the module's
    # other tests already paid for — a second batch shape would recompile
    x = jax.random.uniform(jax.random.PRNGKey(21), (1, 256, 256, 3),
                           minval=-1.0)

    def run(floor, n=8):
        st = state0.replace(rate_floor=jnp.asarray(floor, jnp.float32))
        first = last = None
        for _ in range(n):
            st, logs = feat_step(st, x)
            first = first if first is not None else float(logs["train/bpp"])
            last = float(logs["train/bpp"])
        return first, last, float(logs["train/rate_push"])

    b0_f, b1_f, push = run(floor=2.0)      # far above the operating rate
    b0_c, b1_c, push_c = run(floor=0.0)    # control: hinge disabled
    assert push > 0.0
    assert push_c == 0.0
    # hinge arm gains rate; control arm loses it (both start identically)
    assert b1_f > b0_f, (b0_f, b1_f)
    assert b1_f > b1_c, (b1_f, b1_c)


@pytest.mark.slow  # full-tier: drives a real collapse (~300 tiny-spec steps)
def test_rate_collapse_recovers_under_floor():
    """Round-4 verdict item 2, end to end at tiny scale: drive the real
    trainer into rate collapse (lambda=10 crushes hard-quant bpp below
    1e-3 — the round-4 absorbing state), then show the below-band hinge
    revives the stream while the no-floor control stays dead.  Measured
    calibration: collapse by ~step 200-300, recovery to ~0.1 bpp within
    25 floor-armed steps (DESIGN.md §13)."""
    import sys as _sys
    from pathlib import Path as _P
    _sys.path.insert(0, str(_P(__file__).resolve().parents[1] / "benchmarks"))
    from train_convergence import FreshSampler

    # self-contained state at lr 1e-3: collapse speed scales with the
    # learning rate, and the shared harness's 1e-4 leaves the stream
    # alive after 300 steps (measured 0.012 bpp) — the prototype numbers
    # below are calibrated at 1e-3
    strat = TrainingStrategy(
        learning_rate=1e-3, start_epoch=0,
        stages=(StageSpec(99, 0, (10.0,), 10.0, 0.0),
                StageSpec(0, 0, (10.0,), 10.0, 0.0),
                StageSpec(0, 0, (10.0,), 10.0, 0.0)))
    codec, state0, (feat_step, _, eval_step) = create_train_state(
        TINY, strat, jax.random.PRNGKey(0),
        img_cfg=ImgLossCfg(disc_ndf=16, disc_num_layers=2,
                           perceptual="msssim"))
    sampler = FreshSampler(7, px=256)
    val = jnp.asarray(sampler.batch(2))

    # -- collapse under a crushing rate weight --------------------------
    st = state0
    hard = 1.0
    for i in range(400):
        st, _logs = feat_step(st, jnp.asarray(sampler.batch(2)))
        if i % 25 == 24:
            hard = float(eval_step(st, val)["val/bpp"])
            if hard < 5e-4:
                break
    assert hard < 5e-4, f"collapse did not happen (hard bpp {hard})"
    collapsed = st

    # -- recovery: floor armed vs control -------------------------------
    # Measured nuance (collapse prototype, 2026-08-20): at tiny scale the
    # FEAT objective's alignment gradient alone also revives the stream
    # once lambda releases — the round-4 absorbing state needed the pix
    # objective (align_weight 0) plus a decoder adapted to the dead
    # stream.  What the hinge buys, provably at this scale, is (a) a
    # recovery lever that is objective-INDEPENDENT (it acts through the
    # rate term itself, present in every stage) and (b) ~4x faster
    # recovery: noise bpp 0.006 -> 0.105 in 25 floor-armed steps vs
    # ~0.028 for the control at the same step count.
    def recover(floor, n=25):
        s = collapsed.replace(
            rate_floor=jnp.asarray(floor, jnp.float32),
            lmbda_list=jnp.asarray([1e-4], jnp.float32),
            lmbda_idx=jnp.asarray(0, jnp.int32))
        logs = None
        for _ in range(n):
            s, logs = feat_step(s, jnp.asarray(sampler.batch(2)))
        return float(eval_step(s, val)["val/bpp"]), float(logs["train/bpp"])

    hard_f, noise_f = recover(floor=0.03)
    hard_c, noise_c = recover(floor=0.0)
    assert noise_f >= 0.024, (hard_f, noise_f)      # back at/above the band
    assert hard_f >= 0.01, (hard_f, noise_f)        # real stream revived
    assert noise_f > 2.0 * noise_c, (noise_f, noise_c)  # hinge >> passive
