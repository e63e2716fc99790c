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
