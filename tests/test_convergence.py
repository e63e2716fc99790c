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


def test_val_bpp_enters_band(summary):
    # trajectory starts above the calibrated band and passes into it
    # during a band-enforced epoch (it cannot HOLD the band at tiny
    # scale — see the calibration note in train_convergence.run)
    assert summary["val_bpp_trajectory"][0] > summary["band"][1], summary
    assert summary["band_entered"], summary


def test_pix_stage_psnr_does_not_degrade(summary):
    # at this step count we require improvement-or-hold; the committed
    # TRAIN artifact demonstrates the longer run's strict improvement
    assert summary["pix_psnr_end"] >= summary["pix_psnr_start"] - 0.1, summary
