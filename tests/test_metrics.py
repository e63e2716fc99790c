"""Metric sanity + oracle checks (pytorch_msssim is not installed; SSIM is
validated against its closed-form behavior on known cases)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sic_tpu.metrics import ms_ssim, psnr, ssim


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.2)
    # mse = 0.04, range 2 -> 10*log10(4/0.04) = 20 dB
    np.testing.assert_allclose(np.asarray(psnr(a, b)), [20.0], rtol=1e-5)
    assert float(psnr(a, a)[0]) > 100


def test_ssim_identity_and_ordering():
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 32, 32, 3), minval=-1.0)
    s_same = np.asarray(ssim(x, x))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)

    small = x + 0.05 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    big = x + 0.4 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
    assert np.all(np.asarray(ssim(x, small)) > np.asarray(ssim(x, big)))
    assert np.all(np.asarray(ssim(x, big)) > -1.0)


def test_ms_ssim_identity_and_range():
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 192, 192, 3), minval=-1.0)
    np.testing.assert_allclose(np.asarray(ms_ssim(x, x)), 1.0, atol=1e-4)
    y = x + 0.3 * jax.random.normal(jax.random.PRNGKey(4), x.shape)
    v = float(ms_ssim(x, y)[0])
    assert 0.0 <= v < 1.0


def test_ms_ssim_gradient_finite_on_anticorrelated_inputs():
    """1 - ms_ssim is a TRAINING loss (ImgLossCfg.perceptual='msssim'): its
    gradient must stay finite even where cs <= 0 (anticorrelated patches,
    i.e. an early random decoder) — the naive relu-then-pow form has an
    infinite derivative at the clamp and NaN'd the pix stage."""
    import jax
    import jax.numpy as jnp

    from sic_tpu.metrics import ms_ssim

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))
    g = jax.grad(lambda b: jnp.mean(1.0 - ms_ssim(a, b)))(-a * 0.3)
    assert bool(jnp.isfinite(g).all())
