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
