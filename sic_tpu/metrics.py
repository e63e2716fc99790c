"""Image quality metrics (pure JAX): PSNR, SSIM, MS-SSIM.

The reference pulls ``pytorch_msssim`` (reference: src/entropy/
compression_model.py:9,48) and computes no standalone eval metrics;
these jitted implementations back the rate-distortion benchmarks and the
distortion losses.  MS-SSIM follows Wang et al. (11x11 gaussian window,
sigma 1.5, standard five power factors), matching pytorch_msssim defaults.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a, b, data_range: float = 2.0):
    """Peak SNR; default range 2.0 for [-1, 1] images.  Returns (B,)."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _blur(x, kernel):
    """Depthwise valid-conv gaussian blur, NHWC."""
    C = x.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None],
                         (*kernel.shape, 1, C)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def _ssim_per_scale(a, b, kernel, data_range):
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = _blur(a, kernel), _blur(b, kernel)
    aa = _blur(a * a, kernel) - mu_a * mu_a
    bb = _blur(b * b, kernel) - mu_b * mu_b
    ab = _blur(a * b, kernel) - mu_a * mu_b
    cs = (2 * ab + c2) / (aa + bb + c2)
    ssim_map = ((2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)) * cs
    axes = (1, 2, 3)
    return jnp.mean(ssim_map, axes), jnp.mean(cs, axes)


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(a, b, data_range: float = 2.0):
    """Single-scale SSIM over NHWC images.  Returns (B,)."""
    k = _gaussian_kernel()
    s, _ = _ssim_per_scale(a.astype(jnp.float32), b.astype(jnp.float32),
                           k, data_range)
    return s


def _downsample2(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID") / 4.0


@functools.partial(jax.jit, static_argnames=("data_range",))
def ms_ssim(a, b, data_range: float = 2.0):
    """Multi-scale SSIM (5 scales); images must be >= 176 px.  Returns (B,)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    k = _gaussian_kernel()
    vals = []
    last = len(_MSSSIM_WEIGHTS) - 1
    for i, w in enumerate(_MSSSIM_WEIGHTS):
        s, cs = _ssim_per_scale(a, b, k, data_range)
        # Floor at a small EPS, not 0: d(x^w)/dx = w*x^(w-1) is infinite at
        # x=0 for fractional w, and cs goes negative (clamping to the floor)
        # on anticorrelated patches — exactly what an early random decoder
        # produces — which NaN'd training when this is used as a loss.
        # (pytorch_msssim's relu clamp has the same singularity.)
        vals.append(jnp.maximum(s if i == last else cs, 1e-4) ** w)
        if i != last:
            a, b = _downsample2(a), _downsample2(b)
    out = vals[0]
    for v in vals[1:]:
        out = out * v
    return out
