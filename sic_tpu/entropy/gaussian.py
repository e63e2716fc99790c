"""On-device (jit) math for the scale-indexed Gaussian/Laplace coder.

Pure JAX: likelihoods for training bpp, bit estimates for eval, and the
scale -> CDF-table-index map consumed by the host rANS coder.
(reference behaviours: src/entropy/entropy_models.py:252-374,
src/entropy/compression_model.py:87-160)
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .tables import GAUSSIAN_SCALE_MIN, LAPLACE_SCALE_MIN, SCALE_MAX, SCALE_LEVELS


@jax.custom_vjp
def lower_bound(x, bound):
    """max(x, bound) with a straight-through-ish gradient.

    Gradients pass when x >= bound, or when they push x up toward the bound
    (reference: entropy_models.py:14-28).
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x >= bound,)


def _lower_bound_bwd(res, g):
    (passthrough,) = res
    gate = jnp.logical_or(passthrough, g < 0)
    return (jnp.where(gate, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def gaussian_prob(values, scales):
    """P(round(v) == v | N(0, scale)) via erfc, training-mode surrogate."""
    const = -(2.0 ** -0.5)
    scales = lower_bound(scales, GAUSSIAN_SCALE_MIN)
    values = jnp.abs(values)
    upper = jax.scipy.special.erfc(const * (0.5 - values) / scales)
    lower = jax.scipy.special.erfc(const * (-0.5 - values) / scales)
    return lower_bound(0.5 * (upper - lower), 1e-9)


def laplace_prob(values, scales):
    scales = lower_bound(scales, LAPLACE_SCALE_MIN)

    def _cdf2(x):
        return jnp.sign(x) * (1.0 - jnp.exp(-jnp.abs(x)))

    upper = _cdf2((values + 0.5) / scales)
    lower = _cdf2((values - 0.5) / scales)
    return lower_bound(0.5 * (upper - lower), 1e-9)


def probs_to_bits(probs):
    bits = -jnp.log(probs + 1e-5) / math.log(2.0)
    return lower_bound(bits, 0.0)


def gaussian_bits(y, sigma, training: bool):
    """Per-element bit cost of quantized y under N(0, sigma)."""
    if training:
        return probs_to_bits(gaussian_prob(y, sigma))
    sigma = jnp.clip(sigma, 1e-5, 1e10)
    probs = (jax.scipy.stats.norm.cdf(y + 0.5, scale=sigma)
             - jax.scipy.stats.norm.cdf(y - 0.5, scale=sigma))
    return probs_to_bits(probs)


def laplace_bits(y, sigma, training: bool):
    if training:
        return probs_to_bits(laplace_prob(y, sigma))
    sigma = jnp.clip(sigma, 1e-5, 1e10)
    half = 0.5 * jnp.exp(-jnp.abs(y + 0.5) / sigma)
    upper = jnp.where(y + 0.5 < 0, half, 1.0 - half)
    half2 = 0.5 * jnp.exp(-jnp.abs(y - 0.5) / sigma)
    lower = jnp.where(y - 0.5 < 0, half2, 1.0 - half2)
    return probs_to_bits(upper - lower)


@partial(jax.jit, static_argnames=("distribution", "levels"))
def build_indexes(scales, skip_thres=None, distribution: str = "gaussian",
                  levels: int = SCALE_LEVELS):
    """Map scales to CDF table indexes; positions below the skip threshold
    get index -1 and are dropped by the host coder
    (reference: entropy_models.py:355-362)."""
    smin = GAUSSIAN_SCALE_MIN if distribution == "gaussian" else LAPLACE_SCALE_MIN
    log_min = math.log(smin)
    step = (math.log(SCALE_MAX) - log_min) / (levels - 1)
    s = jnp.maximum(scales, 1e-5)
    idx = (jnp.log(s) - log_min) / step
    idx = jnp.clip(idx, 0, levels - 1)
    if skip_thres is not None:
        idx = jnp.where(scales < skip_thres, -1.0, idx)
    return idx.astype(jnp.int32)
