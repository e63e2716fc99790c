"""Four-part autoregressive spatial-channel prior (pure JAX + host drivers).

The latent is split into 4 channel quarters x 4 checkerboard phases; the four
coding steps each condition a spatial-prior CNN on everything decoded so far
(reference: src/entropy/compression_model.py:241-418).

Layout note: this framework is NHWC (TPU-native); channel chunks are on the
last axis.  Masks are static per shape and constant-folded by XLA.

Bit-exactness contract: the encode driver reconstructs ``y_hat`` from the
*written integer planes* with the same jitted step functions the decode
driver uses, so encoder and decoder walk numerically identical trajectories
— the analogue of the reference's ``Σ|y_hat_dec − y_hat_fwd| == 0``
invariant (reference: src/models/sq_bottleneck.py:210-211).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import lower_bound


def quant_ste(x):
    """Round with straight-through gradients (reference: compression_model.py:87-93)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def add_uniform_noise(x, key, level: float = 0.5):
    return x + jax.random.uniform(key, x.shape, x.dtype, -level, level)


def checkerboard_masks(height: int, width: int, dtype=jnp.float32):
    """The four 2x2 one-hot phase masks, each (H, W)."""
    r = np.arange(height)[:, None] % 2
    c = np.arange(width)[None, :] % 2
    m0 = ((r == 0) & (c == 0)).astype(np.float32)
    m1 = ((r == 0) & (c == 1)).astype(np.float32)
    m2 = ((r == 1) & (c == 0)).astype(np.float32)
    m3 = ((r == 1) & (c == 1)).astype(np.float32)
    return tuple(jnp.asarray(m, dtype) for m in (m0, m1, m2, m3))


def four_part_masks(height: int, width: int, channels: int, dtype=jnp.float32):
    """Step masks (4, H, W, C): channel quarters rotate through the four
    checkerboard phases (reference: compression_model.py:269-283)."""
    assert channels % 4 == 0
    m0, m1, m2, m3 = checkerboard_masks(height, width, dtype)
    quarter = channels // 4

    def cat(phases):
        return jnp.concatenate(
            [jnp.broadcast_to(p[:, :, None], (height, width, quarter)) for p in phases],
            axis=-1)

    mask_0 = cat((m0, m1, m2, m3))
    mask_1 = cat((m3, m2, m1, m0))
    mask_2 = cat((m2, m3, m0, m1))
    mask_3 = cat((m1, m0, m3, m2))
    return jnp.stack([mask_0, mask_1, mask_2, mask_3])


def combine_for_writing(x):
    """Collapse the 4 channel quarters by addition -> (B, H, W, C/4).

    At any step exactly one quarter is live per spatial position, so the sum
    is a gather (reference: compression_model.py:296-301)."""
    x0, x1, x2, x3 = jnp.split(x, 4, axis=-1)
    return (x0 + x1) + (x2 + x3)


def uncombine(plane, mask):
    """Scatter a written plane back to full channels under ``mask``."""
    return jnp.concatenate([plane] * 4, axis=-1) * mask


def separate_prior(params, variant: str = "quantstep3"):
    """Split fused prior features (reference: compression_model.py:208-210, 675-677)."""
    if variant == "quantstep3":
        quant_step, scales, means = jnp.split(params, 3, axis=-1)
        return quant_step, scales, means
    if variant == "plain2":
        scales, means = jnp.split(params, 2, axis=-1)
        return None, scales, means
    raise ValueError(variant)


def process_with_mask(y, scales, means, mask, training: bool,
                      force_zero_thres: Optional[float]):
    """Quantize the masked positions (reference: compression_model.py:224-239)."""
    scales_hat = scales * mask
    means_hat = means * mask
    y_res = (y - means_hat) * mask
    y_q = quant_ste(y_res) if training else jnp.round(y_res)
    if (not training) and force_zero_thres is not None:
        cond = scales_hat < force_zero_thres
        y_q = jnp.where(cond, 0.0, y_q)
        scales_hat = jnp.where(cond, 0.0, scales_hat)
    y_hat = y_q + means_hat
    return y_res, y_q, y_hat, scales_hat


class FourPartForward(NamedTuple):
    y_res: jax.Array
    y_q: jax.Array
    y_hat: jax.Array
    scales_hat: jax.Array


StepFn = Callable[[jax.Array, jax.Array], tuple]  # (y_hat_so_far, common) -> (scales, means)


def forward_four_part_prior(y, common_params, step_fns: Sequence[StepFn],
                            reduction_fn: Optional[Callable] = None,
                            training: bool = False,
                            force_zero_thres: Optional[float] = None,
                            variant: str = "quantstep3") -> FourPartForward:
    """Fused simulation of all four coding steps (training / bpp eval).

    (reference: compression_model.py:303-366)
    """
    quant_step, scales, means = separate_prior(common_params, variant)
    common = reduction_fn(common_params) if reduction_fn is not None else common_params
    B, H, W, C = y.shape
    masks = four_part_masks(H, W, C, y.dtype)

    if quant_step is not None:
        quant_step = lower_bound(quant_step, 0.5) if training else jnp.maximum(quant_step, 0.5)
        y = y / quant_step

    y_res_0, y_q_0, y_hat_0, s_hat_0 = process_with_mask(
        y, scales, means, masks[0], training, force_zero_thres)
    y_hat_so_far = y_hat_0

    outs = [(y_res_0, y_q_0, s_hat_0)]
    for i, step_fn in enumerate(step_fns):
        scales, means = step_fn(y_hat_so_far, common)
        y_res_i, y_q_i, y_hat_i, s_hat_i = process_with_mask(
            y, scales, means, masks[i + 1], training, force_zero_thres)
        y_hat_so_far = y_hat_so_far + y_hat_i
        outs.append((y_res_i, y_q_i, s_hat_i))

    y_res = sum(o[0] for o in outs)
    y_q = sum(o[1] for o in outs)
    scales_hat = sum(o[2] for o in outs)
    y_hat = y_hat_so_far
    if quant_step is not None:
        y_hat = y_hat * quant_step
    return FourPartForward(y_res, y_q, y_hat, scales_hat)
