"""Training losses (pure functions over flax apply outputs).

Counterparts of the reference loss modules:
- feat-alignment loss (reference: src/losses/feat_mse.py:24-45)
- VQ-LPIPS-GAN image loss with adaptive discriminator weight
  (reference: src/taming/modules/losses/vqperceptual.py:37-162)

The adaptive weight ||d(nll)/dW|| / ||d(g)/dW|| at the decoder's *last
conv layer* is computed with a nested ``jax.grad`` over just that kernel —
only the final conv and the loss heads are re-differentiated, not the whole
network (cheaper than the reference's retain_graph double backward).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, labels):
    """Mean CE over all positions; logits (..., K), integer labels (...)."""
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits.reshape(-1, logits.shape[-1]), labels.reshape(-1)))


def feat_align_loss(feat_in, logits_in, feat_target, label_target,
                    vq_loss, sq_loss, *, mse_weight=1.0, ce_weight=0.25,
                    vq_weight=1.0, sq_weight=8.0, split="train"
                    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Stage-0/1 alignment loss (reference: feat_mse.py:32-45)."""
    mse = jnp.mean((feat_in - feat_target) ** 2)
    ce = cross_entropy(logits_in, label_target)
    total = mse_weight * mse + ce_weight * ce + vq_weight * vq_loss \
        + sq_weight * sq_loss
    return total, {
        f"{split}/mse_loss": mse,
        f"{split}/ce_loss": ce,
        f"{split}/sq_loss": sq_loss,
        f"{split}/vq_loss": vq_loss,
        f"{split}/sq_lambda": jnp.asarray(sq_weight),
    }


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(nn_relu(1.0 - logits_real))
                  + jnp.mean(nn_relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    """(reference: vqperceptual.py:26-29) — jit-safe on traced step."""
    return jnp.where(global_step < threshold, value, weight)


def adaptive_d_weight(last_kernel, nll_of_kernel: Callable,
                      g_of_kernel: Callable, *, disc_weight: float,
                      max_weight: float = 1e4):
    """d_weight = ||grad_W nll|| / (||grad_W g|| + 1e-4), clamped
    (reference: vqperceptual.py:67-78)."""
    nll_grads = jax.grad(nll_of_kernel)(last_kernel)
    g_grads = jax.grad(g_of_kernel)(last_kernel)
    d_weight = (jnp.linalg.norm(nll_grads.reshape(-1))
                / (jnp.linalg.norm(g_grads.reshape(-1)) + 1e-4))
    d_weight = jnp.clip(d_weight, 0.0, max_weight)
    return jax.lax.stop_gradient(d_weight) * disc_weight
