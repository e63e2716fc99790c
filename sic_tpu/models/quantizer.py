"""Vector quantizers (pure JAX + flax param holders).

Two quantizers ship in the codec:

- :class:`L2VectorQuantizer` — the semantic (TiTok) stream's l2-normalized
  codebook (reference: src/titok/quantizer.py:30-95).  Quantization runs in
  an fp32 island regardless of compute dtype, as the reference forces.
- :class:`VQGANQuantizer` — the taming VQGAN codebook used by the pixel
  decoder (reference: src/taming/modules/vqvae/quantize.py:213-330).

The argmin is one codebook matmul + argmax — MXU-shaped, no gather loops.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _l2n(x, axis=-1, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _centered_uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def nearest_code(z_flat, codebook):
    """argmin_j ||z - c_j||^2 via a single (N, D) x (D, K) matmul."""
    z32 = z_flat.astype(jnp.float32)
    cb32 = codebook.astype(jnp.float32)
    scores = 2.0 * (z32 @ cb32.T) - jnp.sum(cb32 * cb32, axis=-1)[None, :]
    return jnp.argmax(scores, axis=-1)


class L2VectorQuantizer(nn.Module):
    """l2-normalized VQ with straight-through estimator.

    Operates on token sequences ``(B, N, token_size)`` (the reference's fake
    2D NCHW ``(B, C, 1, N)`` has no TPU purpose).
    """
    codebook_size: int = 4096
    token_size: int = 12
    commitment_cost: float = 0.25
    use_l2_norm: bool = True

    def setup(self):
        self.embedding = self.param(
            "embedding", _centered_uniform(1.0 / self.codebook_size),
            (self.codebook_size, self.token_size))

    def codebook(self):
        return _l2n(self.embedding) if self.use_l2_norm else self.embedding

    def __call__(self, z) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        B, N, C = z.shape
        z32 = z.astype(jnp.float32)
        z_flat = z32.reshape(-1, C)
        if self.use_l2_norm:
            z_flat = _l2n(z_flat)
        cb = self.codebook()
        idx = nearest_code(z_flat, cb)
        z_q = cb[idx].reshape(B, N, C)
        z_cmp = _l2n(z32, axis=-1) if self.use_l2_norm else z32

        commitment = self.commitment_cost * jnp.mean(
            (jax.lax.stop_gradient(z_q) - z_cmp) ** 2)
        codebook_loss = jnp.mean((z_q - jax.lax.stop_gradient(z_cmp)) ** 2)
        z_q = z_cmp + jax.lax.stop_gradient(z_q - z_cmp)
        return z_q.astype(z.dtype), {
            "quantizer_loss": commitment + codebook_loss,
            "commitment_loss": commitment,
            "codebook_loss": codebook_loss,
            "min_encoding_indices": idx.reshape(B, N),
        }

    def decode_indices(self, indices):
        """(..,) int32 -> (.., token_size), l2-normalized to match encode."""
        z_q = self.codebook()[indices]
        return _l2n(z_q) if self.use_l2_norm else z_q


class VQGANQuantizer(nn.Module):
    """taming-style nearest-neighbour VQ (beta-weighted commitment).

    (reference: taming/modules/vqvae/quantize.py:213-330, ``sane_index_shape``
    behavior is the default here — indices come back as (B, H, W).)
    """
    n_embed: int = 256
    embed_dim: int = 256
    beta: float = 0.25

    def setup(self):
        self.embedding = self.param(
            "embedding", _centered_uniform(1.0 / self.n_embed),
            (self.n_embed, self.embed_dim))

    def codebook(self):
        return self.embedding

    def __call__(self, z) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
        """z: (B, H, W, C) -> (z_q, loss, info)."""
        B, H, W, C = z.shape
        z32 = z.astype(jnp.float32)
        cb = self.codebook()
        idx = nearest_code(z32.reshape(-1, C), cb)
        z_q = cb[idx].reshape(B, H, W, C)
        loss = (jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2) * self.beta
                + jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2))
        z_q = z32 + jax.lax.stop_gradient(z_q - z32)
        return z_q.astype(z.dtype), loss, {"indices": idx.reshape(B, H, W)}

    def embed_code(self, indices):
        return self.codebook()[indices]
