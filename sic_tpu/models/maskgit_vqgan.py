"""MaskGIT-VQGAN pixel tokenizer (flax, NHWC).

TPU re-design of the CNN VQGAN variant TiTok uses as its pixel-space
tokenizer/decoder (reference: src/titok/maskgit_vqgan.py:157-381 — itself
the open-muse MaskGIT port).  This is the `pixel_quantize`/`pixel_decoder`
pair inside the full `TiTok` model (reference: titok/titok.py:93-103) and
the `PretrainedTokenizer` (titok/titok.py:30-71).

Design notes vs the torch original:

- NHWC throughout; GroupNorm acts on the trailing channel axis.
- All convs are stride 1 (down/upsampling is avg-pool / nearest-repeat), so
  torch's ceil-mode ``Conv2dSame`` padding reduces to plain ``SAME``.
- The reference ResnetBlock carries an upstream quirk: when in/out channel
  counts differ, the "shortcut" 1x1 conv is applied to the block *output*,
  not the input (maskgit_vqgan.py:87-88: ``residual =
  self.nin_shortcut(hidden_states)`` after conv2).  Replicated exactly so
  pretrained checkpoints reproduce.
- The quantizer exposes the soft-decode einsum TiTok's generative decode
  path uses (titok/titok.py:128-131): softmax over codebook logits times
  the embedding table — one MXU matmul in NHWC.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MaskGITVQGANSpec:
    """Pixel-tokenizer config (reference: titok/titok.py:33-40 OmegaConf)."""
    hidden_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    num_channels: int = 3
    num_embeddings: int = 1024
    embedding_dim: int = 256
    commitment_cost: float = 0.25

    @property
    def num_resolutions(self) -> int:
        return len(self.channel_mult)


def _gn(name: str, dtype=None):
    # torch GroupNorm(32, ch, eps=1e-6) parity
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name, dtype=dtype)


class PixelResnetBlock(nn.Module):
    """(reference: maskgit_vqgan.py:54-91)"""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn("norm1", self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv1")(h)
        h = _gn("norm2", self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_ch:
            # upstream quirk: the 1x1 shortcut reads the block OUTPUT
            # (maskgit_vqgan.py:87-88), so the result is h + conv1x1(h).
            x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="nin_shortcut")(h)
        return h + x


class PixelEncoder(nn.Module):
    """(reference: maskgit_vqgan.py:159-198)"""
    spec: MaskGITVQGANSpec = MaskGITVQGANSpec()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        s = self.spec
        h = nn.Conv(s.hidden_channels, (3, 3), use_bias=False,
                    dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(s.channel_mult):
            for j in range(s.num_res_blocks):
                h = PixelResnetBlock(s.hidden_channels * mult, self.dtype,
                                     name=f"down_{i}_block_{j}")(h)
            if i != s.num_resolutions - 1:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        for j in range(s.num_res_blocks):
            h = PixelResnetBlock(s.hidden_channels * s.channel_mult[-1],
                                 self.dtype, name=f"mid_{j}")(h)
        h = _gn("norm_out", self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(s.z_channels, (1, 1), dtype=self.dtype,
                       name="conv_out")(h)


class PixelDecoder(nn.Module):
    """(reference: maskgit_vqgan.py:201-266, incl. ``forward_with_latent``)"""
    spec: MaskGITVQGANSpec = MaskGITVQGANSpec()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, return_latent: bool = False):
        s = self.spec
        h = nn.Conv(s.hidden_channels * s.channel_mult[-1], (3, 3),
                    dtype=self.dtype, name="conv_in")(z)
        for j in range(s.num_res_blocks):
            h = PixelResnetBlock(s.hidden_channels * s.channel_mult[-1],
                                 self.dtype, name=f"mid_{j}")(h)
        # state-dict index i == block_idx (reference builds the list reversed
        # twice, maskgit_vqgan.py:225-229); runs high-res-mult to low.
        for i in reversed(range(s.num_resolutions)):
            block_out = s.hidden_channels * s.channel_mult[i]
            for j in range(s.num_res_blocks):
                h = PixelResnetBlock(block_out, self.dtype,
                                     name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(block_out, (3, 3), dtype=self.dtype,
                            name=f"up_{i}_upsample_conv")(h)
        latent = h
        h = _gn("norm_out", self.dtype)(h)
        h = nn.silu(h)
        img = nn.Conv(s.num_channels, (3, 3), dtype=self.dtype,
                      name="conv_out")(h)
        if return_latent:
            return img, latent
        return img


class PixelQuantizer(nn.Module):
    """MishaLaskin-style VQ with the soft-code decode path
    (reference: maskgit_vqgan.py:269-381)."""
    num_embeddings: int = 1024
    embedding_dim: int = 256
    commitment_cost: float = 0.25

    def setup(self):
        bound = 1.0 / self.num_embeddings
        self.embedding = self.param(
            "embedding",
            lambda k, sh: jax.random.uniform(k, sh, jnp.float32, -bound, bound),
            (self.num_embeddings, self.embedding_dim))

    def __call__(self, z, return_loss: bool = False):
        """z: (B, H, W, C) -> (z_q (B,H,W,C), indices (B,H,W)[, loss])."""
        B, H, W, C = z.shape
        z32 = z.astype(jnp.float32)
        flat = z32.reshape(-1, C)
        emb = self.embedding
        # ||z - e||^2 = z^2 - 2 z.e + e^2; argmin via one matmul
        scores = 2.0 * (flat @ emb.T) - jnp.sum(emb * emb, axis=-1)[None, :]
        idx = jnp.argmax(scores, axis=-1)
        z_q = emb[idx].reshape(B, H, W, C)
        if return_loss:
            loss = (jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2)
                    + self.commitment_cost
                    * jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2))
            z_q = z32 + jax.lax.stop_gradient(z_q - z32)   # STE
            return z_q.astype(z.dtype), idx.reshape(B, H, W), loss
        return z_q.astype(z.dtype), idx.reshape(B, H, W)

    def get_codebook_entry(self, indices):
        """(B, H, W) or (B, N) int -> (B, H, W, C) NHWC
        (reference: maskgit_vqgan.py:340-355)."""
        if indices.ndim == 2:
            B, N = indices.shape
            side = int(N ** 0.5)
            indices = indices.reshape(B, side, side)
        return self.embedding[indices]

    def soft_decode(self, logits):
        """softmax(logits) @ embedding — TiTok's generative pixel path
        (reference: titok/titok.py:128-131 einsum).  logits: (B, H, W, K)."""
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs @ self.embedding
