"""MaskGIT masked-token generator (optional generative prior).

Counterpart of the reference's ``ImageBert`` (reference: src/titok/
maskgit.py:30-138) — present in the reference tree but not wired into any
live codec path (SURVEY.md §2.4); provided as the same optional capability.

Differences from the torch original: the backbone is this framework's
pre-LN transformer (the reference wraps HF ``BertModel``; its post-LN BERT
checkpoints are not portable here), and the iterative confidence-based
sampling loop — CFG, gumbel-noised argmax, arccos mask schedule, annealed
temperature — runs fully under ``jit`` via ``lax.fori_loop``.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import LayerNorm, ResidualAttentionBlock


@dataclasses.dataclass(frozen=True)
class MaskGITSpec:
    codebook_size: int = 4096
    condition_num_classes: int = 1000
    image_seq_len: int = 32
    hidden: int = 768
    num_layers: int = 24
    num_heads: int = 16

    @property
    def mask_token_id(self) -> int:
        return self.codebook_size

    @property
    def vocab_size(self) -> int:
        # image tokens + mask + class tokens + class-drop label
        return self.codebook_size + self.condition_num_classes + 2


class MaskGITGenerator(nn.Module):
    spec: MaskGITSpec = MaskGITSpec()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, input_ids, condition, drop_cond):
        """input_ids: (B, L) image-token ids (mask id where unknown);
        condition: (B,) class ids; drop_cond: (B,) bool — replaces the class
        token with the drop label (classifier-free guidance).
        Returns logits (B, L, codebook_size)."""
        s = self.spec
        cond_tok = jnp.where(drop_cond,
                             s.condition_num_classes + s.codebook_size + 1,
                             condition + s.codebook_size + 1)
        ids = jnp.concatenate([cond_tok[:, None], input_ids], axis=1)
        x = nn.Embed(s.vocab_size, s.hidden,
                     embedding_init=nn.initializers.normal(0.02),
                     name="token_embedding")(ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02),
                         (s.image_seq_len + 1, s.hidden))
        x = x + pos.astype(x.dtype)
        x = LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        for i in range(s.num_layers):
            x = ResidualAttentionBlock(s.num_heads, 4.0, self.dtype,
                                       name=f"block_{i}")(x)
        x = LayerNorm(dtype=self.dtype, name="ln_post")(x)
        logits = nn.Dense(s.codebook_size, dtype=self.dtype, name="lm_head")(x)
        return logits[:, 1:]  # drop the condition position


def _gumbel(rng, shape):
    u = jax.random.uniform(rng, shape, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


@functools.partial(jax.jit,
                   static_argnames=("model", "num_sample_steps",
                                    "guidance_scale",
                                    "randomize_temperature"))
def generate(model: MaskGITGenerator, params, rng, condition,
             guidance_scale: float = 3.0, randomize_temperature: float = 4.5,
             num_sample_steps: int = 8):
    """Iterative confidence-based sampling
    (reference: titok/maskgit.py:81-138)."""
    s = model.spec
    B = condition.shape[0]
    L = s.image_seq_len
    mask_id = s.mask_token_id
    ids0 = jnp.full((B, L), mask_id, jnp.int32)
    no_drop = jnp.zeros((B,), bool)
    all_drop = jnp.ones((B,), bool)

    def step_fn(step, carry):
        ids, rng = carry
        rng, r1, r2 = jax.random.split(rng, 3)
        ratio = (step + 1).astype(jnp.float32) / num_sample_steps
        temp = randomize_temperature * (1.0 - ratio)
        is_mask = ids == mask_id

        cond_logits = model.apply(params, ids, condition, no_drop)
        if guidance_scale != 0:
            uncond_logits = model.apply(params, ids, condition, all_drop)
            logits = cond_logits + (cond_logits - uncond_logits) * guidance_scale
        else:
            logits = cond_logits

        noisy = logits + temp * _gumbel(r1, logits.shape)
        sampled = jnp.argmax(noisy, axis=-1).astype(jnp.int32)
        samp_logit = jnp.take_along_axis(logits, sampled[..., None],
                                         axis=-1)[..., 0]
        sampled = jnp.where(is_mask, sampled, ids)
        samp_logit = jnp.where(is_mask, samp_logit, jnp.inf).astype(jnp.float32)

        mask_ratio = jnp.arccos(ratio) / (math.pi * 0.5)
        mask_len = jnp.floor(L * mask_ratio)
        mask_len = jnp.maximum(
            1.0, jnp.minimum(jnp.sum(is_mask, axis=-1).min() - 1.0, mask_len))

        confidence = samp_logit + temp * _gumbel(r2, samp_logit.shape)
        sorted_conf = jnp.sort(confidence, axis=-1)
        cut_off = sorted_conf[:, mask_len.astype(jnp.int32) - 1][:, None]
        masking = confidence <= cut_off
        new_ids = jnp.where(step == num_sample_steps - 1, sampled,
                            jnp.where(masking, mask_id, sampled))
        return new_ids, rng

    ids, _ = jax.lax.fori_loop(0, num_sample_steps, step_fn, (ids0, rng))
    return ids
