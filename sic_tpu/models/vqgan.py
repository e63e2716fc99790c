"""VQGAN pixel autoencoder (flax, NHWC).

TPU re-design of the CompVis f16 VQGAN used as the generative pixel decoder
(reference: src/taming/modules/diffusionmodules/model.py:342-537 and
src/taming/models/vqgan.py:13-238, vqgan_wo_attn.py:12-36).  GroupNorm(32,
eps 1e-6) + swish resnet stacks; single-head attention at the configured
resolutions (droppable via ``use_attn=False`` — the reference's
``no_attn_vqgan`` flag).  All convs are NHWC so XLA lowers them straight to
MXU convolutions.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .quantizer import VQGANQuantizer

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VQGANSpec:
    """ddconfig counterpart (reference: src/config/config_test.yaml:43-54)."""
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 256
    resolution: int = 256
    embed_dim: int = 256
    n_embed: int = 256
    use_attn: bool = True
    dropout: float = 0.0

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (self.num_resolutions - 1)


def _norm(name: str, dtype=None):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, name=name)


class ResnetBlock(nn.Module):
    out_ch: Optional[int] = None
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = _norm("norm1", self.dtype)(x)
        h = nn.swish(h)
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = _norm("norm2", self.dtype)(h)
        h = nn.swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name="conv2")(h)
        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full attention over the spatial grid
    (reference: model.py:140-192).  At the f16 bottleneck the grid is tiny
    (<=32x32 for 512-px inputs) so one fused attention einsum suffices."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _norm("norm", self.dtype)(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * (C ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        h = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(B, H, W, C)
        return x + nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)


class Downsample(nn.Module):
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # CompVis asymmetric pad: (0, 1) on H and W (reference: model.py:68-75)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return nn.Conv(C, (3, 3), dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    spec: VQGANSpec
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = self.spec
        h = nn.Conv(s.ch, (3, 3), dtype=self.dtype, name="conv_in")(x)
        curr_res = s.resolution
        for i_level, mult in enumerate(s.ch_mult):
            for i_block in range(s.num_res_blocks):
                h = ResnetBlock(s.ch * mult, s.dropout, self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(h, deterministic)
                if s.use_attn and curr_res in s.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != s.num_resolutions - 1:
                h = Downsample(self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(None, s.dropout, self.dtype, name="mid_block_1")(h, deterministic)
        if s.use_attn:
            h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(None, s.dropout, self.dtype, name="mid_block_2")(h, deterministic)
        h = _norm("norm_out", self.dtype)(h)
        h = nn.swish(h)
        return nn.Conv(s.z_channels, (3, 3), dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    spec: VQGANSpec
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, deterministic: bool = True,
                 return_pre: bool = False):
        s = self.spec
        block_in = s.ch * s.ch_mult[-1]
        curr_res = s.resolution // s.downsample_factor
        h = nn.Conv(block_in, (3, 3), dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(None, s.dropout, self.dtype, name="mid_block_1")(h, deterministic)
        if s.use_attn:
            h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(None, s.dropout, self.dtype, name="mid_block_2")(h, deterministic)
        for i_level in reversed(range(s.num_resolutions)):
            out_ch = s.ch * s.ch_mult[i_level]
            for i_block in range(s.num_res_blocks + 1):
                h = ResnetBlock(out_ch, s.dropout, self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(h, deterministic)
                if s.use_attn and curr_res in s.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = _norm("norm_out", self.dtype)(h)
        h = nn.swish(h)
        out = nn.Conv(s.out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)
        if return_pre:
            # pre-conv_out activation, used by the adaptive GAN weight
            # (reference: vqperceptual.py:67-78 differentiates w.r.t. the
            # last conv's kernel; h is the only other operand it needs)
            return out, h
        return out


class VQGAN(nn.Module):
    """Encoder + VQ + decoder wrapper (reference: taming/models/vqgan.py:13-110).

    The training/optimizer logic of the torch LightningModule lives in the
    ``sic_tpu.train`` harness instead; this module is pure compute.
    """
    spec: VQGANSpec
    dtype: Optional[Dtype] = None

    def setup(self):
        s = self.spec
        self.encoder = Encoder(s, self.dtype)
        self.decoder = Decoder(s, self.dtype)
        self.quantize = VQGANQuantizer(s.n_embed, s.embed_dim)
        self.quant_conv = nn.Conv(s.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(s.z_channels, (1, 1), dtype=self.dtype)

    def encode(self, x):
        h = self.encoder(x)
        h = self.quant_conv(h)
        return self.quantize(h)

    def encode_latent(self, x):
        """Pre-VQ latent (the frozen teacher path of stage feat training)."""
        return self.quant_conv(self.encoder(x))

    def decode(self, quant, return_pre: bool = False):
        return self.decoder(self.post_quant_conv(quant), return_pre=return_pre)

    def decode_code(self, code_b):
        return self.decode(self.quantize.embed_code(code_b))

    def __call__(self, x):
        quant, emb_loss, info = self.encode(x)
        return self.decode(quant), emb_loss, info
