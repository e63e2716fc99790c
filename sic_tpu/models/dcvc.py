"""DCVC-style depthwise conv blocks (NHWC, flax).

The workhorse blocks of the analysis/synthesis transforms and the spatial
prior nets (reference: src/blocks/dcvc.py:14-66).  1x1 convs dominate the
FLOPs and map straight onto the MXU as (H*W, Cin) x (Cin, Cout) matmuls; the
3x3 depthwise runs on the VPU.  XLA fuses the leaky-relu chains.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_normal()


class DepthConv(nn.Module):
    out_ch: int
    slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        identity = x
        if in_ch != self.out_ch:
            identity = nn.Conv(self.out_ch, (1, 1), kernel_init=_XAVIER,
                               name="adaptor")(identity)
        out = nn.Conv(in_ch, (1, 1), kernel_init=_XAVIER, name="conv1")(x)
        out = jax.nn.leaky_relu(out, self.slope)
        out = nn.Conv(in_ch, (3, 3), feature_group_count=in_ch,
                      kernel_init=_XAVIER, name="depth_conv")(out)
        out = nn.Conv(self.out_ch, (1, 1), kernel_init=_XAVIER, name="conv2")(out)
        return out + identity


class ConvFFN3(nn.Module):
    """Gated 1x1 FFN with dual leaky slopes (reference: dcvc.py:40-54)."""

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        internal = in_ch * 2
        identity = x
        x1, x2 = jnp.split(
            nn.Conv(internal * 2, (1, 1), kernel_init=_XAVIER, name="conv")(x),
            2, axis=-1)
        out = jax.nn.leaky_relu(x1, 0.1) + jax.nn.leaky_relu(x2, 0.01)
        return identity + nn.Conv(in_ch, (1, 1), kernel_init=_XAVIER,
                                  name="conv_out")(out)


class DepthConvBlock4(nn.Module):
    out_ch: int
    slope_depth_conv: float = 0.01

    @nn.compact
    def __call__(self, x):
        x = DepthConv(self.out_ch, self.slope_depth_conv, name="depth")(x)
        return ConvFFN3(name="ffn")(x)
