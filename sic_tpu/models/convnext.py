"""ConvNeXt block (flax, NHWC).

Counterpart of the reference detail-branch conv block
(reference: src/blocks/conv_blocks.py:48-81).  The depthwise KxK runs on the
VPU; the two 1x1/Linear layers are MXU matmuls that XLA fuses with the GELU.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn


from .layers import LayerNorm

from ..ops.quant import QDense

Dtype = Any


class ConvNeXtBlock(nn.Module):
    out_ch: Optional[int] = None
    mlp_ratio: float = 4.0
    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        identity = x
        scale = self.param("layer_scale", nn.initializers.ones, (in_ch,))
        x = x * scale.astype(x.dtype)
        x = nn.Conv(in_ch, (self.kernel_size, self.kernel_size),
                    feature_group_count=in_ch, dtype=self.dtype, name="conv")(x)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = QDense(int(in_ch * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = QDense(out_ch, dtype=self.dtype, name="mlp_fc2")(x)
        if out_ch != in_ch:
            identity = QDense(out_ch, dtype=self.dtype, name="short")(identity)
        return x + identity
