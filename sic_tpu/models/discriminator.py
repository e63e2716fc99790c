"""PatchGAN discriminator (flax, NHWC).

Counterpart of the reference's ``NLayerDiscriminator``
(reference: src/taming/modules/discriminator/model.py:17-67).  BatchNorm
statistics live in the ``batch_stats`` collection and are threaded through
the training step.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

_W_INIT = nn.initializers.normal(0.02)  # weights_init (reference: model.py:9-14)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    # torch: BN weight ~ N(1.0, 0.02)
    return 1.0 + 0.02 * nn.initializers.normal(1.0)(key, shape, dtype)


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    input_nc: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.ndf, (4, 4), strides=2, padding=1,
                    kernel_init=_W_INIT, dtype=self.dtype, name="conv_0")(x)
        x = nn.leaky_relu(x, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers + 1):
            nf_mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            x = nn.Conv(self.ndf * nf_mult, (4, 4), strides=stride, padding=1,
                        use_bias=False, kernel_init=_W_INIT, dtype=self.dtype,
                        name=f"conv_{n}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             scale_init=_bn_scale_init,
                             name=f"bn_{n}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), strides=1, padding=1, kernel_init=_W_INIT,
                       dtype=self.dtype, name="conv_out")(x)
