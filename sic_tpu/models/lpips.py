"""LPIPS perceptual metric (flax, NHWC).

Counterpart of the reference's frozen perceptual loss
(reference: src/taming/modules/losses/lpips.py:11-123).  VGG16 feature
slices -> unit-normalize -> squared diff -> learned 1x1 calibration ->
spatial mean -> sum over slices.

The reference ships only the calibration heads
(taming/modules/autoencoder/lpips/vgg.pth); the VGG16 backbone comes from
torchvision at runtime.  Here both are loadable from torch checkpoint files
via :func:`port_lpips_params`; without them the structure still trains/evals
(random backbone — document as non-calibrated).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG16 "features" plan: channels per conv, "M" = maxpool.
_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512)
# slice boundaries: outputs after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_SLICE_AFTER_CONV = (2, 4, 7, 10, 13)
_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """The five LPIPS feature slices of VGG16."""
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        feats = []
        conv_i = 0
        for item in _VGG16_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), dtype=self.dtype,
                            name=f"conv_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
                if conv_i in _SLICE_AFTER_CONV:
                    feats.append(x)
        return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Frozen perceptual distance; inputs NHWC in [-1, 1]."""
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(self.dtype, name="vgg")
        fx = vgg((x - shift) / scale)
        fy = vgg((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            lin = self.param(f"lin_{i}", nn.initializers.ones, (_CHANNELS[i],))
            val = jnp.sum(d * lin.astype(d.dtype), axis=-1)           # (B,H,W)
            total = total + jnp.mean(val, axis=(1, 2))                # (B,)
        return total


def port_lpips_params(params, lin_ckpt: Optional[str] = None,
                      vgg_ckpt: Optional[str] = None):
    """Load torch LPIPS calibration heads and/or a torchvision VGG16
    state-dict into an LPIPS param tree (returns a new tree)."""
    import jax
    params = jax.tree.map(lambda x: x, params)  # structural copy
    p = params["params"] if "params" in params else params

    if lin_ckpt:
        import torch
        sd = torch.load(lin_ckpt, map_location="cpu")
        for i in range(5):
            w = sd[f"lin{i}.model.1.weight"].numpy().reshape(-1)
            p[f"lin_{i}"] = jnp.asarray(w)
    if vgg_ckpt:
        import torch
        sd = torch.load(vgg_ckpt, map_location="cpu")
        conv_keys = sorted(
            {int(k.split(".")[1]) for k in sd if k.startswith("features.")
             and k.endswith(".weight")})
        for i, layer_idx in enumerate(conv_keys):
            w = sd[f"features.{layer_idx}.weight"].numpy()  # (O, I, kh, kw)
            b = sd[f"features.{layer_idx}.bias"].numpy()
            p["vgg"][f"conv_{i}"]["kernel"] = jnp.asarray(
                w.transpose(2, 3, 1, 0))                    # HWIO
            p["vgg"][f"conv_{i}"]["bias"] = jnp.asarray(b)
    return params
