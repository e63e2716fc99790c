"""Mesh construction + sharding helpers."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("data", "tile"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a 2D (data, tile) mesh over the available devices.

    Default factorization puts a factor of 2 on ``tile`` when the device
    count is even (tile parallelism rides the fastest ICI dimension) and the
    rest on ``data``.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if shape is None:
        tile = 2 if n % 2 == 0 and n > 1 else 1
        shape = (n // tile, tile)
    assert shape[0] * shape[1] == n, (shape, n)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over the whole mesh (pure DP view of a 2D mesh)."""
    return NamedSharding(mesh, P(("data", "tile")))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) images: batch over ``data``, width over ``tile``.

    Sharding W splits the 256-px tile grid across chips; GSPMD inserts conv
    halo exchanges and the ViT's folded tile-batch axis inherits the split.
    """
    return NamedSharding(mesh, P("data", None, "tile", None))


def shard_batch(x, mesh: Mesh, spatial: bool = True):
    """Place a host batch onto the mesh."""
    sh = image_sharding(mesh) if (spatial and getattr(x, "ndim", 0) == 4) \
        else batch_sharding(mesh)
    return jax.device_put(x, sh)


def shard_state(tree, mesh: Mesh):
    """Replicate a param/optimizer/state pytree onto every device."""
    return jax.device_put(tree, replicated(mesh))


def fsdp_sharding(tree, mesh: Mesh, axis: str = "data",
                  min_size: int = 1 << 16):
    """Per-leaf shardings that split each large tensor's biggest
    ``axis``-divisible dimension across ``axis`` (ZeRO/FSDP-style weight
    and optimizer-state sharding; GSPMD inserts the all-gathers).  Small
    leaves stay replicated."""
    n = mesh.shape[axis]

    def spec_for(x):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if n <= 1 or size < min_size:
            return NamedSharding(mesh, P())
        dims = [d for d in range(len(shape)) if shape[d] % n == 0]
        if not dims:
            return NamedSharding(mesh, P())
        dim = max(dims, key=lambda d: shape[d])
        spec = [None] * len(shape)
        spec[dim] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(spec_for, tree)


def shard_state_fsdp(tree, mesh: Mesh, axis: str = "data",
                     min_size: int = 1 << 16):
    """Place a state pytree with FSDP-style sharding of its big leaves."""
    return jax.device_put(tree, fsdp_sharding(tree, mesh, axis, min_size))
