"""Mesh construction + sharding helpers."""
from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = ("data", "tile"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, tile) — or any N-D — mesh over the available devices.

    Default factorization puts a factor of 2 on ``tile`` when the device
    count is even (tile parallelism rides the fastest ICI dimension) and the
    rest on ``data``.  Pass ``shape``/``axis_names`` of matching length for
    higher-rank meshes, e.g. ``((2, 2, 2), ("data", "model", "tile"))`` for
    combined data + tensor + spatial parallelism.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if shape is None:
        tile = 2 if n % 2 == 0 and n > 1 else 1
        shape = (n // tile, tile)
    assert len(shape) == len(axis_names), (shape, axis_names)
    assert int(np.prod(shape)) == n, (shape, n)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over the mesh's data-like axes (pure DP view): 'data'
    plus 'tile' when present — meshes with other secondary axes (e.g.
    ('data', 'pipe')) shard the batch over 'data' only."""
    axes = tuple(a for a in ("data", "tile") if a in mesh.shape)
    return NamedSharding(mesh, P(axes))


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


# --- tensor parallelism (Megatron-style, GSPMD-annotated) -------------------
#
# Path-regex rules mapping transformer weights to PartitionSpecs over a
# ``model`` mesh axis.  Column-parallel into the block (qkv / MLP up
# projections: output features + their biases sharded), row-parallel out of
# it (attention out / MLP down projections: input features sharded) — the
# classic layout that needs exactly one all-reduce per residual branch.
# GSPMD derives the activation shardings and inserts those collectives; the
# rules below are annotations, not a manual shard_map, so any unmatched or
# non-divisible leaf simply stays replicated and the math is unchanged.
#
# Covers both transformer families in the tree:
# - ViT blocks (models/layers.py): attn/in_proj, attn/out_proj, mlp/c_fc,
#   mlp/c_proj — the flagship hybrid encoder + TiTok + CLIP towers;
# - Swin blocks (models/swin.py): to_qkv, to_out, mlp_fc1, mlp_fc2 — the
#   detail-branch decoder stacks.
#
# The fused qkv kernel is sharded on its packed (3*d) output dim; shards are
# not head-aligned, GSPMD reshards at the head split.  On-TPU the fused
# Pallas attention assumes whole heads per device, so model-parallel runs
# should set SIC_SEQ_ATTN=xla (the einsum path partitions under GSPMD).
DEFAULT_TP_RULES: Tuple[Tuple[str, Tuple], ...] = (
    (r"/in_proj/kernel$",  (None, "model")),
    (r"/in_proj/bias$",    ("model",)),
    (r"/out_proj/kernel$", ("model", None)),
    (r"/c_fc/kernel$",     (None, "model")),
    (r"/c_fc/bias$",       ("model",)),
    (r"/c_proj/kernel$",   ("model", None)),
    (r"/to_qkv/kernel$",   (None, "model")),
    (r"/to_out/kernel$",   ("model", None)),
    (r"/mlp_fc1/kernel$",  (None, "model")),
    (r"/mlp_fc1/bias$",    ("model",)),
    (r"/mlp_fc2/kernel$",  ("model", None)),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:  # pragma: no cover - future key kinds
            parts.append(str(k))
    return "/" + "/".join(parts)


def tp_sharding(tree, mesh: Mesh, axis: str = "model",
                rules: Tuple[Tuple[str, Tuple], ...] = DEFAULT_TP_RULES,
                fsdp_axis: Optional[str] = None,
                min_size: int = 1 << 16):
    """Per-leaf NamedShardings implementing tensor parallelism over ``axis``.

    Walks the pytree with paths (so optimizer-state mirrors of the param
    tree — adam ``mu``/``nu`` — pick up the same specs as their params) and
    applies the first matching rule whose placeholder dims divide evenly.
    Leaves with no matching/divisible rule stay replicated, or fall back to
    :func:`fsdp_sharding`'s biggest-divisible-dim split when ``fsdp_axis``
    is given (ZeRO over data x TP over model on one 3D mesh).
    """
    n = mesh.shape[axis]
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    nf = mesh.shape[fsdp_axis] if fsdp_axis is not None else 1

    def spec_for(path, x):
        shape = getattr(x, "shape", ())
        p = _path_str(path)
        if n > 1:
            for pat, spec in compiled:
                if pat.search(p) is None or len(spec) != len(shape):
                    continue
                named = tuple(axis if s == "model" else s for s in spec)
                if all(shape[d] % n == 0
                       for d, s in enumerate(named) if s is not None):
                    if fsdp_axis is not None:
                        # also split the largest remaining dim over the
                        # fsdp axis (full ZeRO x TP) when it divides
                        free = [d for d, s in enumerate(named)
                                if s is None and shape[d] % nf == 0]
                        if free and int(np.prod(shape)) >= min_size and nf > 1:
                            d = max(free, key=lambda d: shape[d])
                            named = tuple(fsdp_axis if i == d else s
                                          for i, s in enumerate(named))
                    return NamedSharding(mesh, P(*named))
                break  # matched rule but not divisible -> no TP for leaf
        if fsdp_axis is not None:
            return fsdp_sharding({"x": x}, mesh, fsdp_axis, min_size)["x"]
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def shard_state_tp(tree, mesh: Mesh, axis: str = "model",
                   fsdp_axis: Optional[str] = None,
                   min_size: int = 1 << 16):
    """Place a state pytree with tensor-parallel (optionally + FSDP) specs."""
    return jax.device_put(
        tree, tp_sharding(tree, mesh, axis, DEFAULT_TP_RULES,
                          fsdp_axis, min_size))


# --- pipeline parallelism (stacked-cell trunk layout) ------------------------

def pp_sharding(tree, mesh: Mesh, axis: str = "pipe",
                fsdp_axis: Optional[str] = None, min_size: int = 1 << 16):
    """Per-leaf NamedShardings for the PP state layout: every
    ``trunk_cells`` leaf (and its optimizer-state mirrors — path-matched,
    like :func:`tp_sharding`) is split on its leading cell axis over
    ``axis`` so each pipeline stage holds only its own cells' params and
    Adam moments.  Remaining leaves replicate, or FSDP-shard over
    ``fsdp_axis`` when given (PP over 'pipe' x ZeRO over 'data').

    Pre-placing the state this way is what keeps the pjit'ed train step
    free of involuntary rematerialization: the stacked leaves already
    live in the ``P(axis)`` layout ``spmd_pipeline`` consumes
    (VERDICT.md round 3, multichip item).
    """
    n = mesh.shape[axis]

    def spec_for(path, x):
        shape = getattr(x, "shape", ())
        if ("trunk_cells" in _path_str(path) and n > 1 and shape
                and shape[0] % n == 0):
            return NamedSharding(mesh, P(axis, *([None] * (len(shape) - 1))))
        if fsdp_axis is not None:
            return fsdp_sharding({"x": x}, mesh, fsdp_axis, min_size)["x"]
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def shard_state_pp(tree, mesh: Mesh, axis: str = "pipe",
                   fsdp_axis: Optional[str] = None,
                   min_size: int = 1 << 16):
    """Place a state pytree with pipeline-stage (optionally + FSDP) specs."""
    return jax.device_put(tree, pp_sharding(tree, mesh, axis,
                                            fsdp_axis, min_size))
