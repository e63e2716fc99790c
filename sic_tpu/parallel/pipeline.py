"""GPipe-style pipeline parallelism over homogeneous transformer trunks.

TPU-first design: the trunk's per-layer params are stacked on a leading
layer axis and sharded over a ``pipe`` mesh axis; ``jax.shard_map`` runs
the classic GPipe schedule — at every step each stage applies its local
layer shard to its current microbatch and ``ppermute``s the activation one
hop down the ring, so inter-stage traffic is ICI-neighbour-only and the
bubble is the textbook ``(P-1)/(P-1+M)``.  The whole schedule is a
``lax.scan`` of ``ppermute`` + ``where`` — fully differentiable, so the
same primitive serves training (grads flow back through the reverse ring).

Targets the repo's homogeneous ViT trunks (TiTok encoder/decoder
``transformer_{i}``, CLIP towers, MaskGIT ImageBert): ``stack_trunk``
lifts their per-layer param subtrees into one stacked pytree, and
``pipeline_vit_trunk`` runs a trunk under ``ResidualAttentionBlock``
semantics.  Composes with data parallelism on a ``(data, pipe)`` mesh
(each data slice runs an independent pipeline) and is orthogonal to the
``model``-axis tensor parallelism in :mod:`.mesh`.

Reference counterpart: none — the reference is single-GPU torch
(src/compress.py drives one device end to end); this subsystem exists for
the TPU mesh scaling story (SURVEY.md §2.6).
"""
from __future__ import annotations

import re
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_trunk(params, prefix: str = "transformer_"):
    """Lift ``params[f"{prefix}{i}"]`` for consecutive ``i`` starting at 0
    into one pytree whose leaves gain a leading layer axis.

    Returns ``(stacked, n_layers)``.  The per-layer subtrees must be
    structurally identical (true for every trunk in the model zoo).
    """
    pat = re.compile(re.escape(prefix) + r"(\d+)$")
    found = {}
    for k in params:
        m = pat.match(k)
        if m:
            found[int(m.group(1))] = params[k]
    n = len(found)
    assert n > 0, f"no '{prefix}<i>' subtrees in params"
    assert sorted(found) == list(range(n)), sorted(found)
    layers = [found[i] for i in range(n)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    return stacked, n


def spmd_pipeline(apply_block: Callable,
                  stacked_params,
                  x,
                  mesh: Mesh,
                  axis: str = "pipe",
                  batch_axis: Optional[str] = None,
                  n_microbatch: Optional[int] = None):
    """Run ``x`` through a stack of layers under GPipe pipeline parallelism.

    Args:
      apply_block: ``(layer_params, act) -> act`` pure single-layer apply.
        Both the params and the activations may be arbitrary pytrees.
      stacked_params: pytree with leading layer axis ``L`` on every leaf
        (from :func:`stack_trunk`); ``L`` must divide by ``mesh.shape[axis]``
        and layers are assigned to stages in order (stage p owns layers
        ``[p*L/P, (p+1)*L/P)``).
      x: pytree of ``(B_leaf, ...)`` activations.  Every leaf's leading dim
        is split into ``n_microbatch`` equal microbatches (default: one per
        stage) — a multi-activation trunk (e.g. the hybrid codec's
        (tokens, feat) carry) pipelines as one unit.
      mesh / axis: the pipeline mesh axis.
      batch_axis: optional mesh axis the batch dim is additionally sharded
        over (data parallelism); each data slice pipelines independently.
      n_microbatch: microbatch count ``M``; bubble fraction is
        ``(P-1)/(P-1+M)``.

    Returns the activation pytree, replicated over ``axis`` (the last
    stage's result is broadcast back via a masked ``psum`` so callers see
    ordinary data-sharded activations).
    """
    n_stages = mesh.shape[axis]
    if n_microbatch is None:
        n_microbatch = n_stages
    leading = [leaf.shape[0] for leaf in jax.tree.leaves(x)]
    assert all(b % n_microbatch == 0 for b in leading), (leading, n_microbatch)
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % n_stages == 0, (L, n_stages)

    mbs = jax.tree.map(
        lambda a: a.reshape((n_microbatch, a.shape[0] // n_microbatch)
                            + a.shape[1:]), x)

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)
    one_spec = P(None, batch_axis) if batch_axis else P()
    mb_spec = jax.tree.map(lambda _: one_spec, x)

    def stage_fn(local_params, mbs_local):
        # local_params leaves: (L/P, ...); mbs_local leaves: (M, mb[/data], ...)
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def local_apply(act):
            def body(a, p):
                return apply_block(p, a), None
            act, _ = jax.lax.scan(body, act, local_params)
            return act

        # the loop body is pipe-varying (axis_index, ppermute); mark the
        # initial carry to match so scan's carry types line up
        def _varying(t):
            return jax.lax.pcast(t, (axis,), to="varying")
        zeros = jax.tree.map(lambda m: _varying(jnp.zeros_like(m[0])),
                             mbs_local)
        outbuf = jax.tree.map(lambda m: _varying(jnp.zeros_like(m)),
                              mbs_local)
        n_steps = n_microbatch + n_stages - 1

        def step(carry, t):
            recv, outbuf = carry
            rd = jnp.clip(t, 0, n_microbatch - 1)
            inp = jax.tree.map(
                lambda m, r: jnp.where(
                    stage == 0,
                    jax.lax.dynamic_index_in_dim(m, rd, 0, keepdims=False),
                    r), mbs_local, recv)
            out = local_apply(inp)
            w = t - (n_stages - 1)
            valid = jnp.logical_and(stage == n_stages - 1, w >= 0)
            wclip = jnp.clip(w, 0, n_microbatch - 1)
            outbuf = jax.tree.map(
                lambda b, o: jnp.where(
                    valid, jax.lax.dynamic_update_index_in_dim(b, o, wclip, 0),
                    b), outbuf, out)
            recv = jax.lax.ppermute(out, axis, perm)
            return (recv, outbuf), None

        (_, outbuf), _ = jax.lax.scan(step, (zeros, outbuf),
                                      jnp.arange(n_steps))
        # broadcast the last stage's buffer to every stage so the result
        # leaves shard_map replicated over the pipe axis
        return jax.tree.map(
            lambda b: jax.lax.psum(
                b * (stage == n_stages - 1).astype(b.dtype), axis), outbuf)

    run = jax.shard_map(stage_fn, mesh=mesh,
                        in_specs=(param_specs, mb_spec),
                        out_specs=mb_spec)
    out = run(stacked_params, mbs)
    return jax.tree.map(
        lambda o: o.reshape((o.shape[0] * o.shape[1],) + o.shape[2:]), out)


def stack_hybrid_cells(tree, num_layers: int, insert_pos):
    """Convert a named hybrid-trunk param tree (``transformer_{i}``,
    ``inter_blocks_{i}``, ``feat_blocks_{i}``) into the stacked
    ``trunk_cells`` layout of ``HybridEncoder(pp=...)`` — leaves gain a
    leading cell axis; insert-free cells get ZERO interaction params
    (they sit behind a 0-gate and never execute, models/hybrid.py
    TrunkCell).  Returns the converted tree; non-trunk keys pass through.
    Inverse: :func:`unstack_hybrid_cells`.
    """
    from ..models.hybrid import cell_partition
    k = cell_partition(num_layers, insert_pos)
    n_cells = num_layers // k
    insert_pos = [p for p in insert_pos if p < num_layers]
    assert insert_pos, "trunk has no live insert positions; nothing to stack"
    inter_template = tree[f"inter_blocks_{insert_pos[0]}"]
    fb_template = tree[f"feat_blocks_{insert_pos[0]}"]
    cells = []
    for c in range(n_cells):
        cell = {f"vit_{j}": tree[f"transformer_{c * k + j}"]
                for j in range(k)}
        end = c * k + k - 1
        if end in insert_pos:
            cell["inter"] = tree[f"inter_blocks_{end}"]
            cell["feat_block"] = tree[f"feat_blocks_{end}"]
        else:
            cell["inter"] = jax.tree.map(jnp.zeros_like, inter_template)
            cell["feat_block"] = jax.tree.map(jnp.zeros_like, fb_template)
        cells.append(cell)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *cells)
    trunk_re = re.compile(
        r"^(transformer_|inter_blocks_|feat_blocks_)\d+$")
    out = {kk: v for kk, v in tree.items() if not trunk_re.match(kk)}
    out["trunk_cells"] = stacked
    return out


def unstack_hybrid_cells(tree, num_layers: int, insert_pos):
    """Inverse of :func:`stack_hybrid_cells` (insert-free cells' dead
    interaction params are dropped)."""
    from ..models.hybrid import cell_partition
    k = cell_partition(num_layers, insert_pos)
    insert_pos = [p for p in insert_pos if p < num_layers]
    stacked = tree["trunk_cells"]
    out = {kk: v for kk, v in tree.items() if kk != "trunk_cells"}
    for c in range(num_layers // k):
        cell = jax.tree.map(lambda t: t[c], stacked)
        for j in range(k):
            out[f"transformer_{c * k + j}"] = cell[f"vit_{j}"]
        end = c * k + k - 1
        if end in insert_pos:
            out[f"inter_blocks_{end}"] = cell["inter"]
            out[f"feat_blocks_{end}"] = cell["feat_block"]
    return out


def codec_params_canonicalize(params, spec):
    """Full-codec param tree: stacked ``trunk_cells`` -> the canonical
    named ``transformer_{i}`` layout (no-op when already canonical).

    Checkpoint-layout independence: a ``--pp``-trained run must produce
    checkpoints that ``evaluate``/``compress``/``serve`` (which build the
    named layout) can load — the stacked layout is an execution detail of
    the pipeline schedule, not a wire format.  ``params`` is the usual
    ``{"params": {...}}`` codec tree; returns a converted copy."""
    return _convert_codec_layout(params, spec, to_stacked=False)


def codec_params_stack(params, spec):
    """Inverse of :func:`codec_params_canonicalize`: named layout -> the
    stacked ``trunk_cells`` layout consumed by ``Codec(..., pp=...)``
    (no-op when already stacked).  Used to resume a canonical checkpoint
    into a pipeline-parallel run."""
    return _convert_codec_layout(params, spec, to_stacked=True)


def _convert_codec_layout(params, spec, to_stacked: bool):
    root = params.get("params", params)
    hc = root.get("hybrid_codec")
    if hc is None:
        return params
    L = spec.titok.num_layers
    new_hc = dict(hc)
    for side, ipos in (("encoder", spec.insert_pos_enc),
                       ("decoder", spec.insert_pos_dec)):
        sub = hc.get(side)
        if sub is None:
            continue
        stacked_now = "trunk_cells" in sub
        if to_stacked and not stacked_now:
            new_hc[side] = stack_hybrid_cells(sub, L, ipos)
        elif not to_stacked and stacked_now:
            new_hc[side] = unstack_hybrid_cells(sub, L, ipos)
    new_root = dict(root)
    new_root["hybrid_codec"] = new_hc
    if "params" in params:
        out = dict(params)
        out["params"] = new_root
        return out
    return new_root


def pipeline_vit_trunk(params, num_heads: int, x, mesh: Mesh,
                       axis: str = "pipe",
                       batch_axis: Optional[str] = None,
                       n_microbatch: Optional[int] = None,
                       prefix: str = "transformer_",
                       dtype=None):
    """Pipeline a ``ResidualAttentionBlock`` trunk from a model param tree.

    ``params`` is e.g. a TiTok encoder/decoder or CLIP tower param dict
    holding ``transformer_{i}`` subtrees; ``x`` is the ``(B, S, D)``
    sequence after the model's pre-trunk embedding.  Equivalent to the
    model's sequential ``for blk in self.transformer: x = blk(x)`` loop.
    """
    from ..models.layers import ResidualAttentionBlock
    stacked, _ = stack_trunk(params, prefix)
    block = ResidualAttentionBlock(num_heads, 4.0, dtype)

    def apply_block(p, act):
        return block.apply({"params": p}, act)

    return spmd_pipeline(apply_block, stacked, x, mesh, axis,
                         batch_axis, n_microbatch)
