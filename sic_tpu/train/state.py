"""Train state, parameter partitioning and optimizers.

The reference freezes sub-modules with ``requires_grad_`` and relies on the
optimizer's param list (reference: codec_sq_fixbpp.py:510-520, 560-569);
here freezing is expressed functionally:

- a *static* partition labels every param ``frozen`` (TiTok backbone,
  latent_tokens, titok codebook, VQGAN encoder side) or ``ae``; frozen
  params get ``optax.set_to_zero`` so no moments are allocated for the
  0.3B-param ViT backbone;
- the *stage-dependent* freeze (VQGAN decoder side during feat stages) is a
  grad mask applied before the update, keeping optimizer-state shapes
  stable across stage transitions.

Schedule state (epoch_for_strategy, lmbda_idx, lmbda_list) lives inside the
TrainState so orbax checkpoints carry it — the analogue of the reference's
non-grad ``nn.Parameter`` trick (codec_sq_fixbpp.py:542-546).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

# -- static partition ---------------------------------------------------------

_FROZEN_TITOK_LEAVES = {
    "patch_embed", "class_embedding", "positional_embedding",
    "latent_token_positional_embedding", "ln_pre", "ln_post", "conv_out",
    "decoder_embed", "mask_token",
}


def is_frozen_path(path: Tuple[str, ...], tune_titok: bool = False) -> bool:
    """True for params the optimizer never updates
    (reference: codec_sq_fixbpp.py:48-52 requires_grad_(False) and
    :471-474 frozen VQGAN encoder/quant_conv)."""
    if not path or path[0] != "params":
        path = ("params",) + tuple(path)
    p = path[1:]
    if p[0] == "hybrid_codec":
        if p[1] == "latent_tokens" or p[1] == "quantize":
            return True
        if p[1] in ("encoder", "decoder") and not tune_titok:
            leaf = p[2]
            if leaf in _FROZEN_TITOK_LEAVES or leaf.startswith("transformer_"):
                return True
            if leaf == "trunk_cells":     # PP cell layout: the stacked ViT
                # layers are the frozen TiTok trunk; the interaction params
                # (inter/feat_block) are the trainable detail branch
                return len(p) > 3 and p[3].startswith("vit_")
        return False
    if p[0] == "vqgan":
        return p[1] in ("encoder", "quant_conv")
    return False


def partition_labels(params, tune_titok: bool = False):
    """'frozen' / 'ae' label tree for optax.multi_transform."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = {}
    for keypath, _ in flat:
        path = tuple(k.key for k in keypath)
        label = "frozen" if is_frozen_path(path, tune_titok) else "ae"
        d = labels
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = label
    return labels


def split_params(params, tune_titok: bool = False):
    """Partition the codec param tree into (trainable, frozen) flat dicts.

    The training step differentiates ONLY the trainable subtree — the
    frozen 0.6B-param ViT backbones get neither gradient buffers nor
    optimizer state (the memory counterpart of the reference's
    ``requires_grad_(False)``)."""
    import flax.traverse_util as tu
    flat = tu.flatten_dict(params)
    train, frozen = {}, {}
    for k, v in flat.items():
        (frozen if is_frozen_path(k, tune_titok) else train)[k] = v
    return train, frozen


def merge_params(train_flat, frozen_flat):
    import flax.traverse_util as tu
    return tu.unflatten_dict({**train_flat, **frozen_flat})


def _is_vqgan_decoder_side(path) -> bool:
    p = tuple(getattr(k, "key", k) for k in path)
    if "vqgan" in p:
        sub = p[p.index("vqgan") + 1]
        return sub in ("decoder", "post_quant_conv", "quantize")
    return False


def stage_grad_mask(grads, stage: str):
    """Zero the VQGAN decoder-side grads outside stage 'pix'
    (reference: codec_sq_fixbpp.py:560-569).  Works on nested trees and on
    the flat dicts produced by :func:`split_params`."""
    if stage == "pix":
        return grads
    if isinstance(grads, dict) and grads and \
            isinstance(next(iter(grads.keys())), tuple):
        return {k: (jnp.zeros_like(g) if _is_vqgan_decoder_side(k) else g)
                for k, g in grads.items()}

    def mask(path, g):
        return jnp.zeros_like(g) if _is_vqgan_decoder_side(path) else g

    return jax.tree_util.tree_map_with_path(mask, grads)


def make_ae_optimizer(params, learning_rate: float, tune_titok: bool = False,
                      mu_dtype=None):
    """Adam betas (0.5, 0.9) over the TRAINABLE subtree only
    (reference: codec_sq_fixbpp.py:510-517).  Returns (tx, init_state) —
    moments exist only for trainable params.  ``mu_dtype=jnp.bfloat16``
    halves first-moment memory (big-model single-chip option)."""
    tx = optax.adam(learning_rate, b1=0.5, b2=0.9, mu_dtype=mu_dtype)
    trainable, _ = split_params(params, tune_titok)
    return tx, tx.init(trainable)


def cast_frozen_params(params, dtype, tune_titok: bool = False):
    """Store the frozen subtree (TiTok backbones, VQGAN encoder) at a lower
    dtype — they are inference-only, so bf16 storage halves their HBM
    footprint without touching optimizer numerics."""
    import flax.traverse_util as tu
    flat = tu.flatten_dict(params)
    out = {k: (v.astype(dtype) if is_frozen_path(k, tune_titok) else v)
           for k, v in flat.items()}
    return tu.unflatten_dict(out)


def make_disc_optimizer(learning_rate: float):
    return optax.adam(learning_rate, b1=0.5, b2=0.9)


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state_ae: Any
    disc_params: Any
    disc_stats: Any
    opt_state_disc: Any
    lpips_params: Any                      # frozen
    global_step: jax.Array                 # i32 scalar
    epoch_for_strategy: jax.Array          # i32 scalar
    lmbda_idx: jax.Array                   # i32 scalar
    lmbda_list: jax.Array                  # f32 (n,)
    rate_floor: jax.Array                  # f32 scalar; 0 disables
    rng: jax.Array

    def current_lmbda(self):
        return self.lmbda_list[jnp.clip(self.lmbda_idx, 0,
                                        self.lmbda_list.shape[0] - 1)]
