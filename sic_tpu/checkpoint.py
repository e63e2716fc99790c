"""Codec parameter persistence (orbax) + torch-reference weight porting hooks.

The reference stores Lightning ``.ckpt`` files; here inference params are an
orbax tree.  ``load_codec_params`` restores from either a bare params
checkpoint or a full training-state checkpoint (it extracts ``params``).
"""
from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp


def _params_template(spec, image_hw=None, dtype=None):
    from .models.codec import Codec

    hw = image_hw or (spec.tile_px, spec.tile_px)
    model = Codec(spec, dtype)
    x = jax.ShapeDtypeStruct((1, hw[0], hw[1], 3), jnp.float32)
    init_fn = functools.partial(model.init, method="init_all")
    return jax.eval_shape(init_fn, jax.random.PRNGKey(0), x)


def save_codec_params(path, params) -> str:
    import orbax.checkpoint as ocp
    p = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(p, params, force=True)
    return str(p)


def load_codec_params(path, spec, image_hw=None, dtype=None):
    """Restore codec params; accepts a bare-params dir or a TrainState dir."""
    import orbax.checkpoint as ocp
    p = Path(path).resolve()
    template = _params_template(spec, image_hw, dtype)
    with ocp.StandardCheckpointer() as ckptr:
        try:
            return ckptr.restore(p, template)
        except Exception:
            # training-state checkpoint: pull just the params subtree
            restored = ckptr.restore(p)
            if isinstance(restored, dict) and "params" in restored:
                sub = restored["params"]
                if isinstance(sub, dict) and "params" in sub:
                    return sub
                return {"params": sub} if "params" not in sub else sub
            raise
