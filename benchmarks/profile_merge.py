"""Sub-stage profile of FeatMerge + the softmax codebook mixture.

PROFILE_DECODE_r03b measured the merge_mix stage (FeatMerge fusion +
soft codebook mixture, reference codec_sq_fixbpp.py:395-439 + :658-663)
at 25.3% of bf16 peak — the least efficient decode stage.  This splits
it into its serial parts, each a standalone flax module with fresh
params (kernel_marginal methodology: jitted standalone, params passed
as jit args, fenced by a 1-element fetch), so the inefficiency can be
attributed:

  swin_titok_in   SwinStack(1024, 2) on (B, 32, 32, 1024)
  swin_feat_in    SwinStack(768, 2)  on (B, 32, 32, 768)
  merge_dense     concat -> fc1(2048) -> LN -> silu -> fc2(1024)
  merge_swin      SwinStack(1024, 4)
  ffn_mix         LN -> fc1(2048) -> tanh -> fc2(256) -> f32 softmax
                  -> (bhwn,nd) codebook mixture
  featmerge_full  the real FeatMerge module end to end (+ mixture)

    python benchmarks/profile_merge.py [--batch 32] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from profile_stages import time_fn, _flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--grid", type=int, default=32,
                    help="spatial grid (512px / tile 16 = 32)")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from sic_tpu.models.swin import SwinStack
    from sic_tpu.models.hybrid import FeatMerge
    from sic_tpu.models.layers import LayerNorm
    from sic_tpu.ops.quant import QDense

    dev = jax.devices()[0]
    peak = 197e12 if dev.platform == "tpu" else None
    print(f"# device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    B, G = args.batch, args.grid
    # FeatMerge flagship geometry; ED = VQGANSpec.embed_dim (the codebook
    # embedding width — NOT NE, they are only coincidentally equal here)
    TW, FW, NE, IW, ED = 1024, 768, 256, 1024, 256
    dt = jnp.bfloat16

    def arr(seed, *shape):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.standard_normal(shape).astype(np.float32)).astype(dt)

    # QDense == nn.Dense in float mode; using it keeps these sub-stage
    # replicas representative of the int8 W8A8 serving path too (ADVICE r3)
    class MergeDense(nn.Module):
        @nn.compact
        def __call__(self, titok, feat):
            h = jnp.concatenate([titok, feat], axis=-1)
            h = QDense(TW * 2, dtype=dt, name="merge_fc1")(h)
            h = LayerNorm(dtype=dt, name="merge_ln")(h)
            h = nn.silu(h)
            return QDense(IW, dtype=dt, name="merge_fc2")(h)

    class FfnMix(nn.Module):
        @nn.compact
        def __call__(self, h, codebook):
            h = LayerNorm(dtype=dt, name="ffn_ln")(h)
            h = QDense(IW * 2, dtype=dt, name="ffn_fc1")(h)
            h = jnp.tanh(h)
            logits = QDense(NE, dtype=dt, name="ffn_fc2")(h)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.einsum("bhwn,nd->bhwd", probs, codebook)

    class FullMerge(nn.Module):
        @nn.compact
        def __call__(self, titok, feat, codebook):
            logits = FeatMerge(TW, FW, NE, IW, dtype=dt, name="fm")(titok, feat)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.einsum("bhwn,nd->bhwd", probs, codebook)

    cases = [
        ("swin_titok_in", SwinStack(TW, 2, dtype=dt),
         lambda s: (arr(s, B, G, G, TW),)),
        ("swin_feat_in", SwinStack(FW, 2, dtype=dt),
         lambda s: (arr(s, B, G, G, FW),)),
        ("merge_dense", MergeDense(),
         lambda s: (arr(s, B, G, G, TW), arr(s + 1, B, G, G, FW))),
        ("merge_swin", SwinStack(IW, 4, dtype=dt),
         lambda s: (arr(s, B, G, G, IW),)),
        ("ffn_mix", FfnMix(),
         lambda s: (arr(s, B, G, G, IW), arr(s + 1, NE, ED))),
        ("featmerge_full", FullMerge(),
         lambda s: (arr(s, B, G, G, TW), arr(s + 1, B, G, G, FW),
                    arr(s + 2, NE, ED))),
    ]

    out = {"batch": B, "grid": G, "device": dev.device_kind,
           "ms": {}, "tflops": {}, "achieved_tflops_s": {}, "pct_of_peak": {}}
    for tag, mod, mk in cases:
        example = mk(0)
        params = mod.init(jax.random.PRNGKey(0), *example)
        fn = jax.jit(mod.apply)
        t = time_fn(fn, mk, args.reps, static_args=(params,))
        fl = _flops(fn.lower(params, *example).compile())
        out["ms"][tag] = round(1e3 * t, 2)
        out["tflops"][tag] = round(fl / 1e12, 4)
        out["achieved_tflops_s"][tag] = round(fl / t / 1e12, 2)
        if peak:
            out["pct_of_peak"][tag] = round(100 * fl / t / peak, 1)
        print(f"# {tag}: {1e3 * t:.2f} ms, {fl / 1e12:.3f} TF -> "
              f"{fl / t / 1e12:.1f} TF/s", file=sys.stderr, flush=True)

    js = json.dumps(out, indent=1)
    print(js)
    if args.out:
        Path(args.out).write_text(js + "\n")


if __name__ == "__main__":
    main()
