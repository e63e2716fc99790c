"""Marginal per-block cost of the detail-branch building blocks.

Standalone op timings through the dev tunnel carry ~30-45 ms of fixed
per-call overhead that swamps a ~10 ms kernel, so this measures the
MARGINAL cost: time an N1-block stack and an N2-block stack of identical
blocks and report (t2 - t1) / (N2 - N1) per block.  Used round 2 to
pick the (G, s, d) Pallas kernel over the einsum path (9.5 vs 11.9
ms/block); round 3 adds the NHWC-native kernel (no HBM relayouts) and
the ConvNeXt / interactive-cross-attention blocks so the whole detail
branch (16 swin + 10 convnext + 5 cross per direction, PROFILE_r03) can
be ranked block-by-block without tunnel distortion.

    python benchmarks/kernel_marginal.py [--batch 32] [--out FILE]

Swin modes compared (selected via SIC_WINDOW_ATTN in-process):
  pallas   the deployed NHWC fused kernel
  xla      the einsum reference pipeline
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from profile_stages import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--n1", type=int, default=1)
    ap.add_argument("--n2", type=int, default=5)
    ap.add_argument("--width", type=int, default=768,
                    help="feat width (768 = detail branch; 1024 = the "
                    "FeatMerge trunk geometry)")
    ap.add_argument("--swin-only", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import flax.linen as nn

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    B, G, FW = args.batch, 32, args.width   # flagship feat grid, feat width
    dt = jnp.bfloat16

    def fresh(seed):
        return (jnp.asarray(np.random.default_rng(seed)
                            .standard_normal((B, G, G, FW))
                            .astype(np.float32)).astype(dt),)

    class Stack(nn.Module):
        n: int

        @nn.compact
        def __call__(self, x):
            from sic_tpu.models.swin import SwinBlock
            for i in range(self.n):
                x = SwinBlock(FW // 64, 64, FW * 4, 16, i % 2 == 1,
                              i % 2 == 0, dt)(x)
            return x

    class ConvStack(nn.Module):
        n: int

        @nn.compact
        def __call__(self, x):
            from sic_tpu.models.convnext import ConvNeXtBlock
            for _ in range(self.n):
                x = ConvNeXtBlock(FW, mlp_ratio=2.0, kernel_size=5,
                                  dtype=dt)(x)
            return x

    TW, NT = 1024, 4
    S_TITOK = 16 * 16 + 33

    class CrossStack(nn.Module):
        n: int

        @nn.compact
        def __call__(self, feat, tok):
            from sic_tpu.models.cross import InteractiveCrossAttn
            for _ in range(self.n):
                feat, tok = InteractiveCrossAttn(
                    TW, FW, 2, 16, 16, 33, dtype=dt)(feat, tok, (2, 2))
            return feat, tok

    def fresh_cross(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.standard_normal((B, G, G, FW))
                            .astype(np.float32)).astype(dt),
                jnp.asarray(r.standard_normal((B * NT, S_TITOK, TW))
                            .astype(np.float32)).astype(dt))

    result = {"batch": B, "device": dev.device_kind, "ms_per_block": {},
              "stack_ms": {}}

    def marginal(tag, make_stack, mk_inputs):
        ts = {}
        for n in (args.n1, args.n2):
            m = make_stack(n)
            p = m.init(jax.random.PRNGKey(0), *mk_inputs(0))
            fn = jax.jit(lambda p, *a, m=m: m.apply(p, *a))
            ts[n] = time_fn(fn, mk_inputs, args.reps, static_args=(p,))
            print(f"# {tag} stack n={n}: {1e3 * ts[n]:.2f} ms",
                  file=sys.stderr, flush=True)
        per = (ts[args.n2] - ts[args.n1]) / (args.n2 - args.n1)
        result["ms_per_block"][tag] = round(1e3 * per, 2)
        result["stack_ms"][tag] = {str(n): round(1e3 * t, 2)
                                   for n, t in ts.items()}

    for mode in ("pallas", "xla"):
        os.environ["SIC_WINDOW_ATTN"] = mode
        marginal(f"swin_{mode}", Stack, fresh)
    os.environ["SIC_WINDOW_ATTN"] = "pallas"
    if not args.swin_only:
        marginal("convnext", ConvStack, fresh)
        marginal("cross_attn", CrossStack, fresh_cross)

    # detail-branch totals at the flagship block counts (one direction);
    # only meaningful when every term was measured — a --swin-only run
    # would otherwise print a ~40% underestimate with no marker
    if not args.swin_only:
        result["extrapolated_branch_ms"] = round(
            16 * result["ms_per_block"]["swin_pallas"]
            + 10 * result["ms_per_block"]["convnext"]
            + 5 * result["ms_per_block"]["cross_attn"], 1)
    print(json.dumps(result, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
