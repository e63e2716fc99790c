"""Marginal per-block cost of the swin window-attention implementations.

Standalone op timings through the dev tunnel carry ~30-45 ms of fixed
per-call overhead that swamps a ~10 ms kernel, so this measures the
MARGINAL cost: time an N1-block stack and an N2-block stack of identical
SwinBlocks and report (t2 - t1) / (N2 - N1) per block.  Used round 2 to
pick the (G, s, d) Pallas kernel over the einsum path (9.5 vs 11.9
ms/block); round 3 adds the NHWC-native kernel (no HBM relayouts).

    python benchmarks/kernel_marginal.py [--batch 32] [--out FILE]

Modes compared (selected via SIC_WINDOW_ATTN in-process):
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
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import flax.linen as nn

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    B, G, FW = args.batch, 32, 768          # flagship feat grid, feat width
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

    result = {"batch": B, "device": dev.device_kind, "ms_per_block": {},
              "stack_ms": {}}
    for mode in ("pallas", "xla"):
        os.environ["SIC_WINDOW_ATTN"] = mode
        ts = {}
        for n in (args.n1, args.n2):
            m = Stack(n)
            p = m.init(jax.random.PRNGKey(0), fresh(0)[0])
            fn = jax.jit(lambda p, x, m=m: m.apply(p, x))
            ts[n] = time_fn(fn, fresh, args.reps, static_args=(p,))
            print(f"# {mode} stack n={n}: {1e3 * ts[n]:.2f} ms",
                  file=sys.stderr, flush=True)
        per = (ts[args.n2] - ts[args.n1]) / (args.n2 - args.n1)
        result["ms_per_block"][mode] = round(1e3 * per, 2)
        result["stack_ms"][mode] = {str(n): round(1e3 * t, 2)
                                    for n, t in ts.items()}
    print(json.dumps(result, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
