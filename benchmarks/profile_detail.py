"""Micro-profile of the detail-branch components on the real device.

Breaks the encode detail branch (PROFILE_r03: 491 ms/batch32, 23% of
peak) into its constituent blocks — swin window attention, ConvNeXt,
interactive cross-attention — each timed standalone with the
tunnel-honest methodology (params as jit args, fresh inputs, 1-element
fence), with FLOPs from the compiled executable, so the efficiency sink
inside the branch is attributable to a specific block type.

    python benchmarks/profile_detail.py [--batch 32] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from profile_stages import _flops, time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sic_tpu.models.convnext import ConvNeXtBlock
    from sic_tpu.models.cross import InteractiveCrossAttn
    from sic_tpu.models.swin import SwinBlock

    dev = jax.devices()[0]
    peak = 197e12 if dev.platform == "tpu" else None
    print(f"# device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    B, G, FW = args.batch, 32, 768          # feat grid for 512px, feat_width
    TW, NT = 1024, 4                        # ViT-L width, tiles per image
    S_TITOK = 16 * 16 + 33                  # patch tokens + cls + latents
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def fresh_feat(seed):
        return (jnp.asarray(np.random.default_rng(seed)
                            .standard_normal((B, G, G, FW))
                            .astype(np.float32)).astype(dt),)

    def fresh_cross(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.standard_normal((B, G, G, FW))
                            .astype(np.float32)).astype(dt),
                jnp.asarray(r.standard_normal((B * NT, S_TITOK, TW))
                            .astype(np.float32)).astype(dt))

    cases = {}

    # one plain + one shifted swin block (the stacks alternate)
    for name, shifted in (("swin_plain", False), ("swin_shift", True)):
        m = SwinBlock(FW // 64, 64, FW * 4, 16, shifted, not shifted, dt)
        p = m.init(key, fresh_feat(0)[0])
        fn = jax.jit(lambda p, x, m=m: m.apply(p, x))
        cases[name] = (fn, p, fresh_feat)

    m = ConvNeXtBlock(FW, mlp_ratio=2.0, kernel_size=5, dtype=dt)
    p = m.init(key, fresh_feat(0)[0])
    cases["convnext"] = (jax.jit(lambda p, x, m=m: m.apply(p, x)), p,
                         fresh_feat)

    m = InteractiveCrossAttn(TW, FW, 2, 16, 16, 33, dtype=dt)
    p = m.init(key, *fresh_cross(0), (2, 2))
    cases["cross_attn"] = (
        jax.jit(lambda p, f, t, m=m: m.apply(p, f, t, (2, 2))), p,
        fresh_cross)

    # isolate the ConvNeXt depthwise conv (VPU/HBM-bound by construction)
    import flax.linen as nn

    class _DW(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(FW, (5, 5), feature_group_count=FW, dtype=dt)(x)

    m = _DW()
    p = m.init(key, fresh_feat(0)[0])
    cases["depthwise_5x5"] = (jax.jit(lambda p, x, m=m: m.apply(p, x)), p,
                              fresh_feat)

    result = {"batch": B, "device": dev.device_kind, "ms": {}, "tflops": {},
              "achieved_tflops_s": {}, "pct_of_peak": {}}
    for name, (fn, p, mk) in cases.items():
        t = time_fn(fn, mk, args.reps, static_args=(p,))
        f = _flops(fn.lower(p, *mk(0)).compile())
        result["ms"][name] = round(1e3 * t, 2)
        result["tflops"][name] = round(f / 1e12, 4)
        if f:
            result["achieved_tflops_s"][name] = round(f / t / 1e12, 2)
            if peak:
                result["pct_of_peak"][name] = round(100.0 * f / t / peak, 1)
        print(f"# {name}: {1e3*t:.2f} ms, {f/1e12:.3f} TF", file=sys.stderr,
              flush=True)

    # branch totals at flagship counts: feat_in(4 swin) + 5x(cross + 2 swin
    # + 2 convnext) + feat_out(2 swin) -> 16 swin, 10 convnext, 5 cross
    sw = (result["ms"]["swin_plain"] + result["ms"]["swin_shift"]) / 2
    result["extrapolated_branch_ms"] = round(
        16 * sw + 10 * result["ms"]["convnext"]
        + 5 * result["ms"]["cross_attn"], 1)
    result["note"] = (
        "standalone per-block timings carry the tunnel's ~30-45 ms fixed "
        "per-call overhead (31 calls extrapolated), so extrapolated_branch_ms "
        "OVERSTATES the fused in-pipeline branch cost (PROFILE_r03 measures "
        "it directly at ~491 ms) and distorts block ranking; use "
        "kernel_marginal.py for kernel-vs-kernel comparisons")
    print(json.dumps(result, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
