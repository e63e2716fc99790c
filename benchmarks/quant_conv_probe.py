"""Is there int8 headroom in the conv-dominated stages? (verdict r3 #8)

The W8A8 serving mode covers the Dense towers only (+4.5-5.3% end to
end, QUANT_AB_r03.json); the stages measured BELOW 50% of bf16 peak are
conv-dominated (VQGAN decoder 69%, detail branch 33%, FeatMerge 25%).
This probe times the dominant conv shapes of those stages as bf16
vs W8A8 int8 (``lax.conv_general_dilated`` with int8 operands and i32
accumulation, per-channel rescale) to decide whether extending the int8
mode to convs clears the >=1.2x bar — or whether the mode should be
demoted to an experiments note.

    python benchmarks/quant_conv_probe.py [--batch 32]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sic_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def time_fn(fn, mk_args, reps: int = 8) -> float:
    """Median seconds over fresh inputs, full materialization fence
    (tunnel-honest: see bench.py)."""
    outs = fn(*mk_args(0))
    jax.tree.map(np.asarray, outs)
    ts = []
    for r in range(1, reps + 1):
        args = mk_args(r)
        t0 = time.perf_counter()
        outs = fn(*args)
        jax.tree.map(np.asarray, outs)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", type=str, default="QUANT_CONV_PROBE_r04.json")
    args = ap.parse_args()
    B = args.batch
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", file=sys.stderr)

    # dominant conv shapes (flagship, 512px decode -> latent grid 32x32):
    #   vqgan up-stack 3x3 convs at rising resolution / falling channels
    #   (taming f16 decoder, ch_mult (1,1,2,2,4), base 128)
    #   bottleneck DepthConv 1x1 mixes at 128ch on the 16x16 latent
    cases = [
        ("vqgan_mid_3x3_512ch_32", (B, 32, 32, 512), (3, 3, 512, 512)),
        ("vqgan_up_3x3_512ch_64", (B, 64, 64, 512), (3, 3, 512, 512)),
        ("vqgan_up_3x3_256ch_128", (B, 128, 128, 256), (3, 3, 256, 256)),
        ("vqgan_up_3x3_128ch_256", (B, 256, 256, 128), (3, 3, 128, 128)),
        ("dcvc_1x1_128ch_16", (B, 16, 16, 128), (1, 1, 128, 128)),
        ("detail_dw_5x5_768ch_32", (B, 32, 32, 768), None),  # depthwise
    ]

    def conv(x, w, feature_group_count=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=feature_group_count)

    # all timed fns reduce to a SCALAR: fetching the conv output tensor
    # (tens of MB) would measure the tunnel, not the MXU
    @jax.jit
    def f_bf16(x, w):
        return jnp.sum(conv(x.astype(jnp.bfloat16),
                            w.astype(jnp.bfloat16)).astype(jnp.float32))

    @jax.jit
    def f_int8(x, w, sx, sw):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.sum(y.astype(jnp.float32) * sx * sw)

    @jax.jit
    def f_bf16_dw(x, w):
        return jnp.sum(conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                            feature_group_count=x.shape[-1])
                       .astype(jnp.float32))

    out = {"batch": B, "device": dev.device_kind, "cases": {}}
    for tag, xshape, wshape in cases:
        r = np.random.default_rng(1)
        if wshape is None:   # depthwise 5x5
            C = xshape[-1]
            wshape = (5, 5, 1, C)
            @jax.jit
            def gen_dw(key, xs=xshape, ws=wshape):
                kx, kw = jax.random.split(key)
                return (jax.random.normal(kx, xs, jnp.float32),
                        jax.random.normal(kw, ws, jnp.float32))

            def mk(s):
                a = gen_dw(jax.random.PRNGKey(2000 + s))
                for t in a:
                    t.block_until_ready()
                return a
            t_b = time_fn(lambda x, w: f_bf16_dw(x, w), mk)
            out["cases"][tag] = {"bf16_ms": round(1e3 * t_b, 3),
                                 "int8_ms": None,
                                 "note": "depthwise: no MXU int8 path"}
            print(f"# {tag}: bf16 {1e3*t_b:.2f} ms (depthwise, skipped int8)",
                  file=sys.stderr, flush=True)
            continue

        # fresh inputs GENERATED ON DEVICE per rep (uploading 30+ MB
        # per rep would measure the link); materialized before timing
        @jax.jit
        def gen_f(key, xs=xshape, ws=wshape):
            kx, kw = jax.random.split(key)
            return (jax.random.normal(kx, xs, jnp.float32),
                    jax.random.normal(kw, ws, jnp.float32))

        @jax.jit
        def gen_q(key, xs=xshape, ws=wshape):
            kx, kw = jax.random.split(key)
            x = jax.random.normal(kx, xs, jnp.float32)
            w = jax.random.normal(kw, ws, jnp.float32)
            sx = jnp.max(jnp.abs(x)) / 127.0
            sw = jnp.max(jnp.abs(w)) / 127.0
            xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
            wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
            return xq, wq, sx, sw

        def _ready(args):
            for a in args:
                a.block_until_ready()
            return args

        def mk_f(s):
            return _ready(gen_f(jax.random.PRNGKey(s)))

        def mk_q(s):
            return _ready(gen_q(jax.random.PRNGKey(1000 + s)))

        t_b = time_fn(f_bf16, mk_f)
        t_q = time_fn(f_int8, mk_q)
        speedup = t_b / t_q
        out["cases"][tag] = {"bf16_ms": round(1e3 * t_b, 3),
                             "int8_ms": round(1e3 * t_q, 3),
                             "speedup": round(speedup, 3)}
        print(f"# {tag}: bf16 {1e3*t_b:.2f} ms, int8 {1e3*t_q:.2f} ms "
              f"({speedup:.2f}x)", file=sys.stderr, flush=True)

    sp = [c["speedup"] for c in out["cases"].values()
          if c.get("speedup")]
    out["max_speedup"] = max(sp) if sp else None
    out["clears_1p2x_bar"] = bool(sp and max(sp) >= 1.2)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
