"""Per-component device profile of the deployment pipeline.

Times each compute stage of the flagship codec SEPARATELY on the real
device, with the tunnel-honest methodology (fresh inputs per rep, full
materializing fetch as the fence), and reads per-stage FLOPs from the
compiled executables — so each stage gets an achieved-TFLOP/s number and
the gap between pipeline MFU and per-stage compute efficiency is
attributable to specific kernels instead of folklore.

Stages:
  encode_full      jitted Codec.encode_stage (ViT+detail branch+quantize)
  titok_only       the 24 ResidualAttentionBlocks alone (no detail branch)
  detail_only      encode_full minus titok_only (by subtraction)
  bottleneck       the 4-part autoregressive prior chain (compress_plan)
  decode_full      jitted Codec.decode_stage (generative decode)

    python benchmarks/profile_stages.py [--batch 8] [--size 512] [--out PROFILE.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    try:
        return float(ca["flops"])
    except Exception:
        return 0.0


def time_fn(fn, make_args, reps: int = 6, static_args=()):
    """Median seconds over ``reps`` runs on FRESH args; each rep fenced by a
    full np.asarray of every output leaf.

    ``static_args`` (e.g. the model params) are prepended to every call
    but placed on device ONCE, outside the clock — passing them as jit
    arguments instead of letting the closure capture them keeps multi-GB
    weights out of the lowered HLO's constant pool (a closure-captured
    flagship checkpoint serializes ~2 GB of constants into every compile,
    which through the dev tunnel dominates the measurement)."""
    import jax

    def fence(out):
        """Force full execution with a ONE-element fetch per leaf.

        A full np.asarray would add the whole result's tunnel transfer to
        the clock (the 512px decode output is ~100 MB ≈ seconds of link
        time) — this profiler wants device compute, and the deployment
        paths leave these intermediates on device.  Fetching one element
        still forces the computation to complete (the tunnel executes
        lazily but cannot serve element 0 without running the program)."""
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)

    def fence_full(out):
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)

    static_args = jax.block_until_ready(static_args)
    fence(fn(*static_args, *make_args(0)))          # warm/compile
    ts = []
    for r in range(1, reps + 1):
        args = make_args(r)
        fence_full(args)              # materialize inputs outside the clock
        t0 = time.perf_counter()
        fence(fn(*static_args, *args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="images per timed dispatch (512px: 4 tiles each)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny spec on CPU (smoke-test the harness itself)")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sic_tpu.config import flagship_spec, tiny_spec
    from sic_tpu.models import CodecRuntime, init_codec
    from sic_tpu.models.codec import Codec

    dev = jax.devices()[0]
    peak = 197e12 if dev.platform == "tpu" else None
    print(f"# device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    spec = tiny_spec() if args.tiny else flagship_spec()
    dt = None if args.tiny else jnp.bfloat16
    _, params = init_codec(spec, jax.random.PRNGKey(0),
                           image_hw=(256, 256), dtype=dt)
    rt = CodecRuntime(spec, params, dtype=dt)
    B, S = args.batch, args.size
    n_tiles = (S // spec.tile_px) ** 2

    def fresh_x(seed):
        return (jnp.asarray(
            np.random.default_rng(seed).uniform(0, 1, (B, S, S, 3))
            .astype(np.float32)),)

    model = rt.model

    # -- titok transformer alone (per-tile ViT without the detail branch) ----
    @jax.jit
    def titok_only(params, x01):
        def run(m, x01):
            enc = m.hybrid_codec.encoder
            s = enc.spec
            from sic_tpu.models.cross import tile_nhwc_to_tokens
            x_emb = enc.patch_embed(x01)
            x, stack_shape = tile_nhwc_to_tokens(x_emb, s.grid_size)
            BT = x.shape[0]
            cls = jnp.broadcast_to(enc.class_embedding.astype(x.dtype),
                                   (BT, 1, s.width))
            x = jnp.concatenate([cls, x], axis=1)
            x = x + enc.positional_embedding.astype(x.dtype)
            lat = jnp.broadcast_to(
                m.hybrid_codec.latent_tokens.astype(x.dtype)[None],
                (BT, s.num_latent_tokens, s.width))
            lat = lat + enc.latent_token_positional_embedding.astype(x.dtype)
            x = jnp.concatenate([x, lat], axis=1)
            x = enc.ln_pre(x)
            for i in range(s.num_layers):
                x = enc.transformer[i](x)
            return x
        return model.apply(params, x01, method=run)

    @jax.jit
    def encode_full(params, x01):
        return model.apply(params, x01, method=Codec.encode_stage)

    def bottleneck_chain(h):
        packed, y_hat = rt.h_coder.compress_plan(h, q_idx=0)
        return packed

    stages = {}
    flops = {}

    x0 = fresh_x(999)[0]
    stages["encode_full"] = time_fn(encode_full, fresh_x, args.reps,
                                    static_args=(rt.params,))
    flops["encode_full"] = _flops(encode_full.lower(rt.params, x0).compile())
    stages["titok_only"] = time_fn(titok_only, fresh_x, args.reps,
                                   static_args=(rt.params,))
    flops["titok_only"] = _flops(titok_only.lower(rt.params, x0).compile())

    # bottleneck: fresh h per rep (computed outside the clock)
    _, h0, _ = rt._encode(rt.params, x0)

    def fresh_h(seed):
        _, h, _ = rt._encode(rt.params, fresh_x(seed + 500)[0])
        return (h,)

    stages["bottleneck"] = time_fn(bottleneck_chain, fresh_h, args.reps)

    # decode: fresh (z, h_hat) per rep
    z0, _, _ = rt._encode(rt.params, x0)
    hhat0 = rt.h_coder.decompress(
        rt.h_coder.encode_packed(np.asarray(bottleneck_chain(h0))),
        (B, S // 32, S // 32, spec.quant_dim))
    stack = (S // spec.tile_px, S // spec.tile_px)

    def fresh_zh(seed):
        x = fresh_x(seed + 900)[0]
        z, h, _ = rt._encode(rt.params, x)
        hhat = rt.h_coder.decompress(
            rt.h_coder.encode_packed(np.asarray(rt.h_coder.compress_plan(
                h, q_idx=0)[0])),
            (B, S // 32, S // 32, spec.quant_dim))
        return (z, hhat)

    def decode_full(z, hhat):
        return rt._decode(rt.params, z, hhat, stack)

    stages["decode_full"] = time_fn(decode_full, fresh_zh, args.reps)
    flops["decode_full"] = _flops(
        rt._decode.lower(rt.params, z0, hhat0, stack).compile())

    result = {"batch": B, "size": S, "n_tiles_per_img": n_tiles,
              "device": dev.device_kind, "stages_ms": {}, "tflops": {},
              "achieved_tflops_s": {}, "pct_of_peak": {}}
    stages["detail_only"] = stages["encode_full"] - stages["titok_only"]
    flops["detail_only"] = flops["encode_full"] - flops["titok_only"]
    for k, s in stages.items():
        result["stages_ms"][k] = round(1e3 * s, 1)
        f = flops.get(k, 0.0)
        if f:
            result["tflops"][k] = round(f / 1e12, 3)
            result["achieved_tflops_s"][k] = round(f / s / 1e12, 2)
            if peak:
                result["pct_of_peak"][k] = round(100.0 * f / s / peak, 1)
    result["per_image_ms"] = {k: round(1e3 * s / B, 2)
                              for k, s in stages.items()}
    print(json.dumps(result, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
