"""Decode-side sub-stage profile: where do decode_full's ~1016 ms go?

PROFILE_r03 splits the encode but times the generative decode as one
jitted block (42% of peak).  This splits it into its three serial parts
(reference decode loop: src/compressai/utils/decompress.py via
codec_sq_fixbpp.py:658-668):

  hybrid_decode   z-index embed + 24-block ViT decoder + detail branch
  merge_mix       FeatMerge fusion + softmax codebook mixture
  vqgan_decode    the 512-px CNN pixel decoder

Each part is jitted standalone and timed tunnel-honest (fresh inputs,
full materialization; see tpu-bench-discipline).  Sub-stage times won't
sum exactly to decode_full (XLA fuses across the seams) but rank the
levers.

    python benchmarks/profile_decode.py [--batch 32] [--size 512] [--out FILE]
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sic_tpu.config import flagship_spec, tiny_spec
    from sic_tpu.models import CodecRuntime, init_codec

    dev = jax.devices()[0]
    peak = 197e12 if dev.platform == "tpu" else None
    print(f"# device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    spec = tiny_spec() if args.tiny else flagship_spec()
    dt = None if args.tiny else jnp.bfloat16
    _, params = init_codec(spec, jax.random.PRNGKey(0),
                           image_hw=(256, 256), dtype=dt)
    rt = CodecRuntime(spec, params, dtype=dt)
    model = rt.model
    B, S = args.batch, args.size
    nH = nW = S // spec.tile_px
    BT = B * nH * nW
    ts = spec.titok
    fw = spec.feat_width
    cdt = dt or jnp.float32

    r0 = np.random.default_rng(0)

    def fresh_hybrid(seed):
        r = np.random.default_rng(seed)
        z_idx = jnp.asarray(r.integers(0, ts.codebook_size, (BT, ts.num_latent_tokens)), jnp.int32)
        h_hat = jnp.asarray(r.standard_normal((B, S // 32, S // 32, fw)).astype(np.float32)).astype(cdt)
        return z_idx, h_hat

    def fresh_merge(seed):
        r = np.random.default_rng(seed)
        titok = jnp.asarray(r.standard_normal((B, S // 16, S // 16, ts.width)).astype(np.float32)).astype(cdt)
        feat = jnp.asarray(r.standard_normal((B, S // 16, S // 16, fw)).astype(np.float32)).astype(cdt)
        return titok, feat

    zc = spec.vqgan.embed_dim if hasattr(spec.vqgan, "embed_dim") else 256

    def fresh_latent(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.standard_normal((B, S // 16, S // 16, zc)).astype(np.float32)).astype(cdt),)

    @jax.jit
    def hybrid_decode(params, z_idx, h_hat):
        def run(m, z_idx, h_hat):
            z_hat = m.hybrid_codec.decode_z_indices(z_idx)
            return m.hybrid_codec.decode(z_hat, h_hat, (nH, nW))
        return model.apply(params, z_idx, h_hat, method=run)

    @jax.jit
    def merge_mix(params, titok, feat):
        def run(m, titok, feat):
            return m.decode_to_latent(titok, feat)
        return model.apply(params, titok, feat, method=run)

    @jax.jit
    def vqgan_decode(params, latent):
        def run(m, latent):
            return m.decode_to_image(latent)
        return model.apply(params, latent, method=run)

    out = {"batch": B, "size": S, "device": dev.device_kind,
           "ms": {}, "tflops": {}, "achieved_tflops_s": {}, "pct_of_peak": {}}

    def stage(tag, fn, mk, example):
        t = time_fn(fn, mk, args.reps, static_args=(rt.params,))
        fl = _flops(fn.lower(rt.params, *example).compile())
        out["ms"][tag] = round(1e3 * t, 2)
        out["tflops"][tag] = round(fl / 1e12, 4)
        out["achieved_tflops_s"][tag] = round(fl / t / 1e12, 2)
        if peak:
            out["pct_of_peak"][tag] = round(100 * fl / t / peak, 1)
        print(f"# {tag}: {1e3 * t:.2f} ms, {fl / 1e12:.3f} TF "
              f"-> {fl / t / 1e12:.1f} TF/s", file=sys.stderr, flush=True)

    stage("hybrid_decode", hybrid_decode, fresh_hybrid, fresh_hybrid(0))
    stage("merge_mix", merge_mix, fresh_merge, fresh_merge(0))
    try:
        stage("vqgan_decode", vqgan_decode, fresh_latent, fresh_latent(0))
    except Exception as e:  # latent dim guess may not match the spec
        print(f"# vqgan_decode failed: {e}", file=sys.stderr)

    print(json.dumps(out, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
