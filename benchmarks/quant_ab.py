"""A/B: float (bf16) vs int8 W8A8 towers on the real chip.

Measures the jitted device stages of the flagship codec at the bench
geometry (512-px images), float vs ``quant="int8"``, with the tunnel
discipline from DESIGN.md §6: fresh inputs per timed repetition, full
materialization fences, median over repeats.

Usage: python benchmarks/quant_ab.py [--batch 8] [--reps 5]
Writes QUANT_AB_r03.json at the repo root.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sic_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SIZE = 512


def fresh_batch(b, seed):
    rng = np.random.RandomState(seed)
    x = rng.rand(b, SIZE, SIZE, 3).astype(np.float32)
    d = jax.device_put(jnp.asarray(x))
    d.block_until_ready()
    float(np.asarray(d[0, 0, 0, 0]))   # land it
    return d


def timed(fn, fence, reps, seed0, batch):
    ts = []
    for i in range(reps):
        x = fresh_batch(batch, seed0 + i)
        t0 = time.time()
        out = fn(x)
        fence(out)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from sic_tpu.config import flagship_spec
    from sic_tpu.models import CodecRuntime, init_codec

    spec = flagship_spec()
    _, params = init_codec(spec, jax.random.PRNGKey(0),
                           image_hw=(SIZE, SIZE), dtype=jnp.bfloat16)

    results = {"metric": "int8_vs_bf16_device_stages", "batch": args.batch,
               "size_px": SIZE, "backend": jax.default_backend()}

    for mode in (None, "int8"):
        tag = mode or "bf16"
        rt = CodecRuntime(spec, params, dtype=jnp.bfloat16, stream_part=4,
                          quant=mode)

        def enc(x):
            z, h, _ = rt._encode(rt.params, x)
            return z, h

        def fence_enc(out):
            z, h = out
            float(np.asarray(z[0, 0])); float(np.asarray(h[0, 0, 0, 0]))

        t_enc = timed(enc, fence_enc, args.reps, 100, args.batch)

        # decode stage: reuse one encode's outputs, decode repeatedly with
        # fresh h_hat perturbations (fresh data per rep for the tunnel)
        x = fresh_batch(args.batch, 7)
        z, h, _ = rt._encode(rt.params, x)
        packed, yh = rt.h_coder.compress_plan(h, q_idx=0)
        stack = (SIZE // spec.tile_px, SIZE // spec.tile_px)

        def dec(_x):
            # fresh z via xor of a rep-dependent constant: new buffers,
            # same shapes (the tunnel memoizes value-identical calls)
            zz = jnp.asarray(dec.z ^ dec.salt)
            out = rt._decode(rt.params, zz, dec.yh, stack)
            return out

        dec.z = np.asarray(z)
        dec.yh = yh
        ts = []
        for i in range(args.reps):
            dec.salt = np.int32(i % max(1, spec.titok.codebook_size - 1))
            t0 = time.time()
            out = dec(None)
            float(np.asarray(out[0, 0, 0, 0]))
            ts.append(time.time() - t0)
        t_dec = float(np.median(ts[1:] or ts))

        results[f"encode_ms_{tag}"] = round(t_enc * 1e3, 2)
        results[f"encode_ms_per_img_{tag}"] = round(t_enc * 1e3 / args.batch, 2)
        results[f"decode_ms_{tag}"] = round(t_dec * 1e3, 2)
        results[f"decode_ms_per_img_{tag}"] = round(t_dec * 1e3 / args.batch, 2)
        print(tag, "encode", results[f"encode_ms_{tag}"], "ms  decode",
              results[f"decode_ms_{tag}"], "ms", flush=True)

    if "encode_ms_bf16" in results and "encode_ms_int8" in results:
        results["encode_speedup"] = round(
            results["encode_ms_bf16"] / results["encode_ms_int8"], 3)
        results["decode_speedup"] = round(
            results["decode_ms_bf16"] / results["decode_ms_int8"], 3)

    with open("QUANT_AB_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
