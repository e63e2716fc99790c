"""Headline benchmark: 512-px encode+decode throughput per chip.

Runs the flagship codec (ViT-L hybrid + f16 VQGAN, bf16 compute) through the
FULL pipeline — jitted encode, real rANS bitstream write/read for both
streams, jitted generative decode — and reports images/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

``vs_baseline`` is the ratio to the same pipeline on the host CPU (the
reference implementation is CPU/GPU torch and publishes no numbers —
BASELINE.md; the north-star target is >=10x the CPU baseline).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


# Same-pipeline host-CPU baseline, measured once with
#   JAX_PLATFORMS=cpu python bench.py --cpu-baseline
# on this container's CPU (see BASELINE.md north-star: >=10x CPU).
CPU_BASELINE_IMG_S = 0.0111

SIZE = 512
ITERS = 8


def build():
    from sic_tpu.config import flagship_spec
    from sic_tpu.models import CodecRuntime, init_codec

    spec = flagship_spec()
    _, params = init_codec(spec, jax.random.PRNGKey(0),
                           image_hw=(256, 256), dtype=jnp.bfloat16)
    return CodecRuntime(spec, params, dtype=jnp.bfloat16)


def run(rt):
    keys = jax.random.split(jax.random.PRNGKey(1), ITERS)
    images = [jax.random.uniform(k, (1, SIZE, SIZE, 3),
                                 minval=-1.0, maxval=1.0) for k in keys]
    # warmup / compile
    for _ in range(2):
        x_hat, bpp, _ = rt.encode_decode(images[0], (SIZE, SIZE))
    jax.block_until_ready(x_hat)

    xb = jnp.concatenate(images, axis=0)
    for enc in rt.encode_only_batched(xb):       # warm the batched path
        pass

    rt.decode_only_many(rt.encode_only_batched(xb), workers=4)  # warm

    # production pipeline shape: batched encode (one device pass + one
    # fetch for all images, per-image bitstreams) + concurrent per-image
    # decodes (each request on its own rANS decoder, overlapping round trips)
    t0 = time.perf_counter()
    encs = rt.encode_only_batched(xb)
    outs = rt.decode_only_many(encs, workers=4)
    jax.block_until_ready(outs[-1])
    dt = time.perf_counter() - t0

    h, w = SIZE, SIZE
    bits = len(encs[-1]["z_bit_stream"]) * 8 + len(encs[-1]["h_bit_stream"]) * 8
    bpp = {"total_bpp": bits / (h * w)}
    return ITERS / dt, bpp


def main():
    import sys
    rt = build()
    img_s, bpp = run(rt)
    if "--cpu-baseline" in sys.argv:
        print(f"# measured CPU baseline: {img_s:.4f} img/s")
        return
    print(json.dumps({
        "metric": "512px_encode_decode_throughput",
        "value": round(img_s, 4),
        "unit": "img/s",
        "vs_baseline": round(img_s / CPU_BASELINE_IMG_S, 2),
    }))


if __name__ == "__main__":
    main()
