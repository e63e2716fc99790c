"""Which part of the rANS kernels' sequential walk costs the time?

BENCH r3 measured the device encode path at ~120 ms of kernel time for a
B=1 512px image (4 planes x 4096 positions / 8 lanes ~ 7 us per walked
position) — too slow to beat the host coder's single-fetch path.  The
per-step body mixes suspects that scale differently:

- byte-emission/read masked scans         ~ O(nwords)  -> vary nwords
- the escape lax.cond branch              ~ esc rate   -> vary esc rate
- one-hot CDF row matmuls + fixed reduces ~ O(1)       -> the residual

This times rans_encode_plane / rans_decode_plane at a fixed plane
geometry while sweeping each axis, with the tunnel-honest rules (fresh
data per timed rep, full fetch fences).

    python benchmarks/rans_kernel_ablation.py [--npos 4096]
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npos", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sic_tpu.entropy import EntropyCoder, build_gaussian_tables
    from sic_tpu.ops.rans_decode import (pack_substreams, rans_decode_plane,
                                         split_substreams)
    from sic_tpu.ops.rans_encode import rans_encode_plane

    t = build_gaussian_tables("gaussian")
    cdf = jnp.asarray(t.quantized_cdf)
    sizes = jnp.asarray(t.cdf_length)
    offs = jnp.asarray(t.offset)
    npos = args.npos
    S = 8

    def fresh_plane(seed, esc_rate):
        r = np.random.default_rng(seed)
        idx = r.integers(0, 64, size=(S, npos)).astype(np.int32)
        idx[r.random((S, npos)) < 0.3] = -1
        sym = r.integers(-6, 7, size=(S, npos)).astype(np.int32)
        esc = r.random((S, npos)) < esc_rate
        sym[esc] = r.integers(-4000, 4000, size=int(esc.sum())).astype(np.int32)
        return sym, idx

    def timed(fn, tag, reps=args.reps):
        fn(0)                       # warm/compile
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            fn(1 + i)
            ts.append((time.perf_counter() - t0) * 1e3)
        med = statistics.median(ts)
        print(f"# {tag}: {med:.2f} ms", file=sys.stderr, flush=True)
        return round(med, 2)

    out = {"npos": npos, "lanes": S, "encode_ms": {}, "decode_ms": {}}

    # -- encode: sweep nwords at fixed esc, then esc at fixed nwords ---------
    for nwords in (512, 1024, 2048, 4096):
        def run(seed, nw=nwords):
            sym, idx = fresh_plane(seed, 0.05)
            words = jnp.zeros((S, nw), jnp.uint32)
            meta = jnp.zeros((S, 4), jnp.uint32).at[:, 0].set(1 << 23)
            w, m = rans_encode_plane(jnp.asarray(sym), jnp.asarray(idx),
                                     words, meta, cdf, sizes, offs)
            np.asarray(w), np.asarray(m)
        out["encode_ms"][f"nwords_{nwords}_esc5"] = timed(
            run, f"encode nwords={nwords} esc=5%")
    for esc in (0.0, 0.15, 0.3):
        def run(seed, e=esc):
            sym, idx = fresh_plane(seed, e)
            words = jnp.zeros((S, 2048), jnp.uint32)
            meta = jnp.zeros((S, 4), jnp.uint32).at[:, 0].set(1 << 23)
            w, m = rans_encode_plane(jnp.asarray(sym), jnp.asarray(idx),
                                     words, meta, cdf, sizes, offs)
            np.asarray(w), np.asarray(m)
        out["encode_ms"][f"nwords_2048_esc{int(esc*100)}"] = timed(
            run, f"encode nwords=2048 esc={esc:.0%}")

    # -- decode: same sweeps over real encoded streams -----------------------
    coder = EntropyCoder(S)
    gi = coder.add_cdf(t.quantized_cdf, t.cdf_length, t.offset)

    def make_stream(seed, esc_rate):
        sym, idx = fresh_plane(seed, esc_rate)
        coder.reset()
        coder.encode_with_indexes(sym.reshape(-1).astype(np.int16),
                                  idx.reshape(-1).astype(np.int16), gi)
        coder.flush()
        return sym, idx, split_substreams(coder.get_encoded_stream())

    for bucket in (512, 1024, 2048, 4096):
        def run(seed, b=bucket):
            sym, idx, parts = make_stream(seed, 0.05)
            words, lengths, state = pack_substreams(parts, word_bucket=b)
            got, st = rans_decode_plane(jnp.asarray(idx), jnp.asarray(words),
                                        jnp.asarray(lengths),
                                        jnp.asarray(state), cdf, sizes, offs)
            np.asarray(got), np.asarray(st)
        out["decode_ms"][f"bucket_{bucket}_esc5"] = timed(
            run, f"decode bucket={bucket} esc=5%")
    for esc in (0.0, 0.3):
        def run(seed, e=esc):
            sym, idx, parts = make_stream(seed, e)
            words, lengths, state = pack_substreams(parts, word_bucket=2048)
            got, st = rans_decode_plane(jnp.asarray(idx), jnp.asarray(words),
                                        jnp.asarray(lengths),
                                        jnp.asarray(state), cdf, sizes, offs)
            np.asarray(got), np.asarray(st)
        out["decode_ms"][f"bucket_2048_esc{int(esc*100)}"] = timed(
            run, f"decode bucket=2048 esc={esc:.0%}")

    print(json.dumps(out, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
