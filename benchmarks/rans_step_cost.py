"""Per-position cost of the rANS kernels, measured MARGINALLY.

The standalone ablation (rans_kernel_ablation.py) is dominated by the
~30-45 ms fixed tunnel overhead + host stream prep, which is why its
nwords/escape sweeps look flat.  This isolates the serial walk itself:
time the same kernel at npos=N1 and npos=N2 with identical inputs
otherwise and report (t2 - t1) / (N2 - N1) per position — overhead and
host prep cancel.

Also times an escape-free variant body (esc rate 0 with the cond still
present) vs esc 5% to separate the cond-predicate cost (paid every step)
from the escape-branch cost (paid when taken).

    python benchmarks/rans_step_cost.py
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
    ap.add_argument("--n1", type=int, default=2048)
    ap.add_argument("--n2", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from sic_tpu.entropy import EntropyCoder, build_gaussian_tables
    from sic_tpu.ops.rans_decode import (pack_substreams, rans_decode_plane,
                                         split_substreams)
    from sic_tpu.ops.rans_encode import rans_encode_plane

    t = build_gaussian_tables("gaussian")
    cdf = jnp.asarray(t.quantized_cdf)
    sizes = jnp.asarray(t.cdf_length)
    offs = jnp.asarray(t.offset)
    S = 8

    def fresh_plane(seed, npos, esc_rate):
        r = np.random.default_rng(seed)
        idx = r.integers(0, 64, size=(S, npos)).astype(np.int32)
        idx[r.random((S, npos)) < 0.3] = -1
        sym = r.integers(-6, 7, size=(S, npos)).astype(np.int32)
        esc = r.random((S, npos)) < esc_rate
        sym[esc] = r.integers(-4000, 4000, size=int(esc.sum())).astype(np.int32)
        return sym, idx

    def timed(fn, reps=args.reps):
        fn(0)
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            fn(1 + i)
            ts.append((time.perf_counter() - t0) * 1e3)
        return statistics.median(ts)

    out = {"n1": args.n1, "n2": args.n2, "us_per_pos": {}, "ms": {}}

    def report(tag, t1, t2):
        per = (t2 - t1) / (args.n2 - args.n1) * 1e3
        out["ms"][tag] = {str(args.n1): round(t1, 2), str(args.n2): round(t2, 2)}
        out["us_per_pos"][tag] = round(per, 3)
        print(f"# {tag}: {t1:.1f} -> {t2:.1f} ms, {per:.2f} us/pos",
              file=sys.stderr, flush=True)

    # -- encode ---------------------------------------------------------------
    for esc in (0.0, 0.05):
        ts = {}
        for npos in (args.n1, args.n2):
            # pre-generate fresh inputs OUTSIDE the timed region
            pool = [fresh_plane(100 * i + npos, npos, esc)
                    for i in range(args.reps + 1)]

            def run(i, npos=npos, pool=pool):
                sym, idx = pool[i]
                words = jnp.zeros((S, 8192), jnp.uint32)
                meta = jnp.zeros((S, 4), jnp.uint32).at[:, 0].set(1 << 23)
                w, m = rans_encode_plane(jnp.asarray(sym), jnp.asarray(idx),
                                         words, meta, cdf, sizes, offs)
                np.asarray(w), np.asarray(m)
            ts[npos] = timed(run)
        report(f"encode_esc{int(esc * 100)}", ts[args.n1], ts[args.n2])

    # -- decode ---------------------------------------------------------------
    coder = EntropyCoder(S)
    gi = coder.add_cdf(t.quantized_cdf, t.cdf_length, t.offset)

    def make_stream(seed, npos, esc_rate):
        sym, idx = fresh_plane(seed, npos, esc_rate)
        coder.reset()
        coder.encode_with_indexes(sym.reshape(-1).astype(np.int16),
                                  idx.reshape(-1).astype(np.int16), gi)
        coder.flush()
        return idx, split_substreams(coder.get_encoded_stream())

    for esc in (0.0, 0.05):
        ts = {}
        for npos in (args.n1, args.n2):
            pool = []
            for i in range(args.reps + 1):
                idx, parts = make_stream(100 * i + npos + 7, npos, esc)
                words, lengths, state = pack_substreams(parts,
                                                        word_bucket=8192)
                pool.append((idx, words, lengths, state))

            def run(i, pool=pool):
                idx, words, lengths, state = pool[i]
                got, st = rans_decode_plane(
                    jnp.asarray(idx), jnp.asarray(words),
                    jnp.asarray(lengths), jnp.asarray(state),
                    cdf, sizes, offs)
                np.asarray(got), np.asarray(st)
            ts[npos] = timed(run)
        report(f"decode_esc{int(esc * 100)}", ts[args.n1], ts[args.n2])

    print(json.dumps(out, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
