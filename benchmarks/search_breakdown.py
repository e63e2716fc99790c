"""Where does a search wave spend its time? (upload vs matmul vs top_k)

The QPS harness (search_qps.py) measured 3093 QPS at batch 256 over 100k
vectors — below the >=5k north star.  Each wave = query upload + (B, D) x
(D, N) matmul + lax.top_k + tiny result fetch; this script times the
pieces separately with the tunnel-honest rules (fresh inputs, full
materialization fences) so the right fix is knowable:

- upload-bound  -> pipeline the uploads / accept tokens not embeddings
- top_k-bound   -> exact two-stage top-k (grouped iterated max + merge)
- matmul-bound  -> nothing to do; bf16 MXU is the floor

MEASURED (v5e via tunnel, 2026-08-18): upload-only 66.7 ms, +matmul
~14 ms, +lax.top_k 81.0 ms, two-stage top-k 87.6 ms.  Conclusion: the
wave is upload/RTT-bound; lax.top_k already beats the hand-rolled
two-stage, so the fix is a bigger serving wave (1024 queries -> 9.1k
QPS, 4096 -> 14.0k), not a top-k kernel.  bench.py reports the
1024-wave number as search_qps_100k.

    python benchmarks/search_breakdown.py [--n 100000] [--batch 256]
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    db = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    db_dev = jnp.asarray(db)

    def fresh(seed):
        r = np.random.default_rng(seed)
        q = db[r.integers(0, args.n, size=args.batch)] + \
            r.normal(scale=1e-3, size=(args.batch, args.dim)).astype(np.float32)
        return (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

    @jax.jit
    def _scores(q):
        return jnp.dot(q.astype(jnp.bfloat16), db_dev.T.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def _scores_topk(q, k):
        s = _scores(q)
        return jax.lax.top_k(s, k)

    @functools.partial(jax.jit, static_argnames=("k",))
    def _scores_topk2(q, k):
        """Exact two-stage top-k: per-4096-group iterated max, then a tiny
        lax.top_k over the G*k candidates.  Tie behavior (lowest index
        wins) matches lax.top_k: argmax picks the first occurrence and the
        candidate list is group-major."""
        s = _scores(q)
        B, N = s.shape
        GROUP = 4096
        G = -(-N // GROUP)
        pad = G * GROUP - N
        sp = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        sp = sp.reshape(B, G, GROUP)
        pos_ids = jax.lax.broadcasted_iota(jnp.int32, (B, G, GROUP), 2)
        cs, ci = [], []
        cur = sp
        for _ in range(k):
            m = jnp.max(cur, axis=2)
            am = jnp.argmax(cur, axis=2).astype(jnp.int32)
            cs.append(m)
            ci.append(am)
            cur = jnp.where(pos_ids == am[..., None], -jnp.inf, cur)
        cand_s = jnp.stack(cs, axis=2).reshape(B, G * k)
        cand_i = jnp.stack(ci, axis=2).reshape(B, G * k)
        base = (jax.lax.broadcasted_iota(jnp.int32, (B, G, k), 1)
                .reshape(B, G * k) * GROUP)
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i + base, pos, axis=1)
        return top_s, top_i

    def timed(fn, tag, reps=args.reps):
        fn(0)                           # warm/compile
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            fn(1 + i)
            ts.append((time.perf_counter() - t0) * 1e3)
        med = statistics.median(ts)
        print(f"# {tag}: {med:.1f} ms", file=sys.stderr, flush=True)
        return med

    out = {"n": args.n, "batch": args.batch, "k": args.k}

    def _fence(x):
        for t in (x if isinstance(x, tuple) else (x,)):
            np.asarray(t)

    @jax.jit
    def _scores_reduced(q):
        # fence on a (B, 8) slice-of-max reduction: fetching the full
        # (B, N) scores would ship ~100 MB back through the tunnel and
        # measure the download, not the matmul (observed: 11.7 s)
        s = _scores(q)
        return jnp.max(s.reshape(q.shape[0], 8, -1), axis=2)

    out["upload_ms"] = timed(
        lambda i: _fence(jnp.asarray(fresh(i)) + 0.0), "upload only")
    out["upload_matmul_ms"] = timed(
        lambda i: _fence(_scores_reduced(jnp.asarray(fresh(i)))),
        "upload+matmul")
    out["upload_matmul_topk_ms"] = timed(
        lambda i: _fence(_scores_topk(jnp.asarray(fresh(i)), args.k)),
        "upload+matmul+lax.top_k")
    out["upload_matmul_topk2_ms"] = timed(
        lambda i: _fence(_scores_topk2(jnp.asarray(fresh(i)), args.k)),
        "upload+matmul+two-stage top_k")

    # correctness: the two implementations must agree exactly
    q = jnp.asarray(fresh(999))
    s1, i1 = _scores_topk(q, args.k)
    s2, i2 = _scores_topk2(q, args.k)
    agree = bool(jnp.all(i1 == i2)) and bool(jnp.all(s1 == s2))
    out["two_stage_exact_match"] = agree
    print(json.dumps(out))


if __name__ == "__main__":
    main()
