"""Secondary benchmark: top-k semantic search QPS over 100k embeddings.

North-star target (BASELINE.md): >=5k QPS top-k over 100k CLIP vectors,
FAISS-flat parity.  The index is one HBM-resident matrix; a query batch is
one (B, D) x (D, N) matmul + ``lax.top_k`` under jit.

Tunnel-honest measurement: every iteration submits a FRESH query batch
(the axon link memoizes repeated identical computations) and the timed
region ends with a full ``np.asarray`` of every result
(``block_until_ready`` can return early over the tunnel).

    python benchmarks/search_qps.py [--n 100000] [--batch 256] [--k 10]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def measure(n: int = 100_000, dim: int = 512, batch: int = 256, k: int = 10,
            iters: int = 16, pipelined: bool = True,
            depth: int = 4) -> float:
    """QPS of top-k search with ``iters`` independent query batches in
    flight, including each batch's host->device upload (what a serving
    process pays per request wave).

    ``pipelined=True`` drives ``VectorIndex.search_many`` (thread-pooled
    waves: wave j+1's upload overlaps wave j's compute — the round-4 fix
    for the RTT-bound small-wave regime); ``False`` reproduces the old
    single-dispatcher loop for A/B."""
    from sic_tpu.retrieval import VectorIndex

    rng = np.random.default_rng(0)
    db = rng.normal(size=(n, dim)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = VectorIndex(dim)
    index.add_batch(db, [f"doc_{i}" for i in range(n)])

    def fresh_queries(seed):
        r = np.random.default_rng(seed)
        q = db[r.integers(0, n, size=batch)] + \
            r.normal(scale=1e-3, size=(batch, dim)).astype(np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    qs = [fresh_queries(100 + i) for i in range(iters)]
    s, i0 = index.search(qs[0][:8], k=k)      # warm / compile
    np.asarray(s), np.asarray(i0)
    s, i0 = index.search(qs[0], k=k)          # warm the full batch shape
    np.asarray(s), np.asarray(i0)

    t0 = time.perf_counter()
    if pipelined:
        outs = index.search_many(qs, k=k, depth=depth)
        for s, ids in outs:                    # already materialized
            assert s.shape == (batch, k)
    else:
        outs = [index.search_device(q, k=k) for q in qs]
        for s, ids in outs:                    # full materialization fence
            np.asarray(s), np.asarray(ids)
    dt = time.perf_counter() - t0
    qps = iters * batch / dt

    # correctness spot check: self-query ranks itself first
    _s1, i1 = index.search(db[123], k=3)
    assert i1[0, 0] == 123, i1
    return qps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    qps = measure(args.n, args.dim, args.batch, args.k, args.iters)
    print(json.dumps({
        "metric": f"search_qps_top{args.k}_{args.n}vecs",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 5000.0, 2),  # north-star >=5k QPS
    }))


if __name__ == "__main__":
    main()
