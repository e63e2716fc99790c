"""Secondary benchmark: top-k semantic search QPS over 100k embeddings.

North-star target (BASELINE.md): >=5k QPS top-k over 100k CLIP vectors,
FAISS-flat parity.  The index is one HBM-resident matrix; a query batch is
one (B, D) x (D, N) matmul + ``lax.top_k`` under jit.

    python benchmarks/search_qps.py [--n 100000] [--batch 256] [--k 10]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from sic_tpu.retrieval import VectorIndex

    rng = np.random.default_rng(0)
    db = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = VectorIndex(args.dim)
    index.add_batch(db, [f"doc_{i}" for i in range(args.n)])

    q = db[rng.integers(0, args.n, size=args.batch)].copy()
    scores, ids = index.search(q, k=args.k)           # warm / compile
    assert np.all(ids[:, 0] == ids[:, 0])             # touch result

    # throughput with requests in flight (each iter is an independent
    # query batch; results synced at the end)
    t0 = time.perf_counter()
    outs = [index.search_device(q, k=args.k) for _ in range(args.iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    qps = args.iters * args.batch / dt

    # correctness spot check: self-query ranks itself first
    s1, i1 = index.search(db[123], k=3)
    assert i1[0, 0] == 123, i1

    print(json.dumps({
        "metric": f"search_qps_top{args.k}_{args.n}vecs",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 5000.0, 2),  # north-star >=5k QPS
    }))


if __name__ == "__main__":
    main()
