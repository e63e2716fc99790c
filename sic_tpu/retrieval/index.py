"""Flat inner-product vector index: on-device matmul + top_k, FAISS files.

Replaces the reference's faiss-cpu dependency (reference: src/compress.py:
89-114, src/build.py:71-103, src/search.py:65-120).  Search is a single
(B, D) x (D, N) matmul + ``lax.top_k`` under jit — MXU-shaped, embeddings
resident in HBM.

On-disk formats (both written, both readable, as the reference does —
build.py:95-100):
- new:    ``faiss.index`` + ``paths.json`` + ``meta.json``
- legacy: ``index.faiss`` + ``ids.txt``
The ``.faiss``/``.index`` payload is the real FAISS ``IndexFlatIP``
serialization (fourcc ``IxFI``; verified byte-compatible against the golden
``IO/faiss/index.faiss``), so artifacts interoperate with faiss.
"""
from __future__ import annotations

import functools
import json
import struct
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FOURCC_IP = b"IxFI"
_FOURCC_L2 = b"IxF2"
_DUMMY = 1 << 20


def write_flat_index(path, vectors: np.ndarray, metric: str = "ip") -> None:
    """Serialize (N, D) f32 as a FAISS IndexFlat file."""
    v = np.ascontiguousarray(vectors, np.float32)
    n, d = v.shape
    with open(path, "wb") as f:
        f.write(_FOURCC_IP if metric == "ip" else _FOURCC_L2)
        f.write(struct.pack("<i", d))
        f.write(struct.pack("<q", n))
        f.write(struct.pack("<qq", _DUMMY, _DUMMY))
        f.write(struct.pack("<B", 1))                      # is_trained
        f.write(struct.pack("<i", 0 if metric == "ip" else 1))
        f.write(struct.pack("<Q", n * d))                  # float count
        f.write(v.tobytes())


def read_flat_index(path) -> Tuple[np.ndarray, str]:
    """Parse a FAISS IndexFlat file -> ((N, D) f32, metric)."""
    data = Path(path).read_bytes()
    fourcc = data[:4]
    if fourcc not in (_FOURCC_IP, _FOURCC_L2):
        raise ValueError(f"unsupported faiss index type {fourcc!r}")
    off = 4
    (d,) = struct.unpack_from("<i", data, off); off += 4
    (n,) = struct.unpack_from("<q", data, off); off += 8
    off += 16                                              # dummies
    off += 1                                               # is_trained
    (metric_i,) = struct.unpack_from("<i", data, off); off += 4
    (count,) = struct.unpack_from("<Q", data, off); off += 8
    if count == n * d:            # old layout: vector<float>
        v = np.frombuffer(data, np.float32, count=n * d, offset=off)
    elif count == n * d * 4:      # new layout: vector<uint8> codes
        v = np.frombuffer(data, np.uint8, count=count, offset=off).view(np.float32)
    else:
        raise ValueError(f"flat index size mismatch: {count} vs n*d={n*d}")
    return v.reshape(n, d).copy(), ("ip" if metric_i == 0 else "l2")


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_ip(db, q, k: int):
    # bf16 operands on the MXU with f32 accumulation: ~4x the f32 matmul
    # rate; unit-vector scores keep ranking-grade precision
    scores = jnp.dot(q.astype(jnp.bfloat16), db.T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)   # (B, N)
    return jax.lax.top_k(scores, k)


class VectorIndex:
    """Incremental flat-IP index with doc-id list (FaissDB counterpart)."""

    def __init__(self, dim: int, vectors: Optional[np.ndarray] = None,
                 ids: Optional[List[str]] = None):
        self.dim = dim
        self._vecs: List[np.ndarray] = (
            [np.ascontiguousarray(vectors, np.float32)]
            if vectors is not None and len(vectors) else [])
        self.ids: List[str] = list(ids or [])
        self._device_db = None

    # -- building -----------------------------------------------------------
    def add(self, vec: np.ndarray, doc_id: str) -> None:
        v = np.asarray(vec, np.float32).reshape(1, -1)
        v = v / (np.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
        self._vecs.append(v)
        self.ids.append(doc_id)
        self._device_db = None

    def add_batch(self, vecs: np.ndarray, doc_ids: Sequence[str]) -> None:
        v = np.asarray(vecs, np.float32)
        v = v / (np.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
        self._vecs.append(v)
        self.ids.extend(doc_ids)
        self._device_db = None

    @property
    def ntotal(self) -> int:
        return len(self.ids)

    def vectors(self) -> np.ndarray:
        if not self._vecs:
            return np.zeros((0, self.dim), np.float32)
        if len(self._vecs) > 1:
            self._vecs = [np.concatenate(self._vecs, axis=0)]
        return self._vecs[0]

    # -- search ---------------------------------------------------------------
    def search_device(self, query, k: int = 5):
        """Async variant: returns device arrays (scores, indices) without a
        host sync, so callers can pipeline request batches."""
        if self._device_db is None:
            self._device_db = jnp.asarray(self.vectors())
        q = jnp.asarray(query, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        return _topk_ip(self._device_db, q, min(k, self.ntotal))

    def search_many(self, queries, k: int = 5, depth: int = 4):
        """Pipelined multi-wave search: each wave's host->device upload +
        dispatch + result materialization runs on a small thread pool, so
        wave j+1's transfer overlaps wave j's matmul+top_k.  A single
        serial wave is RTT-bound on a tunneled device (measured 67 ms
        upload vs 14 ms compute per 256-query wave over 100k vectors,
        benchmarks/search_breakdown.py); bounded depth keeps the in-flight
        queue short (unbounded async enqueue degrades the tunnel).

        Returns ``[(scores, indices), ...]`` in wave order.
        """
        from concurrent.futures import ThreadPoolExecutor

        if self._device_db is None and self._vecs:
            self._device_db = jnp.asarray(self.vectors())   # once, serial
        with ThreadPoolExecutor(max_workers=depth,
                                thread_name_prefix="sic-search") as ex:
            futs = [ex.submit(self.search, q, k) for q in queries]
            return [f.result() for f in futs]

    def search(self, query: np.ndarray, k: int = 5
               ) -> Tuple[np.ndarray, np.ndarray]:
        """query (B, D) or (D,) -> (scores (B, k), indices (B, k));
        missing slots get index -1 (FAISS convention)."""
        q = np.asarray(query, np.float32)
        if q.ndim == 1:
            q = q[None]
        n = self.ntotal
        if n == 0:
            return (np.zeros((q.shape[0], k), np.float32),
                    -np.ones((q.shape[0], k), np.int64))
        kk = min(k, n)
        scores, idx = self.search_device(q, kk)
        scores = np.asarray(scores, np.float32)
        idx = np.asarray(idx, np.int64)
        if kk < k:
            pad_s = np.zeros((q.shape[0], k - kk), np.float32)
            pad_i = -np.ones((q.shape[0], k - kk), np.int64)
            scores = np.concatenate([scores, pad_s], axis=1)
            idx = np.concatenate([idx, pad_i], axis=1)
        return scores, idx

    # -- persistence ------------------------------------------------------------
    def persist(self, index_dir, meta: Optional[dict] = None) -> None:
        """Write BOTH layouts (reference: build.py:95-100)."""
        p = Path(index_dir)
        p.mkdir(parents=True, exist_ok=True)
        v = self.vectors()
        write_flat_index(p / "faiss.index", v)
        (p / "paths.json").write_text(json.dumps(self.ids, ensure_ascii=False))
        (p / "meta.json").write_text(json.dumps(
            meta or {"dim": self.dim, "metric": "ip",
                     "model_id": "ViT-B-32:laion2b_s34b_b79k"},
            ensure_ascii=False))
        write_flat_index(p / "index.faiss", v)
        (p / "ids.txt").write_text("".join(i + "\n" for i in self.ids),
                                   encoding="utf-8")

    @classmethod
    def load(cls, index_dir) -> Tuple["VectorIndex", dict]:
        """Load either layout, new preferred (reference: search.py:65-88)."""
        p = Path(index_dir)
        meta = {}
        if (p / "faiss.index").exists():
            v, _ = read_flat_index(p / "faiss.index")
            ids = json.loads((p / "paths.json").read_text()) \
                if (p / "paths.json").exists() else []
            if (p / "meta.json").exists():
                meta = json.loads((p / "meta.json").read_text())
        elif (p / "index.faiss").exists():
            v, _ = read_flat_index(p / "index.faiss")
            ids = [l.strip() for l in (p / "ids.txt").read_text().splitlines()
                   if l.strip()] if (p / "ids.txt").exists() else []
        else:
            raise FileNotFoundError(f"no index found in {index_dir}")
        idx = cls(v.shape[1] if v.size else int(meta.get("dim", 512)),
                  vectors=v, ids=ids)
        return idx, meta
