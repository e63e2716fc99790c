"""Cross-request dynamic micro-batching for the serving paths.

The reference serves every ``/compress`` / ``/decompress`` by respawning a
CLI subprocess (reference: webapp.py:50-66) — one model load per request,
strictly serial.  sic_tpu's in-process service already amortizes the model;
this module additionally amortizes the *device work*: concurrent requests
whose streams share a geometry are grouped and run through the runtime's
batched entry points (``decode_only_batched`` / ``encode_only_batched``),
so the 4-sync autoregressive entropy chain (decode) or the single encode
pass + fetch execute ONCE per group instead of once per request.

Policy
------
The first request landing in an empty bucket opens a ``window_ms``
collection window; the group dispatches at ``max_batch`` or at window
expiry, whichever comes first.  Under light load a request pays at most
``window_ms`` extra (~8 ms against a ~110 ms decode p50); under concurrent
load throughput approaches the batched rate (BENCH: batch-32 decode runs
~6x the request-at-a-time rate per image).

Groups are PADDED to the next power of two by repeating the last payload:
every distinct batch size is a separate XLA executable, so free-form group
sizes would compile-storm the first minutes of serving; padding bounds the
compiled set to {1, 2, 4, ..., max_batch} at a worst-case <2x wasted lanes.
The canonical coding-batch contract (models/bottleneck.py) makes the padded
replay bit-identical for the real lanes — grouping NEVER changes bytes, a
property the tests assert for both directions.
"""
from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Tuple

import numpy as np

__all__ = ["MicroBatcher", "EncodeBatcher", "SearchBatcher"]


def _pow2_pad(items: list) -> list:
    n = len(items)
    width = 1
    while width < n:
        width *= 2
    return items + [items[-1]] * (width - n)


class _GroupQueue:
    """Generic window-grouping core: collects ``(key, payload)`` submissions
    into per-key groups and hands each group to ``dispatch(key, payloads)``
    (returning one result per payload) on a single worker thread."""

    def __init__(self, dispatch: Callable[[tuple, List[Any]], List[Any]],
                 window_ms: float, max_batch: int, name: str,
                 dispatch_workers: int = 1):
        """``dispatch_workers > 1`` hands groups to a bounded thread pool
        instead of running them inline on the collector thread, so group
        j+1's host->device upload overlaps group j's device compute
        (double-buffered waves — the RTT-bound small-wave fix for search;
        the codec batchers keep 1: their dispatches share stateful native
        coders)."""
        assert max_batch >= 1
        self._dispatch_fn = dispatch
        self.window_s = float(window_ms) / 1000.0
        self.max_batch = int(max_batch)
        self._cv = threading.Condition()
        # key -> (t_first_monotonic, [(payload, future), ...])
        self._buckets: Dict[tuple, Tuple[float, List[tuple]]] = {}
        self._closed = False
        self.batches_dispatched = 0
        self.requests_served = 0
        self._pool = None
        if dispatch_workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=dispatch_workers,
                                            thread_name_prefix=f"{name}-d")
        self._thread = threading.Thread(target=self._loop, name=name,
                                        daemon=True)
        self._thread.start()

    def submit(self, key: tuple, payload: Any) -> Future:
        fut: Future = Future()
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher is closed")
            if key not in self._buckets:
                self._buckets[key] = (time.monotonic(), [])
            self._buckets[key][1].append((payload, fut))
            self._cv.notify_all()
        return fut

    def close(self):
        """Drain pending groups, then stop the worker."""
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join()
        if self._pool is not None:
            self._pool.shutdown(wait=True)

    def _loop(self):
        while True:
            with self._cv:
                while not self._buckets and not self._closed:
                    self._cv.wait()
                if not self._buckets and self._closed:
                    return
                # earliest-opened bucket first (FIFO across geometries)
                key = min(self._buckets, key=lambda k: self._buckets[k][0])
                t0, items = self._buckets[key]
                deadline = t0 + self.window_s
                now = time.monotonic()
                if (len(items) < self.max_batch and now < deadline
                        and not self._closed):
                    self._cv.wait(deadline - now)
                    continue
                if len(items) > self.max_batch:
                    # overflow stays queued as a fresh (already-due) bucket
                    self._buckets[key] = (now - self.window_s,
                                          items[self.max_batch:])
                    items = items[:self.max_batch]
                else:
                    del self._buckets[key]
            if self._pool is not None:
                self._pool.submit(self._run_group, key, items)
            else:
                self._run_group(key, items)

    def _run_group(self, key: tuple, items: List[tuple]):
        try:
            outs = self._dispatch_fn(key, [p for p, _ in items])
            if len(outs) != len(items):
                # a silent mismatch would leave the unmatched futures
                # hanging forever on zip truncation — fail loudly instead
                raise RuntimeError(
                    f"dispatch returned {len(outs)} results for "
                    f"{len(items)} payloads")
            with self._cv:
                self.batches_dispatched += 1
                self.requests_served += len(items)
            for (_p, fut), out in zip(items, outs):
                fut.set_result(out)
        except Exception as exc:
            if len(items) == 1:
                if not items[0][1].done():
                    items[0][1].set_exception(exc)
                return
            # FAILURE ISOLATION: one malformed payload (e.g. a corrupt
            # .c2df upload whose header geometry matched the bucket) must
            # not 500 the innocent requests batched with it.  Retry each
            # lane alone; only the actual culprits fail.  Cost: one wasted
            # batched attempt + per-lane retries — paid only on failure.
            for p, fut in items:
                if fut.done():
                    continue
                try:
                    outs = self._dispatch_fn(key, [p])
                    if len(outs) != 1:
                        raise RuntimeError(
                            f"dispatch returned {len(outs)} results for 1 "
                            "payload")
                except Exception as lane_exc:
                    fut.set_exception(lane_exc)
                else:
                    with self._cv:
                        self.batches_dispatched += 1
                        self.requests_served += 1
                    fut.set_result(outs[0])


class MicroBatcher(_GroupQueue):
    """Groups concurrent ``decode(enc_result)`` calls into batched decodes.

    Thread-safe; one worker thread (device work is serial anyway).
    ``batches_dispatched`` / ``requests_served`` expose grouping behavior
    for tests and ops dashboards.
    """

    def __init__(self, rt, window_ms: float = 8.0, max_batch: int = 16):
        self.rt = rt
        super().__init__(self._decode_group, window_ms, max_batch,
                         name="sic-decode-batcher")

    @staticmethod
    def _bucket_key(enc: Dict[str, Any], output: str) -> tuple:
        """Streams that may share one batched decode (mirrors the decompress
        CLI's grouping; decode_only_batched asserts the same invariants)."""
        return (tuple(enc["stack_shape"]),
                tuple(int(s) for s in enc["feat_shape"]),
                int(enc["token_length"]),
                enc.get("coding_batch"),
                output)

    def _decode_group(self, key: tuple, encs: List[dict]) -> List[np.ndarray]:
        output = key[-1]
        if len(encs) == 1:
            out = np.asarray(self.rt.decode_only(**encs[0], output=output))
        else:
            out = np.asarray(self.rt.decode_only_batched(
                _pow2_pad(encs), output=output))
        return [out[i] for i in range(len(encs))]

    # -- client API ------------------------------------------------------------
    def submit_decode(self, enc: Dict[str, Any], output: str = "u8") -> Future:
        """Enqueue one stream; resolves to (H, W, 3) pixels."""
        return self.submit(self._bucket_key(enc, output), dict(enc))

    def decode(self, enc: Dict[str, Any], output: str = "u8") -> np.ndarray:
        return self.submit_decode(enc, output).result()


class EncodeBatcher(_GroupQueue):
    """Groups concurrent ``encode(x_padded)`` calls (one image each, already
    replicate-padded to the tile grid) into batched encodes bucketed by the
    padded shape — the serving twin of the compress CLI's shape buckets
    (cli/compress.py:117-123)."""

    def __init__(self, rt, window_ms: float = 8.0, max_batch: int = 16):
        self.rt = rt
        super().__init__(self._encode_group, window_ms, max_batch,
                         name="sic-encode-batcher")

    def _encode_group(self, key: tuple, xs: List[Any]) -> List[dict]:
        import jax.numpy as jnp
        if len(xs) == 1:
            return self.rt.encode_only_batched(xs[0])
        x = jnp.concatenate(_pow2_pad(list(xs)), axis=0)
        return self.rt.encode_only_batched(x)[:len(xs)]

    # -- client API ------------------------------------------------------------
    def encode(self, x_padded) -> dict:
        """x_padded: (1, H, W, 3) in [-1, 1], H/W multiples of the tile size;
        returns the enc_result dict for that image."""
        assert x_padded.ndim == 4 and x_padded.shape[0] == 1
        key = (int(x_padded.shape[1]), int(x_padded.shape[2]))
        return self.submit(key, x_padded).result()


class SearchBatcher(_GroupQueue):
    """Groups concurrent search queries against the same index into ONE
    scoring wave — a single (B, D) @ (N, D)^T matmul + one top-k instead of
    B single-row dispatches.  The search bench measured each wave through
    the dev tunnel at ~67 ms of upload/RTT against ~14 ms of device compute
    (benchmarks/search_breakdown.py), so serving QPS is wave-size-bound:
    batching concurrent requests is THE lever, which is why this defaults
    to a much larger ``max_batch`` than the codec batchers."""

    def __init__(self, window_ms: float = 4.0, max_batch: int = 256,
                 dispatch_workers: int = 2):
        super().__init__(self._search_group, window_ms, max_batch,
                         name="sic-search-batcher",
                         dispatch_workers=dispatch_workers)

    def _search_group(self, key: tuple, payloads: List[tuple]) -> List[tuple]:
        index = key[0]
        k = max(p[1] for p in payloads)
        qs = [np.asarray(p[0], np.float32).reshape(-1) for p in payloads]
        scores, ids = index.search(np.stack(_pow2_pad(qs)), k=k)
        return [(scores[i, :p[1]], ids[i, :p[1]])
                for i, p in enumerate(payloads)]

    # -- client API ------------------------------------------------------------
    def search(self, index, q, topk: int):
        """One query vector against ``index``; returns (scores, ids) rows
        shaped (topk,) exactly as ``VectorIndex.search``'s row slices.

        The bucket key is the index OBJECT (identity hash), not ``id()``:
        the service swaps the index when its files change, and CPython
        reuses freed addresses, so an ``id()`` key could silently merge
        queries against a dead index with queries against its replacement.
        Keying on the object pins it for the life of the bucket instead."""
        return self.submit((index,), (q, int(topk))).result()
