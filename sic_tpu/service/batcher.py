"""Cross-request dynamic micro-batching for the serving decode path.

The reference serves every ``/decompress`` by respawning ``decompress.py``
as a subprocess (reference: webapp.py:50-66) — one model load per request,
strictly serial.  sic_tpu's in-process service already amortizes the model;
this module additionally amortizes the *device work*: concurrent requests
whose streams share a decode geometry (the same bucket key the decompress
CLI batches on, cli/decompress.py:61-64) are grouped and run through
``CodecRuntime.decode_only_batched``, so the 4-sync autoregressive entropy
chain and the generative decoder execute ONCE per group instead of once per
request.

Policy
------
The first request landing in an empty bucket opens a ``window_ms``
collection window; the group dispatches at ``max_batch`` or at window
expiry, whichever comes first.  Under light load a request pays at most
``window_ms`` extra (~8 ms against a ~110 ms decode p50); under concurrent
load throughput approaches the batched-decode rate (BENCH: batch-32 decode
runs ~6x the request-at-a-time rate per image).

Groups are PADDED to the next power of two by repeating the last stream:
every distinct batch size is a separate XLA executable, so free-form group
sizes would compile-storm the first minutes of serving; padding bounds the
compiled set to {1, 2, 4, ..., max_batch} at a worst-case <2x wasted lanes.
The canonical coding-batch contract (models/bottleneck.py) makes the padded
replay bit-identical for the real lanes — grouping NEVER changes bytes, a
property the tests assert.
"""
from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = ["MicroBatcher"]


def _bucket_key(enc: Dict[str, Any], output: str) -> tuple:
    """Streams that may share one batched decode (mirrors the decompress
    CLI's grouping; decode_only_batched asserts the same invariants)."""
    return (tuple(enc["stack_shape"]),
            tuple(int(s) for s in enc["feat_shape"]),
            int(enc["token_length"]),
            enc.get("coding_batch"),
            output)


class MicroBatcher:
    """Groups concurrent ``decode(enc_result)`` calls into batched decodes.

    Thread-safe; one dispatcher thread (device work is serial anyway).
    ``batches_dispatched`` / ``requests_served`` expose grouping behavior
    for tests and ops dashboards.
    """

    def __init__(self, rt, window_ms: float = 8.0, max_batch: int = 16):
        assert max_batch >= 1
        self.rt = rt
        self.window_s = float(window_ms) / 1000.0
        self.max_batch = int(max_batch)
        self._cv = threading.Condition()
        # key -> (t_first_monotonic, [(enc, future), ...])
        self._buckets: Dict[tuple, Tuple[float, List[tuple]]] = {}
        self._closed = False
        self.batches_dispatched = 0
        self.requests_served = 0
        self._thread = threading.Thread(
            target=self._loop, name="sic-microbatcher", daemon=True)
        self._thread.start()

    # -- client API ------------------------------------------------------------
    def submit(self, enc: Dict[str, Any], output: str = "u8") -> Future:
        """Enqueue one stream; resolves to (H, W, 3) pixels."""
        fut: Future = Future()
        key = _bucket_key(enc, output)
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            if key not in self._buckets:
                self._buckets[key] = (time.monotonic(), [])
            self._buckets[key][1].append((dict(enc), fut))
            self._cv.notify_all()
        return fut

    def decode(self, enc: Dict[str, Any], output: str = "u8") -> np.ndarray:
        return self.submit(enc, output).result()

    def close(self):
        """Drain pending groups, then stop the dispatcher."""
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join()

    # -- dispatcher ------------------------------------------------------------
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
            self._dispatch(key, items)

    def _dispatch(self, key: tuple, items: List[tuple]):
        output = key[-1]
        encs = [e for e, _ in items]
        try:
            if len(encs) == 1:
                out = np.asarray(self.rt.decode_only(**encs[0], output=output))
            else:
                # pad to the next power of two: bounds the compiled-executable
                # set; the coding-batch contract keeps real lanes bit-identical
                n = len(encs)
                width = 1
                while width < n:
                    width *= 2
                padded = encs + [encs[-1]] * (width - n)
                out = np.asarray(
                    self.rt.decode_only_batched(padded, output=output))
            with self._cv:
                self.batches_dispatched += 1
                self.requests_served += len(items)
            for i, (_e, fut) in enumerate(items):
                fut.set_result(out[i])
        except Exception as exc:  # propagate to every waiter in the group
            for _e, fut in items:
                if not fut.done():
                    fut.set_exception(exc)
