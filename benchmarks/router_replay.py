"""Replay the round-4 degraded-link encode trace through the router.

Round-4's headline bench (BENCH_r04.json, link_note: ~14 MB/s tunnel)
recorded the failure this harness pins: 7/7 batches routed host while the
realized packed-plane fetch ran ~1158 ms/batch — ~3x the router's
prediction — leaving `fetch` the top wall-clock stage.  VERDICT r4 item 3
asks for a replayed harness where the policy flips to device under a
<12 MB/s link.

The replay drives `EncodeRouter` (models/codec.py) with the round-4
batch geometry and a link trace reconstructed from the bench's stage
timings: a healthy warmup (the link degraded mid-run), then the measured
degraded fetches.  Two policies are compared:

- v1 (round 4): symmetric bandwidth EMA, no exploration — reimplemented
  here from BENCH_r04's shipped math for the A/B;
- v2 (shipped): realized sec/byte cost, asymmetric adaptation,
  minority-path exploration.

Output: one JSON (`ROUTER_REPLAY_r05.json`) with per-batch decisions and
the headline comparison: batches until the flip, and total encode time
under each policy (device-path cost modeled from the r3 kernel ablation
priors the router itself uses).

    python benchmarks/router_replay.py [--out ROUTER_REPLAY_r05.json]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sic_tpu.models.codec import EncodeRouter

# round-4 batch geometry (BENCH_r04.json: batch 48 at 256 px, small_spec):
# packed planes 2.1 MB over 4 coding chunks; realized degraded fetch
# 1.158 s/batch; realized device-path kernel ~0.09 s/chunk with ~8x
# stream shrink (RANS_ABLATION_r03b.json)
PACKED = 2_100_000
CHUNKS = 4
KERNEL_S = 0.09
SHRINK = 8.0
HEALTHY_S = PACKED / 40e6          # 52 ms at the healthy 40 MB/s
DEGRADED_S = 1.158                 # measured realized fetch, round 4


class RouterV1:
    """Round-4 shipped policy: symmetric 0.5/0.5 bandwidth EMA, kernel
    EMA updated only on the device path, no exploration."""

    def __init__(self):
        self.bw = None
        self.kernel_s = KERNEL_S
        self.shrink = SHRINK

    def note_fetch(self, nbytes, secs):
        if nbytes < (1 << 18) or secs <= 0:
            return
        bw = nbytes / secs
        self.bw = bw if self.bw is None else 0.5 * self.bw + 0.5 * bw

    def decide(self, packed_bytes, n_chunks):
        if self.bw is None:
            return False
        t_host = packed_bytes / self.bw
        t_dev = n_chunks * self.kernel_s + packed_bytes / self.shrink / self.bw
        return t_dev < t_host


def replay(policy, fetches, n_batches):
    """Run ``n_batches`` encodes against the realized per-batch host
    fetch times ``fetches``; returns decisions + modeled wall time."""
    decisions, wall = [], 0.0
    for i in range(n_batches):
        dev = policy.decide(PACKED, CHUNKS)
        realized_host = fetches[min(i, len(fetches) - 1)]
        if dev:
            # device path: kernel walk + shrunken stream over the same link
            stream_s = realized_host / SHRINK
            wall += CHUNKS * KERNEL_S + stream_s
            if isinstance(policy, EncodeRouter):
                policy.note_device_encode(CHUNKS * KERNEL_S + stream_s,
                                          PACKED // int(SHRINK), PACKED,
                                          CHUNKS)
        else:
            wall += realized_host
            policy.note_fetch(PACKED, realized_host)
        decisions.append("device" if dev else "host")
    return decisions, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="ROUTER_REPLAY_r05.json")
    ap.add_argument("--warmup", type=int, default=3,
                    help="healthy batches before the link degrades")
    ap.add_argument("--batches", type=int, default=10,
                    help="degraded batches (round 4 saw 7)")
    args = ap.parse_args()

    fetches = [HEALTHY_S] * args.warmup + [DEGRADED_S] * args.batches
    n = len(fetches)

    v1_dec, v1_wall = replay(RouterV1(), fetches, n)
    v2_dec, v2_wall = replay(EncodeRouter(), fetches, n)

    def first_flip(dec):
        d = dec[args.warmup:]
        return d.index("device") + 1 if "device" in d else None

    result = {
        "metric": "router_replay_r4_degradation",
        "geometry": {"packed_bytes": PACKED, "chunks": CHUNKS,
                     "kernel_s_per_chunk": KERNEL_S, "shrink": SHRINK},
        "trace": {"healthy_s": round(HEALTHY_S, 4),
                  "degraded_s": DEGRADED_S, "warmup": args.warmup,
                  "degraded_batches": args.batches},
        "v1": {"decisions": v1_dec, "wall_s": round(v1_wall, 3),
               "flip_after_degraded_batches": first_flip(v1_dec)},
        "v2": {"decisions": v2_dec, "wall_s": round(v2_wall, 3),
               "flip_after_degraded_batches": first_flip(v2_dec)},
        "speedup_v2_over_v1": round(v1_wall / v2_wall, 3),
        "fetch_top_stage_v2": v2_dec[args.warmup + 2:].count("host")
        > v2_dec[args.warmup + 2:].count("device"),
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
