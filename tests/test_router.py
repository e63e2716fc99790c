"""EncodeRouter: the link-adaptive encode-path policy, closed loop.

Round-4 postmortem (BENCH_r04.json): under a degraded ~14 MB/s tunnel the
router chose the host path 7/7 times while the realized packed-plane fetch
ran 1158 ms/batch — ~3x its prediction — because (a) the bandwidth EMA
lagged the degradation and (b) the device-path kernel EMA could never be
corrected once the router stopped visiting the device path.  These tests
pin the three fixes: realized-cost routing, asymmetric adaptation, and
minority-path exploration.  (reference has no counterpart — its encode
path is host-only, compress.py:248-289; this policy exists because the
TPU build has two viable encode paths.)
"""
import pytest

from sic_tpu.models.codec import EncodeRouter

# the round-4 batch geometry: 2.1 MB packed planes, 4 coding chunks
PACKED = 2_100_000
CHUNKS = 4
MB = 1e6


def feed_host_fetch(r: EncodeRouter, bw_mb_s: float, nbytes: int = PACKED):
    r.note_fetch(nbytes, nbytes / (bw_mb_s * MB))


def test_cold_start_routes_host_to_measure():
    r = EncodeRouter()
    assert r.decide(PACKED, CHUNKS) is False


def test_healthy_link_routes_host():
    # at 40 MB/s the one-shot packed fetch (~52 ms) beats the kernel's
    # ~0.36 s serial walk — the round-3 measured asymmetry
    r = EncodeRouter(explore_every=0)
    feed_host_fetch(r, 40.0)
    assert r.decide(PACKED, CHUNKS) is False


def test_degraded_link_flips_to_device_within_one_batch():
    """The round-4 failure, replayed: healthy history, then ONE realized
    fetch at the degraded rate must flip the route (the old bandwidth
    EMA needed many batches and never got them)."""
    r = EncodeRouter(explore_every=0)
    for _ in range(5):
        feed_host_fetch(r, 40.0)          # healthy history
    assert r.decide(PACKED, CHUNKS) is False
    feed_host_fetch(r, 1.8)               # realized r4 fetch: 2.1MB/1.16s
    assert r.decide(PACKED, CHUNKS) is True, (
        r.host_spb, r.dev_chunk_s, r.dev_shrink)


def test_recovery_is_gradual_not_optimistic():
    # a single good fetch after degradation must NOT immediately flip
    # the estimate back (weight 0.3 down vs 0.7 up)
    r = EncodeRouter(explore_every=0)
    feed_host_fetch(r, 1.8)
    degraded = r.host_spb
    feed_host_fetch(r, 40.0)
    assert r.host_spb > 0.6 * degraded


def test_exploration_visits_minority_path():
    r = EncodeRouter(explore_every=4)
    feed_host_fetch(r, 40.0)              # host wins on the merits
    picks = [r.decide(PACKED, CHUNKS) for _ in range(8)]
    assert picks.count(True) == 2         # every 4th decision explores
    assert picks.count(False) == 6


def test_exploration_corrects_pessimistic_kernel_prior():
    """Self-sealing EMA regression: a badly pessimistic kernel prior must
    be correctable because exploration still visits the device path."""
    r = EncodeRouter(dev_chunk_s=0.5, explore_every=4)
    feed_host_fetch(r, 1.8)               # degraded link...
    # ...but the pessimistic prior still predicts device slower:
    assert r.decide(PACKED, CHUNKS) is False
    # exploration forces a device batch; realized kernel is fast
    r.note_device_encode(dev_s=0.40, stream_bytes=PACKED // 8,
                         packed_bytes=PACKED, n_chunks=CHUNKS)
    assert r.dev_chunk_s < 0.35
    # one more correction and the router flips on the merits
    r.note_device_encode(dev_s=0.40, stream_bytes=PACKED // 8,
                         packed_bytes=PACKED, n_chunks=CHUNKS)
    rr = EncodeRouter(dev_chunk_s=r.dev_chunk_s, explore_every=0)
    rr.host_spb = r.host_spb
    assert rr.decide(PACKED, CHUNKS) is True


def test_shrink_ratio_tracks_realized_streams():
    r = EncodeRouter()
    r.note_device_encode(dev_s=0.4, stream_bytes=PACKED // 4,
                         packed_bytes=PACKED, n_chunks=CHUNKS)
    assert 4.0 < r.dev_shrink < 8.0
