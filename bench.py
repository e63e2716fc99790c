"""Headline benchmark: 512-px encode+decode throughput per chip.

Runs the flagship codec (ViT-L hybrid + f16 VQGAN, bf16 compute) through the
FULL pipeline — jitted encode, real rANS bitstream write/read for both
streams, jitted generative decode — and reports images/sec plus:

- per-stage wall-clock breakdown (device encode, fetch, host rANS, decode)
- single-image encode/decode latency p50/p90 (what /compress and
  /decompress callers feel): on-device entropy decode (auto), u8 serving
  path, and the 4-round-trip host path
- measured host<->device round-trip time (the tunnel RTT that bounds the
  serial 4-step decode chain)
- MFU from the compiled executables' FLOP counts
- an on-TPU validation that the Pallas window-attention kernel matches the
  XLA reference path (fp32 + bf16, forward and backward)

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N, ...}

``vs_baseline`` is the ratio to the same pipeline on the host CPU (the
reference implementation is CPU/GPU torch and publishes no numbers —
BASELINE.md; the north-star target is >=10x the CPU baseline).
"""
from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA compile cache (same store as the CLIs/service): a bench
# run in a fresh container otherwise pays the multi-minute flagship
# compiles before the first timed region
from sic_tpu.cli._common import enable_compile_cache

enable_compile_cache()

# Same-pipeline host-CPU baseline, measured once with
#   JAX_PLATFORMS=cpu python bench.py --cpu-baseline
# on this container's CPU (see BASELINE.md north-star: >=10x CPU).
CPU_BASELINE_IMG_S = 0.0111

import os

SIZE = 512
# batch size: the 4 autoregressive decode syncs and the encode fetch are
# per-BATCH costs (tunnel RTT ~30 ms each); 32 amortizes them to <5 ms/img
# and puts the pipeline within ~10% of the pure device-compute ceiling
ITERS = int(os.environ.get("SIC_BENCH_BATCH", "32"))
LAT_REPS = 9
PEAK_FLOPS = {"tpu v5 lite": 197e12, "tpu v5e": 197e12}  # bf16 peak / chip


def build(stream_part: int = 4):
    from sic_tpu.config import flagship_spec
    from sic_tpu.models import CodecRuntime, init_codec

    spec = flagship_spec()
    _, params = init_codec(spec, jax.random.PRNGKey(0),
                           image_hw=(256, 256), dtype=jnp.bfloat16)
    return CodecRuntime(spec, params, dtype=jnp.bfloat16,
                        stream_part=stream_part), params


def measure_rtt(n: int = 10) -> float:
    """Median host<->device round trip for a tiny transfer (ms).  Each
    iteration computes something FRESH — the dev tunnel memoizes repeated
    identical computations, which would understate the real RTT."""
    x = jnp.zeros((4,), jnp.float32)
    jax.device_get(x + 1.0)                     # warm
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.device_get(x + float(i + 2))
        ts.append((time.perf_counter() - t0) * 1000.0)
    return statistics.median(ts)


def measure_link_bw(mb: float = 32.0, reps: int = 3) -> float:
    """Device->host bulk-fetch bandwidth (MB/s) over the tunnel.

    RTT alone misses congestion: the 2026-08-19 outage kept RTT near the
    healthy ~26-30 ms while bulk fetch throughput dropped ~25% (fetch
    stage 622 -> 762 ms, BENCH_LOCAL_r03 vs r03c), so the headline
    img/s moved with the LINK, not the code.  Each rep fetches a fresh
    device-computed buffer (the tunnel memoizes identical transfers)."""
    n = int(mb * 1024 * 1024) // 4
    x = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(7), (n,), jnp.float32))
    np.asarray(x[:8])                           # warm the fetch path
    best = float("inf")
    for i in range(reps):
        y = jax.block_until_ready(x + float(i + 1))
        t0 = time.perf_counter()
        np.asarray(y)
        best = min(best, time.perf_counter() - t0)
    return mb / best


def kernel_check() -> dict:
    """Pallas window_attention vs the XLA reference path, on device.

    (VERDICT r1 weak #5: the kernel was only interpret-tested on CPU.)"""
    from sic_tpu.ops.window_attention import (_forward_reference,
                                              _pallas_forward,
                                              window_attention)
    if jax.devices()[0].platform != "tpu":
        return {"kernel_check": "skipped_not_tpu"}
    rng = jax.random.PRNGKey(2)
    kq, kk, kv, kb = jax.random.split(rng, 4)
    G, s, d, nW = 32, 256, 64, 2          # shipped window-16 geometry
    scale = d ** -0.5
    out = {}
    # TPU matmuls at default precision run bf16 passes for BOTH paths, so
    # pallas-vs-XLA differences sit at ~1e-4 even in f32; the check exists
    # to catch wiring/indexing bugs, which produce O(0.1+) errors.
    for dtype, tol in ((jnp.float32, 2e-3), (jnp.bfloat16, 3e-2)):
        q = jax.random.normal(kq, (G, s, d), dtype)
        k = jax.random.normal(kk, (G, s, d), dtype)
        v = jax.random.normal(kv, (G, s, d), dtype)
        bias = jax.random.normal(kb, (nW, s, s), jnp.float32)
        ref = _forward_reference(q, k, v, bias, scale).astype(jnp.float32)
        pal = jax.jit(lambda *a: _pallas_forward(*a, scale))(
            q, k, v, bias).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(pal - ref)))
        assert err < tol, f"pallas/{dtype.__name__} fwd err {err} >= {tol}"
        out[f"kernel_fwd_maxerr_{jnp.dtype(dtype).name}"] = round(err, 6)

    # fwd/bwd consistency: custom_vjp grads vs jax.grad of the pure XLA path
    q = jax.random.normal(kq, (G, s, d), jnp.float32)
    k = jax.random.normal(kk, (G, s, d), jnp.float32)
    v = jax.random.normal(kv, (G, s, d), jnp.float32)
    bias = jax.random.normal(kb, (nW, s, s), jnp.float32)

    def loss_pal(q, k, v, b):
        return jnp.sum(jnp.sin(window_attention(q, k, v, b, scale)))

    def loss_ref(q, k, v, b):
        return jnp.sum(jnp.sin(_forward_reference(q, k, v, b, scale)))

    g_pal = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    bwd_err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_pal, g_ref))
    assert bwd_err < 2e-2, f"pallas bwd err {bwd_err}"
    out["kernel_bwd_maxerr_f32"] = round(bwd_err, 6)

    # NHWC-native fused kernel (the deployed swin path) vs its einsum
    # reference, at the shipped geometry (window 16, head_dim 64)
    from sic_tpu.ops.window_attention import _nhwc_pallas, _nhwc_reference
    kqkv = jax.random.split(kb)[0]
    for dtype, tol, tag in ((jnp.float32, 2e-3, "f32"),
                            (jnp.bfloat16, 3e-2, "bf16")):
        qkv = jax.random.normal(kqkv, (2, 32, 32, 3 * 768), dtype)
        bias = jax.random.normal(kb, (4, 256, 256), jnp.float32)
        ref = _nhwc_reference(qkv, bias, 64 ** -0.5, 12).astype(jnp.float32)
        pal = jax.jit(lambda a, b: _nhwc_pallas(a, b, 64 ** -0.5, 12))(
            qkv, bias).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(pal - ref)))
        assert err < tol, f"nhwc/{tag} fwd err {err} >= {tol}"
        out[f"kernel_nhwc_maxerr_{tag}"] = round(err, 6)
    out["kernel_check"] = "pass"
    return out


def compiled_flops(rt, params, x01) -> float:
    """FLOPs of one encode+decode pass from the compiled executables."""
    def _flops(compiled) -> float:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    total = 0.0
    try:
        enc = rt._encode.lower(params, x01).compile()
        total += _flops(enc)
        z, h, _ = rt._encode(params, x01)
        packed, _ = rt.h_coder.compress_plan(h, q_idx=0)
        hhat = rt.h_coder.decompress(rt.h_coder.encode_packed(
            np.asarray(packed)), (x01.shape[0], SIZE // 32, SIZE // 32,
                                  rt.spec.quant_dim))
        dec = rt._decode.lower(params, z, hhat,
                               (SIZE // 256, SIZE // 256)).compile()
        total += _flops(dec)
    except Exception:
        return 0.0
    return total


def run(rt):
    from sic_tpu.utils.profiling import StageTimer

    def make_batch(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), ITERS)
        return jnp.concatenate(
            [jax.random.uniform(k, (1, SIZE, SIZE, 3),
                                minval=-1.0, maxval=1.0) for k in ks], axis=0)

    # Timing methodology for the axon dev tunnel: (a) block_until_ready
    # can return before completion, so every timed region ends with a
    # materializing fetch; (b) the tunnel memoizes/dedups repeated
    # identical computations pathologically (re-running an already-run
    # batch measures 20x SLOWER than fresh data), so every timed pipeline
    # gets its own fresh batch, like real traffic.
    def drain(x):
        np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x)

    import sys

    def note(msg):
        _beat()
        print(f"# bench: {msg}", file=sys.stderr, flush=True)

    note("warming batched encode")
    for enc in rt.encode_only_batched(make_batch(101)):
        pass
    note("warming concurrent decode")
    # full-size warm: the first full-width concurrent wave is what pays
    # the tunnel's buffer-growth cost; a small warm leaves the timed wave
    # ~20x slower
    rt.decode_only_many(rt.encode_only_batched(make_batch(102)), workers=4)
    note("warming batched decode")
    drain(rt.decode_only_batched(rt.encode_only_batched(make_batch(103))))
    note("warmups done")

    # The concurrent-per-image pipeline (encode_only_batched +
    # decode_only_many) is exercised by the warmup above but NOT timed:
    # its wall clock in this process context is dominated by a tunnel-side
    # pathology (the same code measures 12-26 img/s in standalone
    # processes), so publishing it would measure the link, not the codec.
    dt_many = float("inf")

    # pipeline B: batched encode + BATCHED decode (device-batched
    # autoregressive steps: 4 host syncs total for the whole batch)
    xb = make_batch(2)
    t0 = time.perf_counter()
    encs = rt.encode_only_batched(xb)
    xhat = rt.decode_only_batched(encs)
    drain(xhat)
    dt_batched = time.perf_counter() - t0

    # pipeline C: two batches in flight — batch k+1's encode overlaps
    # batch k's batched decode (RTTs of one stage hide behind the other)
    xb2 = [make_batch(3), make_batch(4)]
    t0 = time.perf_counter()
    outs2 = rt.round_trip_pipelined(xb2)
    drain(outs2[-1])
    dt_pipe = (time.perf_counter() - t0) / 2        # per batch of ITERS

    # per-stage breakdown of one batched pipeline pass (fresh batch)
    timer = StageTimer()
    encs_t = rt.encode_only_batched(make_batch(5), timer=timer)
    x = rt.decode_only_batched(encs_t, timer=timer)
    drain(x)

    h, w = SIZE, SIZE
    bits = len(encs[-1]["z_bit_stream"]) * 8 + len(encs[-1]["h_bit_stream"]) * 8
    stages = {f"stage_ms/{k}": round(v, 1) for k, v in timer.stages.items()}
    stages["throughput_batched_decode_img_s"] = round(ITERS / dt_batched, 3)
    # link-policy observability (round-4): which encode path the runtime's
    # bandwidth-keyed router chose, and the bandwidth it measured
    stages["encode_link_mb_s"] = (round(rt._link_bw / 1e6, 1)
                                  if rt._link_bw else None)
    stages["encode_path_counts"] = dict(rt.encode_path_counts)
    return ITERS / min(dt_many, dt_batched, dt_pipe), \
        {"total_bpp": bits / (h * w)}, stages, encs


def decode_latency(rt, encs, reps: int = LAT_REPS, output: str = "float"):
    """Single-request decode latency percentiles (ms), INCLUDING the
    result fetch — block_until_ready can return before completion over
    the axon tunnel, so only a materializing np.asarray measures what a
    caller actually waits for.  Rotates over distinct streams so the
    tunnel's identical-computation memoization can't serve cached
    results."""
    np.asarray(rt.decode_only(**encs[0], output=output))   # warm
    ts = []
    for i in range(reps):
        e = encs[1 + (i % (len(encs) - 1))] if len(encs) > 1 else encs[0]
        t0 = time.perf_counter()
        np.asarray(rt.decode_only(**e, output=output))
        ts.append((time.perf_counter() - t0) * 1000.0)
    ts.sort()
    return ts[len(ts) // 2], ts[int(len(ts) * 0.9)]


def encode_latency(rt, reps: int = LAT_REPS):
    """Single-request encode latency p50 (ms): what /compress callers feel.
    Rotates fresh inputs so the tunnel's identical-computation memoization
    can't serve cached results (same policy as decode_latency)."""
    xs = [jax.random.uniform(jax.random.PRNGKey(700 + i),
                             (1, SIZE, SIZE, 3), minval=-1.0, maxval=1.0)
          for i in range(reps + 1)]
    rt.encode_only(xs[0])             # warm (jit-cached from the batch=1 path)
    ts = []
    for i in range(reps):
        x = xs[1 + i]
        t0 = time.perf_counter()
        rt.encode_only(x)             # returns bytes: fully synchronous
        ts.append((time.perf_counter() - t0) * 1000.0)
    ts.sort()
    return ts[len(ts) // 2]


class _Watchdog:
    """Stall guard for unattended runs on a flaky tunnel: the reachability
    probe can succeed and the link die a minute later, leaving a jax call
    hung forever inside the runtime.  Each stage print beats the watchdog;
    if no beat lands for ``limit_s`` the run emits a self-describing error
    JSON and hard-exits (a hung C++ call cannot be unwound from Python).
    25 min is ~2.5x the longest observed healthy stage gap (cold-cache
    build + warmup)."""

    def __init__(self, limit_s: float = 1500.0):
        import threading
        self.limit_s = limit_s
        self._t = time.monotonic()
        threading.Thread(target=self._loop, daemon=True).start()

    def beat(self):
        self._t = time.monotonic()

    def _loop(self):
        while True:
            time.sleep(30)
            stalled = time.monotonic() - self._t
            if stalled > self.limit_s:
                print(json.dumps({
                    "metric": "512px_encode_decode_throughput",
                    "value": 0.0, "unit": "img/s", "vs_baseline": 0.0,
                    "error": f"stalled {int(stalled)} s inside a device "
                             "call (tunnel died mid-run) — see the last "
                             "committed BENCH_LOCAL_*.json for "
                             "healthy-link numbers"}), flush=True)
                os._exit(0)


_WATCHDOG = None


def _beat():
    if _WATCHDOG is not None:
        _WATCHDOG.beat()


def _device_reachable(timeout_s: float = 180.0) -> bool:
    """One tiny transfer on a watchdog thread.  The tunnel to the chip can
    go fully dead (observed 2026-08-19: transfers hang forever, not just
    slow) — without this check an unattended bench would hang past the
    driver's timeout and record NOTHING instead of a self-describing line."""
    import threading
    ok = []

    def probe():
        try:
            jax.device_get(jnp.zeros((4,), jnp.float32) + 1.0)
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    """Unattended-run safety: if the full pipeline dies (e.g. a Pallas
    kernel regression on the real chip), retry ONCE with every optional
    kernel disabled (einsum attention + host entropy coding) so the
    driver still records a data point; the JSON then carries
    ``fallback_mode`` so the regression is visible."""
    import sys
    global _WATCHDOG
    attempt0 = int(os.environ.get("SIC_BENCH_PROBE_ATTEMPT", "0"))
    if "--cpu-baseline" not in sys.argv and not _device_reachable(
            90.0 if attempt0 else 180.0):
        # The tunnel FLAPS (observed 2026-08-19: dead for a few minutes,
        # then healthy again) — don't give up on the first failed probe.
        # A wedged runtime connection cannot be recovered in-process, so
        # wait and re-exec a FRESH interpreter on the same argv, up to
        # ~6 attempts (~18 min worst case, still under driver timeouts).
        attempt = attempt0
        if attempt < 6:
            print(f"# bench: device unreachable (attempt {attempt + 1}/6),"
                  " waiting 60 s for tunnel recovery",
                  file=sys.stderr, flush=True)
            time.sleep(60)
            os.environ["SIC_BENCH_PROBE_ATTEMPT"] = str(attempt + 1)
            sys.stdout.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        print(json.dumps({
            "metric": "512px_encode_decode_throughput", "value": 0.0,
            "unit": "img/s", "vs_baseline": 0.0,
            "error": "device unreachable: a tiny host<->device transfer "
                     "did not complete across 7 probes over ~18 min "
                     "(tunnel down) — see the last committed "
                     "BENCH_LOCAL_*.json for healthy-link numbers and "
                     "provenance"}))
        sys.stdout.flush()
        # the probe thread is still blocked inside the runtime; normal
        # interpreter teardown aborts on it (observed SIGABRT, rc=134) —
        # the JSON is out, leave without running destructors
        os._exit(0)
    if "--cpu-baseline" not in sys.argv:
        _WATCHDOG = _Watchdog()
    try:
        _main(sys.argv)
    except Exception as e:
        if "--cpu-baseline" in sys.argv:
            raise
        print(f"# bench: FULL PATH FAILED ({type(e).__name__}: {e}); "
              "retrying with SIC_WINDOW_ATTN=xla + host entropy",
              file=sys.stderr, flush=True)
        os.environ["SIC_WINDOW_ATTN"] = "xla"
        os.environ["SIC_BENCH_FALLBACK"] = "1"
        _main(sys.argv)


def _main(argv):
    rt, params = build(stream_part=4)
    if os.environ.get("SIC_BENCH_FALLBACK"):
        rt.device_entropy = "host"
    img_s, bpp, stages, encs = run(rt)
    if "--cpu-baseline" in argv:
        print(f"# measured CPU baseline: {img_s:.4f} img/s")
        return

    result = {
        "metric": "512px_encode_decode_throughput",
        "value": round(img_s, 4),
        "unit": "img/s",
        "vs_baseline": round(img_s / CPU_BASELINE_IMG_S, 2),
    }
    result.update(stages)
    _beat()
    print("# bench: pipelines done", flush=True)
    result["rtt_ms"] = round(measure_rtt(), 2)
    if result["rtt_ms"] > 40.0:
        # the dev tunnel's healthy RTT is ~26-28 ms (BENCH_r02/r03 history);
        # when it is congested every RTT-bound number below inflates with
        # it — stamp that so a bad-tunnel run is self-describing
        result["rtt_note"] = (
            "tunnel congested (healthy ~26-28 ms): single-request "
            "latencies and QPS are RTT-bound and inflated accordingly")
    result["link_mb_s"] = round(measure_link_bw(), 1)
    if result["link_mb_s"] < 40.0:
        # healthy bulk fetch is ~50 MB/s over this tunnel; the 08-19
        # outage dropped it ~25% while RTT stayed normal, so bandwidth
        # needs its own stamp (fetch + host-rANS stages scale with it)
        result["link_note"] = (
            "bulk-fetch bandwidth degraded (healthy ~50 MB/s): the "
            "fetch and host-rANS stages, and so the headline img/s, "
            "are link-bound and deflated accordingly")
    result["total_bpp"] = round(bpp["total_bpp"], 5)

    # single-request decode latency.  With >= 4 substreams decode_only's
    # auto policy runs the ENTIRE entropy decode on device (Pallas rANS
    # kernel chained between the prior/recon executables — one round trip);
    # flipping the policy attribute re-times the 4-RTT host path on the
    # same compiled functions, and the two must agree exactly.
    # the "restore" policy after host-path measurements: the session
    # policy (fallback mode already downgraded it to host at build time)
    policy = rt.device_entropy
    p50, p90 = decode_latency(rt, encs)
    result["decode_p50_ms"] = round(p50, 1)
    result["decode_p90_ms"] = round(p90, 1)
    result["encode_p50_ms"] = round(encode_latency(rt), 1)
    # Device-encoder cross-check + its latency, for the record: the auto
    # policy encodes via the host coder (one fetch beats the kernel's
    # sequential walk at stream_part=4 — codec.py:encode_only), so the
    # on-device encoder is exercised EXPLICITLY here to keep it
    # byte-exact-validated on real hardware every run.
    x_enc_chk = jnp.asarray(jax.random.uniform(
        jax.random.PRNGKey(71), (1, SIZE, SIZE, 3), minval=-1.0, maxval=1.0))
    # the reference stream must come from the HOST coder no matter what
    # the session policy is — under policy == "device" both sides would
    # otherwise run the kernel and the cross-check would be vacuous
    rt.device_entropy = "host"
    enc_host = rt.encode_only(x_enc_chk)
    rt.device_entropy = policy
    if jax.devices()[0].platform != "tpu" or policy == "host":
        result["device_rans_encode_check"] = "skipped_device_path_off"
    else:
        rt.device_entropy = "device"
        enc_dev = rt.encode_only(x_enc_chk)
        result["encode_p50_ms_devpath"] = round(
            encode_latency(rt, reps=max(5, LAT_REPS // 2)), 1)
        # record (don't crash): a divergence must show up in the JSON
        if enc_dev["h_bit_stream"] == enc_host["h_bit_stream"]:
            result["device_rans_encode_check"] = "pass"
        else:
            result["device_rans_encode_check"] = "FAIL"
        rt.device_entropy = policy
    # serving path: u8 pixels converted on device (4x smaller fetch)
    p50_u8, _ = decode_latency(rt, encs[::-1], reps=max(5, LAT_REPS // 2),
                               output="u8")
    result["decode_p50_ms_u8"] = round(p50_u8, 1)
    x_auto = np.asarray(rt.decode_only(**encs[0]))
    rt.device_entropy = "host"
    p50_h, _ = decode_latency(rt, encs, reps=max(5, LAT_REPS // 2))
    result["decode_p50_ms_hostpath"] = round(p50_h, 1)
    x_host = np.asarray(rt.decode_only(**encs[0]))
    rt.device_entropy = policy

    # legacy single-substream streams (stream_part-1 encoders / reference
    # files): always take the 4-RTT host decode — keep that path visible.
    # The clone shares every compiled executable; only host framing differs.
    import copy as _copy
    rt1 = _copy.copy(rt)
    rt1.h_coder = rt.h_coder.clone_with_stream_part(1)
    enc1 = [{**e, "h_bit_stream": rt1.h_coder.encode_packed(np.asarray(
        rt.h_coder.compress_plan(rt._encode(rt.params, jnp.asarray(
            jax.random.uniform(jax.random.PRNGKey(50 + i),
                               (1, SIZE, SIZE, 3))))[1], q_idx=0)[0]))}
        for i, e in enumerate(encs[:4])]
    p50_1, _ = decode_latency(rt1, enc1, reps=max(5, LAT_REPS // 2))
    result["decode_p50_ms_part1_legacy"] = round(p50_1, 1)
    if jax.devices()[0].platform == "tpu":
        # off-TPU the auto policy resolves to the host path too, which
        # would make this comparison vacuous
        assert np.array_equal(x_auto, x_host), \
            "device-entropy decode diverged from host path"
        result["device_rans_check"] = "pass"
    else:
        result["device_rans_check"] = "skipped_not_tpu"

    _beat()
    print("# bench: latency done", flush=True)
    flops = compiled_flops(rt, rt.params, jnp.zeros((1, SIZE, SIZE, 3)))
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind.lower(), 197e12)
    if flops:
        result["flops_per_image"] = int(flops)
        result["mfu_pct"] = round(100.0 * flops * img_s / peak, 2)

    if os.environ.get("SIC_BENCH_FALLBACK") or \
            os.environ.get("SIC_WINDOW_ATTN") == "xla":
        # the fallback run exists because a kernel may be broken — calling
        # the kernels directly here would crash the one run that must
        # always produce a JSON line
        result["kernel_check"] = "skipped_fallback_mode"
    else:
        try:
            result.update(kernel_check())
        except Exception as e:  # record, don't crash (unattended runs)
            result["kernel_check"] = f"FAIL: {type(e).__name__}: {e}"[:300]
    _beat()
    print("# bench: measuring search QPS", file=sys.stderr, flush=True)
    try:
        from benchmarks.search_qps import measure as _search_qps
        # Serving wave of 1024 queries: each wave through the dev tunnel
        # pays ~67 ms of upload/RTT regardless of batch (measured,
        # benchmarks/search_breakdown.py), so QPS is wave-size-bound —
        # 256/wave caps at ~3.6k while the device compute is ~14 ms.
        # 1024 is a realistic accumulation window at these rates (~9k
        # QPS -> a wave fills in ~110 ms).  The b256 number is kept for
        # round-over-round comparability.
        result["search_qps_100k"] = round(_search_qps(batch=1024, iters=8), 1)
    except Exception as e:  # the headline metric must still print
        result["search_qps_100k"] = f"error: {type(e).__name__}"
    else:
        # secondary round-over-round comparability number: a failure here
        # must not clobber the headline value recorded above
        try:
            result["search_qps_100k_b256"] = round(_search_qps(), 1)
        except Exception as e:
            result["search_qps_100k_b256"] = f"error: {type(e).__name__}"
    # provenance of the pinned CPU baseline in vs_baseline
    result["cpu_baseline_img_s"] = CPU_BASELINE_IMG_S
    if os.environ.get("SIC_BENCH_FALLBACK"):
        result["fallback_mode"] = "xla_attention+host_entropy"
    result["cpu_baseline_provenance"] = (
        "JAX_PLATFORMS=cpu python bench.py --cpu-baseline, 2026-08-16, "
        "this container (1 vCPU), SIC_BENCH_BATCH=32 pipeline")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
