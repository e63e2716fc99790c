#!/bin/bash
# Round-3 TPU validation sequence. Run from the repo root when the chip
# is reachable; each stage writes its artifact so a partial run still
# leaves data. Usage: bash benchmarks/tpu_runbook.sh [outdir]
set -u
OUT="${1:-.}"
cd "$(dirname "$0")/.."

echo "=== 1/4 kernel sanity (NHWC fwd + encoder byte-exactness) ===" >&2
timeout 1200 python - <<'EOF' 2>&1 | tail -20
import jax, numpy as np, jax.numpy as jnp
print("devices:", jax.devices())
from sic_tpu.ops.window_attention import _nhwc_pallas, _nhwc_reference
qkv = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3 * 768), jnp.bfloat16)
bias = jax.random.normal(jax.random.PRNGKey(1), (4, 256, 256), jnp.float32)
ref = _nhwc_reference(qkv, bias, 64 ** -0.5, 12).astype(jnp.float32)
pal = jax.jit(lambda a, b: _nhwc_pallas(a, b, 64 ** -0.5, 12))(qkv, bias).astype(jnp.float32)
err = float(jnp.max(jnp.abs(np.asarray(pal) - np.asarray(ref))))
print("NHWC fwd bf16 maxerr:", err, "OK" if err < 3e-2 else "FAIL")

from sic_tpu.ops.window_attention import _nhwc_bwd_pallas
g = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 768), jnp.bfloat16)
dq, db = _nhwc_bwd_pallas(qkv, bias, g, 64 ** -0.5, 12)
_, vjp = jax.vjp(lambda a, b: _nhwc_reference(a, b, 64 ** -0.5, 12), qkv, bias)
dq_r, db_r = vjp(g)
e1 = float(jnp.max(jnp.abs(np.asarray(dq).astype(np.float32) - np.asarray(dq_r).astype(np.float32))))
e2 = float(jnp.max(jnp.abs(np.asarray(db) - np.asarray(db_r))))
print("NHWC bwd maxerr dqkv:", e1, "dbias:", e2,
      "OK" if max(e1, e2) < 0.3 else "FAIL")

# device rANS encoder byte-exactness at a real-ish geometry
from sic_tpu.entropy import EntropyCoder, build_gaussian_tables
from sic_tpu.ops.rans_decode import split_substreams
from sic_tpu.ops.rans_encode import (encode_buffer_words, finalize_streams,
                                     rans_encode_plane, split_plane_rows)
t = build_gaussian_tables("gaussian")
rng = np.random.default_rng(5)
n, parts = 4096, 4
planes = []
for _ in range(4):
    idx = rng.integers(0, 64, size=n).astype(np.int16)
    idx[rng.random(n) < 0.3] = -1
    sym = rng.integers(-6, 7, size=n).astype(np.int16)
    esc = rng.random(n) < 0.05
    sym[esc] = rng.integers(-4000, 4000, size=int(esc.sum())).astype(np.int16)
    planes.append((sym, idx))
coder = EntropyCoder(parts)
gi = coder.add_cdf(t.quantized_cdf, t.cdf_length, t.offset)
coder.reset()
for s, i in planes:
    coder.encode_with_indexes(s, i, gi)
coder.flush()
expect = split_substreams(coder.get_encoded_stream())
npos = n // parts
S = 8
nwords = encode_buffer_words(npos * 4, word_bucket=512)
words = jnp.zeros((S, nwords), jnp.uint32)
meta = jnp.zeros((S, 4), jnp.uint32).at[:, 0].set(1 << 23)
for s, i in reversed(planes):
    sr, ir = split_plane_rows(s.reshape(1, -1).astype(np.int32),
                              i.reshape(1, -1).astype(np.int32), parts)
    sp = np.zeros((S, npos), np.int32); ip = np.full((S, npos), -1, np.int32)
    sp[:parts] = np.asarray(sr); ip[:parts] = np.asarray(ir)
    words, meta = rans_encode_plane(jnp.asarray(sp), jnp.asarray(ip), words,
                                    meta, jnp.asarray(t.quantized_cdf),
                                    jnp.asarray(t.cdf_length),
                                    jnp.asarray(t.offset))
got = finalize_streams(np.asarray(words), np.asarray(meta), parts)
ok = got is not None and all(a == b for a, b in zip(got, expect))
print("device rANS ENCODE byte-exact on TPU:", "OK" if ok else "FAIL")
EOF

echo "=== 2/4 marginal window-attention cost ===" >&2
timeout 1800 python benchmarks/kernel_marginal.py --out "$OUT/KERNEL_MARGINAL_r03.json" 2>&1 | tail -25

echo "=== 3/4 full bench ===" >&2
timeout 3600 python bench.py 2>&1 | tail -30

echo "=== 4/4 per-stage profile refresh ===" >&2
timeout 1800 python benchmarks/profile_stages.py --batch 32 --out "$OUT/PROFILE_r03b.json" 2>&1 | tail -20
echo "runbook done" >&2
