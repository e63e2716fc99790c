"""Shared CLI plumbing: model/config/clip loading, determinism, progress."""
from __future__ import annotations


import sys
import time

from typing import Optional

import numpy as np


def init_func(seed: int = 0):
    """Determinism hook (reference: src/compress.py:314-319)."""
    np.random.seed(seed)


def respect_platform_env():
    """Re-assert the caller's JAX_PLATFORMS choice via jax.config.

    Some environments (the axon dev harness here) install a sitecustomize
    that force-registers a remote PJRT backend and overrides the env
    selection — a subprocess launched with ``JAX_PLATFORMS=cpu`` would
    still dial the remote chip (and hang if the tunnel is down).  Only a
    ``jax.config.update`` AFTER import wins, so every production entry
    point calls this before first backend use."""
    import os

    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plat:
        return
    try:
        import jax
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def _host_isa_tag() -> str:
    """Short stable fingerprint of this host's CPU feature set (the
    /proc/cpuinfo flags line on Linux; platform fields elsewhere)."""
    import hashlib
    import platform as _pf

    txt = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    txt = line
                    break
    except OSError:
        pass
    txt = txt or f"{_pf.machine()}-{_pf.processor()}"
    return hashlib.sha256(txt.encode()).hexdigest()[:10]


def enable_compile_cache():
    """Persistent XLA compile cache for every production entry point: a
    service restart or repeat CLI run skips the multi-minute flagship
    compiles (the reference pays a full model load per request via its
    subprocess design — webapp.py:41-48; we pay zero after the first).
    ``SIC_XLA_CACHE`` overrides the location; ``0``/``off`` disables."""
    import os

    loc = os.environ.get("SIC_XLA_CACHE",
                         os.path.expanduser("~/.cache/sic_tpu/xla"))
    if loc.lower() in ("0", "off", ""):
        return
    try:
        import jax
        # Segregate per platform: mixed-machine caches are poison — a CPU
        # AOT entry compiled via a remote-compile service targets THAT
        # host's ISA and can SIGILL here (observed with entries carrying
        # +prefer-no-gather/+amx features this machine lacks).  The
        # platform string is read from config, NOT from an initialized
        # backend, so this never triggers a device connection.
        plat = (getattr(jax.config, "jax_platforms", None)
                or os.environ.get("JAX_PLATFORMS") or "default")
        plat = str(plat).split(",")[0].strip() or "default"
        if plat == "cpu":
            # CPU AOT entries bake the compiling host's ISA into the
            # code, so the key needs the EXECUTING host's ISA too — the
            # platform string alone still mixes remote-compiled and
            # local entries
            plat = f"cpu-{_host_isa_tag()}"
        loc = os.path.join(loc, plat)
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never block startup on it


def progress(iterable, total=None, desc=""):
    total = total if total is not None else (
        len(iterable) if hasattr(iterable, "__len__") else None)
    t0 = time.time()
    for i, item in enumerate(iterable):
        yield item
        if total and (i + 1) % max(1, total // 20) == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f"[{desc}] {i + 1}/{total} ({rate:.2f}/s)", file=sys.stderr,
                  flush=True)


def load_spec_and_cfg(base_config: Optional[str]):
    """Config YAML path (reference layout) or None -> flagship preset."""
    from ..config import LoadedConfig, flagship_spec, load_config
    from ..train.steps import FeatLossCfg, ImgLossCfg
    if base_config:
        return load_config(base_config)
    return LoadedConfig(flagship_spec(), None, FeatLossCfg(), ImgLossCfg())


def load_runtime(base_config: Optional[str], ckpt_path: Optional[str],
                 dtype=None, stream_part: Optional[int] = None,
                 quant: Optional[str] = None):
    """Build a CodecRuntime from config + optional checkpoint.

    ``stream_part``: rANS substreams per stream (reference:
    py_rans.cpp:91-136).  Default 4 enables the on-device decode path and
    threaded host coding while staying reference-decodable (the flag byte
    carries the part count); SIC_STREAM_PART overrides.

    ``quant``: ``"int8"`` serves the frozen towers W8A8 on the MXU's int8
    path (see ops/quant.py); SIC_QUANT env overrides when unset.  Streams
    stay decodable across modes."""
    import os

    import jax
    import jax.numpy as jnp

    respect_platform_env()
    enable_compile_cache()

    from ..checkpoint import load_codec_params
    from ..models import CodecRuntime, init_codec

    cfg = load_spec_and_cfg(base_config)
    if dtype is None:
        # bf16 is native on TPU; on CPU it is emulated and ~4x slower
        dtype = None if jax.devices()[0].platform == "cpu" else jnp.bfloat16
    if stream_part is None:
        # 4 substreams: threaded host coding on encode, and >= 4 parts lets
        # decode_only take the on-device Pallas rANS path (one round trip
        # instead of 4).  Wire format stays reference-decodable (the flag
        # byte carries the part count; reference py_rans.cpp:91-136).
        stream_part = int(os.environ.get("SIC_STREAM_PART", "4"))
    if quant is None:
        quant = os.environ.get("SIC_QUANT", "none")
    if ckpt_path:
        params = load_codec_params(ckpt_path, cfg.spec, dtype=dtype)
    else:
        print("[WARN] no --ckpt_path given; running with random weights",
              file=sys.stderr)
        _, params = init_codec(cfg.spec, jax.random.PRNGKey(0), dtype=dtype)
    return CodecRuntime(cfg.spec, params, dtype=dtype,
                        stream_part=stream_part, quant=quant), cfg


def load_clip_codec(clip_ckpt: Optional[str] = None,
                    bpe_path: Optional[str] = None):
    from ..retrieval import ClipCodec, port_open_clip_weights
    params = port_open_clip_weights(clip_ckpt) if clip_ckpt else None
    if params is None:
        print("[WARN] no --clip_ckpt given; CLIP embeddings are "
              "non-calibrated (random weights)", file=sys.stderr)
    return ClipCodec(params=params, bpe_path=bpe_path)


def save_png(path, img_array):
    """(H, W, 3) in [-1, 1] floats (or ready uint8 pixels) -> PNG file."""
    from PIL import Image
    a = np.asarray(img_array)
    u8 = a if a.dtype == np.uint8 else \
        np.clip((a + 1.0) * 127.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(path)
