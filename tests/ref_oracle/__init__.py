"""Binary interop oracle: the reference rANS compiled from source.

Builds ``/root/reference/src/cpp/rans/rans.cpp`` + ``shim.cc`` out-of-tree
into a test-only shared object (the prebuilt ``MLCodec_rans`` pybind .so is
broken under this container's numpy 2).  ``RefRans`` adds the py_rans
substream framing in Python, byte-identical to the reference layout
(reference: src/cpp/py_rans/py_rans.cpp:91-136 encode, 150-181 decode):

    flag byte  = ((numStreams - 1) << 4) | (perStreamHeader == 2 ? 1 : 0)
    headers    = (numStreams - 1) x u16/u32 little-endian substream sizes
    payload    = concatenated substreams (last one's size is implicit)

so the tests can cross-decode full framed streams in both directions.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import struct
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

REF_RANS_DIR = Path("/root/reference/src/cpp/rans")
_SHIM = Path(__file__).parent / "shim.cc"
_BUILD_DIR = Path(__file__).parent / "_build"
_lock = threading.Lock()
_cached = None


def reference_sources_present() -> bool:
    return (REF_RANS_DIR / "rans.cpp").exists()


def _lib_path() -> Path:
    h = hashlib.sha256()
    for p in (_SHIM, REF_RANS_DIR / "rans.cpp", REF_RANS_DIR / "rans.h",
              REF_RANS_DIR / "rans_byte.h"):
        h.update(p.read_bytes())
    return _BUILD_DIR / f"libref_rans_{h.hexdigest()[:16]}.so"


def load_oracle() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the reference-coder oracle, or None."""
    global _cached
    if _cached is not None:
        return _cached
    if not reference_sources_present():
        return None
    with _lock:
        if _cached is not None:
            return _cached
        out = _lib_path()
        if not out.exists():
            _BUILD_DIR.mkdir(parents=True, exist_ok=True)
            cxx = os.environ.get("CXX", "g++")
            tmp = out.with_suffix(".so.tmp")
            subprocess.run(
                [cxx, "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 f"-I{REF_RANS_DIR}", str(_SHIM),
                 str(REF_RANS_DIR / "rans.cpp"), "-o", str(tmp)],
                check=True, capture_output=True, text=True)
            tmp.replace(out)
        lib = ctypes.CDLL(str(out))
        c = ctypes
        i16p, i32p, u8p = (c.POINTER(c.c_int16), c.POINTER(c.c_int32),
                           c.POINTER(c.c_uint8))
        lib.ref_enc_new.restype = c.c_void_p
        lib.ref_enc_free.argtypes = [c.c_void_p]
        lib.ref_enc_add_cdf.restype = c.c_int
        lib.ref_enc_add_cdf.argtypes = [c.c_void_p, i32p, c.c_int, c.c_int,
                                        i32p, i32p]
        lib.ref_enc_encode.argtypes = [c.c_void_p, i16p, i16p, c.c_long, c.c_int]
        lib.ref_enc_reset.argtypes = [c.c_void_p]
        lib.ref_enc_flush_get.restype = c.c_long
        lib.ref_enc_flush_get.argtypes = [c.c_void_p, u8p, c.c_long]
        lib.ref_dec_new.restype = c.c_void_p
        lib.ref_dec_free.argtypes = [c.c_void_p]
        lib.ref_dec_add_cdf.restype = c.c_int
        lib.ref_dec_add_cdf.argtypes = [c.c_void_p, i32p, c.c_int, c.c_int,
                                        i32p, i32p]
        lib.ref_dec_set_stream.argtypes = [c.c_void_p, u8p, c.c_long]
        lib.ref_dec_decode.argtypes = [c.c_void_p, i16p, c.c_long, c.c_int, i16p]
        _cached = lib
        return lib


def _i16(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int16).reshape(-1))


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int32))


def _p(a: np.ndarray, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def split_sizes(n: int, parts: int) -> List[int]:
    """Symbol split across substreams (py_rans.cpp:32-36): floor split,
    remainder to the LAST substream."""
    each = n // parts
    return [each] * (parts - 1) + [n - each * (parts - 1)]


def frame_streams(substreams: List[bytes]) -> bytes:
    """Assemble the py_rans container (py_rans.cpp:91-136)."""
    n = len(substreams)
    maximum = max((len(s) for s in substreams[:-1]), default=0)
    hdr_fmt, hdr_size, flag_lo = ("<H", 2, 1) if maximum <= 65535 else ("<I", 4, 0)
    out = bytes([((n - 1) << 4) | flag_lo])
    for s in substreams[:-1]:
        out += struct.pack(hdr_fmt, len(s))
    return out + b"".join(substreams)


def parse_frame(stream: bytes) -> List[bytes]:
    """Split a framed stream back into substreams (py_rans.cpp:150-181)."""
    flag = stream[0]
    n = (flag >> 4) + 1
    hdr_fmt, hdr_size = ("<H", 2) if (flag & 0x0F) == 1 else ("<I", 4)
    off, sizes = 1, []
    for _ in range(n - 1):
        sizes.append(struct.unpack_from(hdr_fmt, stream, off)[0])
        off += hdr_size
    sizes.append(len(stream) - off - sum(sizes))
    subs = []
    for s in sizes:
        subs.append(stream[off:off + s])
        off += s
    return subs


class _RefLib:
    """One RansEncoderLib/RansDecoderLib pair behind the C shim."""

    def __init__(self, lib):
        self._lib = lib
        self._enc = lib.ref_enc_new()
        self._dec = lib.ref_dec_new()

    def __del__(self):
        if getattr(self, "_enc", None):
            self._lib.ref_enc_free(self._enc)
            self._lib.ref_dec_free(self._dec)
            self._enc = self._dec = None

    def add_cdf(self, cdfs, sizes, offsets) -> int:
        cdfs, sizes, offsets = _i32(cdfs), _i32(sizes).reshape(-1), _i32(offsets).reshape(-1)
        ncdf, width = cdfs.shape
        ei = self._lib.ref_enc_add_cdf(self._enc, _p(cdfs, ctypes.c_int32),
                                       ncdf, width, _p(sizes, ctypes.c_int32),
                                       _p(offsets, ctypes.c_int32))
        di = self._lib.ref_dec_add_cdf(self._dec, _p(cdfs, ctypes.c_int32),
                                       ncdf, width, _p(sizes, ctypes.c_int32),
                                       _p(offsets, ctypes.c_int32))
        assert ei == di
        return ei

    def encode(self, symbols, indexes, group: int) -> bytes:
        s, i = _i16(symbols), _i16(indexes)
        assert s.size == i.size
        self._lib.ref_enc_reset(self._enc)
        self._lib.ref_enc_encode(self._enc, _p(s, ctypes.c_int16),
                                 _p(i, ctypes.c_int16), s.size, group)
        # worst case is all-bypass coding: ~9 buffered RansSymbols/symbol,
        # each emitting up to 2 bytes — 16x leaves comfortable slack
        cap = max(64, 16 * s.size + 1024)
        buf = np.empty(cap, np.uint8)
        n = self._lib.ref_enc_flush_get(self._enc, _p(buf, ctypes.c_uint8), cap)
        assert n >= 0
        return buf[:n].tobytes()

    def decode(self, substream: bytes, indexes, group: int) -> np.ndarray:
        data = np.frombuffer(substream, np.uint8).copy()
        i = _i16(indexes)
        out = np.empty(i.size, np.int16)
        self._lib.ref_dec_set_stream(self._dec, _p(data, ctypes.c_uint8),
                                     data.size)
        self._lib.ref_dec_decode(self._dec, _p(i, ctypes.c_int16), i.size,
                                 group, _p(out, ctypes.c_int16))
        return out


class RefRans:
    """Framed multi-substream coder over the reference core — the Python
    twin of the reference ``MLCodec_rans.RansEncoder/RansDecoder``."""

    def __init__(self, stream_part: int = 1):
        lib = load_oracle()
        assert lib is not None, "reference sources unavailable"
        self._parts = [_RefLib(lib) for _ in range(stream_part)]

    def add_cdf(self, cdfs, sizes, offsets) -> int:
        idx = 0
        for p in self._parts:
            idx = p.add_cdf(cdfs, sizes, offsets)
        return idx

    def encode(self, symbols, indexes, group: int) -> bytes:
        s, i = _i16(symbols), _i16(indexes)
        subs = []
        off = 0
        for n, p in zip(split_sizes(s.size, len(self._parts)), self._parts):
            subs.append(p.encode(s[off:off + n], i[off:off + n], group))
            off += n
        return frame_streams(subs)

    def decode(self, stream: bytes, indexes, group: int) -> np.ndarray:
        i = _i16(indexes)
        subs = parse_frame(stream)
        assert len(subs) == len(self._parts)
        outs = []
        off = 0
        for n, sub, p in zip(split_sizes(i.size, len(self._parts)), subs,
                             self._parts):
            outs.append(p.decode(sub, i[off:off + n], group))
            off += n
        return np.concatenate(outs) if outs else np.empty(0, np.int16)
