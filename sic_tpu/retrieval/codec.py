"""CLIP embedding codec: unit vector <-> u8+zstd searchable payload.

Byte-identical quantization to the reference
(reference: src/compress.py:76-86 encode; src/search.py:14-22 decode).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
import zstandard as zstd

from .clip_model import CLIPModel, CLIPSpec, SimpleTokenizer, preprocess_image


def l2n(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, eps)


def quantize_clip_u8(z_unit: np.ndarray) -> np.ndarray:
    return np.clip(np.round((z_unit * 0.5 + 0.5) * 255.0), 0, 255).astype(np.uint8)


def dequantize_clip_u8(q: np.ndarray) -> np.ndarray:
    z = (q.astype(np.float32) / 255.0) * 2.0 - 1.0
    return l2n(z.astype(np.float32))


class ClipCodec:
    """Image -> unit CLIP vector -> zstd-19 u8 payload (+meta)."""

    def __init__(self, params=None, spec: CLIPSpec = CLIPSpec(),
                 bpe_path: Optional[str] = None, rng=None, dtype=None):
        import jax.numpy as jnp
        self.spec = spec
        self.model = CLIPModel(spec, dtype)
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            dummy_img = jnp.zeros((1, spec.image_size, spec.image_size, 3))
            dummy_tok = jnp.zeros((1, spec.context_length), jnp.int32)
            params = self.model.init(rng, dummy_img, dummy_tok)
            self.calibrated = False
        else:
            self.calibrated = True
        self.params = params
        self.tokenizer = SimpleTokenizer(bpe_path, spec.context_length)
        self.zctx = zstd.ZstdCompressor(level=19)
        self._encode_image = jax.jit(
            lambda p, x: self.model.apply(p, x, method=CLIPModel.encode_image))
        self._encode_text = jax.jit(
            lambda p, t: self.model.apply(p, t, method=CLIPModel.encode_text))

    @property
    def model_id(self) -> str:
        return self.spec.model_id

    def image_to_unit_vec(self, img) -> np.ndarray:
        """PIL image or HWC array ([-1,1], [0,1] or u8) -> (D,) unit f32."""
        x = preprocess_image(img, self.spec.image_size)[None]
        z = self._encode_image(self.params, x)
        return np.asarray(z[0], np.float32)

    def images_to_unit_vecs(self, batch) -> np.ndarray:
        """(B, 224, 224, 3) pre-normalized array -> (B, D) unit f32."""
        return np.asarray(self._encode_image(self.params, batch), np.float32)

    def text_to_unit_vec(self, text) -> np.ndarray:
        toks = self.tokenizer(text)
        z = self._encode_text(self.params, toks)
        return np.asarray(z, np.float32)

    def quantize_u8_and_compress(self, z_unit: np.ndarray
                                 ) -> Tuple[bytes, Dict]:
        q = quantize_clip_u8(z_unit)
        meta = {"model_id": self.model_id, "dim": int(z_unit.shape[0]),
                "quant": "u8_symmetric_-1_1", "codec": "zstd",
                "zstd_level": 19}
        return self.zctx.compress(q.tobytes()), meta


def decode_clip_stream(clip_stream: bytes, clip_meta: Dict) -> np.ndarray:
    """zstd u8 payload -> unit vector (reference: search.py:24-41)."""
    dim = int((clip_meta or {}).get("dim", 0))
    if dim <= 0:
        raise ValueError("invalid clip_meta.dim")
    raw = zstd.ZstdDecompressor().decompress(clip_stream)
    q = np.frombuffer(raw, dtype=np.uint8)
    if q.size != dim:
        raise ValueError(f"clip dim mismatch: {q.size} != {dim}")
    return dequantize_clip_u8(q)
