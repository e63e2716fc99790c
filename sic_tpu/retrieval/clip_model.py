"""CLIP image + text towers (flax, NHWC) with open_clip weight porting.

Counterpart of the reference's dependency on the ``open_clip`` package
(reference: src/compress.py:58-74, src/search.py:48-63 — ViT-B-32,
``laion2b_s34b_b79k``).  Rebuilt as jitted JAX so the image embedding can be
fused into the same device pass as the codec's encode.

Offline note: pretrained weights and the BPE vocab are external artifacts;
:func:`port_open_clip_weights` loads a torch checkpoint when one is
provided, and :class:`SimpleTokenizer` loads the standard
``bpe_simple_vocab_16e6.txt.gz``.  Without them the towers run with random
weights and a hashed fallback tokenizer (useful for tests; NOT retrieval-
compatible with real CLIP).
"""
from __future__ import annotations

import dataclasses
import gzip
import html
import re
from functools import lru_cache
from pathlib import Path
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import LayerNorm, ResidualAttentionBlock, scaled_normal_init

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPSpec:
    """ViT-B-32 by default (the reference's model)."""
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408

    @property
    def model_id(self) -> str:
        return "ViT-B-32:laion2b_s34b_b79k"


class CLIPVisionTower(nn.Module):
    spec: CLIPSpec
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, 224, 224, 3) already CLIP-normalized -> (B, embed_dim)."""
        s = self.spec
        grid = s.image_size // s.patch_size
        scale = s.vision_width ** -0.5
        x = nn.Conv(s.vision_width, (s.patch_size, s.patch_size),
                    strides=s.patch_size, use_bias=False, dtype=self.dtype,
                    name="patch_embed")(x)
        B = x.shape[0]
        x = x.reshape(B, grid * grid, s.vision_width)
        cls = self.param("class_embedding", scaled_normal_init(scale),
                         (s.vision_width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, s.vision_width)), x],
            axis=1)
        pos = self.param("positional_embedding", scaled_normal_init(scale),
                         (grid * grid + 1, s.vision_width))
        x = x + pos.astype(x.dtype)
        x = LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        for i in range(s.vision_layers):
            x = ResidualAttentionBlock(s.vision_heads, 4.0, self.dtype,
                                       name=f"block_{i}")(x)
        x = LayerNorm(dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param("proj", scaled_normal_init(scale),
                          (s.vision_width, s.embed_dim))
        return x @ proj.astype(x.dtype)


class CLIPTextTower(nn.Module):
    spec: CLIPSpec
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, 77) int32 -> (B, embed_dim)."""
        s = self.spec
        emb = nn.Embed(s.vocab_size, s.text_width,
                       embedding_init=nn.initializers.normal(0.02),
                       name="token_embedding")
        x = emb(tokens)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (s.context_length, s.text_width))
        x = x + pos.astype(x.dtype)
        causal = jnp.triu(jnp.full((s.context_length, s.context_length),
                                   -jnp.inf, jnp.float32), k=1)
        for i in range(s.text_layers):
            x = ResidualAttentionBlock(s.text_heads, 4.0, self.dtype,
                                       name=f"block_{i}")(x, causal)
        x = LayerNorm(dtype=self.dtype, name="ln_final")(x)
        # features at the EOT token (highest token id per row)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection",
                          scaled_normal_init(s.text_width ** -0.5),
                          (s.text_width, s.embed_dim))
        return x @ proj.astype(x.dtype)


class CLIPModel(nn.Module):
    spec: CLIPSpec = CLIPSpec()
    dtype: Optional[Any] = None

    def setup(self):
        self.visual = CLIPVisionTower(self.spec, self.dtype)
        self.text = CLIPTextTower(self.spec, self.dtype)

    def encode_image(self, x):
        z = self.visual(x).astype(jnp.float32)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def encode_text(self, tokens):
        z = self.text(tokens).astype(jnp.float32)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def __call__(self, x, tokens):
        return self.encode_image(x), self.encode_text(tokens)


def preprocess_image(img, image_size: int = 224) -> np.ndarray:
    """PIL image / HWC uint8/float array -> (224, 224, 3) CLIP-normalized.

    Resize-shorter-side (bicubic) + center crop + normalize, matching
    open_clip's eval transform (reference: compress.py:69-74)."""
    from PIL import Image
    if not isinstance(img, Image.Image):
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.clip((arr + 1.0) * 127.5 if arr.min() < 0 else arr * 255.0,
                          0, 255).astype(np.uint8)
        img = Image.fromarray(arr)
    img = img.convert("RGB")
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize((max(image_size, round(w * scale)),
                      max(image_size, round(h * scale))), Image.BICUBIC)
    w, h = img.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    x = np.asarray(img, np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


# -- tokenizer -------------------------------------------------------------------

@lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class SimpleTokenizer:
    """CLIP byte-BPE tokenizer; needs the standard merges file.

    Falls back to a deterministic hash tokenizer when no vocab is available
    (clearly non-compatible; for offline tests only).
    """

    def __init__(self, bpe_path: Optional[str] = None,
                 context_length: int = 77):
        self.context_length = context_length
        self.byte_encoder = _bytes_to_unicode()
        # stdlib `re` lacks \p{L}/\p{N}; \w/\d cover the unicode classes
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[^\W\d_]+|\d|[^\s\w]+", re.IGNORECASE | re.UNICODE)
        self.fallback = bpe_path is None or not Path(bpe_path).exists()
        if self.fallback:
            self.sot, self.eot = 49406, 49407
            return
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1]]
        vocab = list(_bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

    def _bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word, i = [], 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode_ids(self, text: str):
        text = html.unescape(html.unescape(text)).strip().lower()
        text = re.sub(r"\s+", " ", text)
        ids = []
        for token in re.findall(self.pat, text):
            if self.fallback:
                ids.append(hash(token) % 49000 + 300)
                continue
            t = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[bp] for bp in self._bpe(t).split(" "))
        return ids

    def __call__(self, texts) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode_ids(t)[: self.context_length - 2] \
                + [self.eot]
            out[i, :len(ids)] = ids
        return out


# -- weight porting ----------------------------------------------------------------

def port_open_clip_weights(ckpt_path: str, spec: CLIPSpec = CLIPSpec()):
    """torch open_clip ViT-B-32 state dict -> CLIPModel param tree."""
    import torch
    sd = torch.load(ckpt_path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    g = lambda k: jnp.asarray(sd[k].float().numpy())

    def block(prefix):
        return {
            "ln_1": {"scale": g(f"{prefix}.ln_1.weight"), "bias": g(f"{prefix}.ln_1.bias")},
            "ln_2": {"scale": g(f"{prefix}.ln_2.weight"), "bias": g(f"{prefix}.ln_2.bias")},
            "attn": {
                "in_proj": {"kernel": g(f"{prefix}.attn.in_proj_weight").T,
                            "bias": g(f"{prefix}.attn.in_proj_bias")},
                "out_proj": {"kernel": g(f"{prefix}.attn.out_proj.weight").T,
                             "bias": g(f"{prefix}.attn.out_proj.bias")},
            },
            "mlp": {"c_fc": {"kernel": g(f"{prefix}.mlp.c_fc.weight").T,
                             "bias": g(f"{prefix}.mlp.c_fc.bias")},
                    "c_proj": {"kernel": g(f"{prefix}.mlp.c_proj.weight").T,
                               "bias": g(f"{prefix}.mlp.c_proj.bias")}},
        }

    visual = {
        "patch_embed": {"kernel": g("visual.conv1.weight").transpose(2, 3, 1, 0)},
        "class_embedding": g("visual.class_embedding"),
        "positional_embedding": g("visual.positional_embedding"),
        "ln_pre": {"scale": g("visual.ln_pre.weight"), "bias": g("visual.ln_pre.bias")},
        "ln_post": {"scale": g("visual.ln_post.weight"), "bias": g("visual.ln_post.bias")},
        "proj": g("visual.proj"),
    }
    for i in range(spec.vision_layers):
        visual[f"block_{i}"] = block(f"visual.transformer.resblocks.{i}")

    text = {
        "token_embedding": {"embedding": g("token_embedding.weight")},
        "positional_embedding": g("positional_embedding"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    for i in range(spec.text_layers):
        text[f"block_{i}"] = block(f"transformer.resblocks.{i}")

    return {"params": {"visual": visual, "text": text}}
