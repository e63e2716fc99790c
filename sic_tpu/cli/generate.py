"""generate CLI: class-conditional image synthesis from the MaskGIT prior.

The reference tree ships the ``ImageBert`` masked-token generator
(reference: src/titok/maskgit.py:30-137) but never wires it into any entry
point (SURVEY §2.4 — capability present, unexposed).  This CLI exposes the
same capability end to end: iterative confidence-based sampling of the 32
TiTok latent tokens per image (CFG + gumbel-noised argmax + arccos mask
schedule), then pixel decode through the standalone TiTok pixel path
(reference: titok/titok.py:133-143).

Both weight sets are external inputs, as everywhere in this framework:
``--titok_ckpt`` ports the public ``tokenizer_titok_l32.bin`` torch file;
``--maskgit_ckpt`` restores flax-msgpack generator params (the reference
publishes no ImageBert checkpoint, and its HF-BERT backbone would not port
onto this pre-LN transformer anyway — see models/maskgit.py).  Without
them the pipeline runs with random weights (warned), which still exercises
every stage.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def load_titok(titok_ckpt, tiny: bool):
    import jax
    import jax.numpy as jnp

    from ..config import tiny_spec
    from ..models.maskgit_vqgan import MaskGITVQGANSpec
    from ..models.titok import TiTok

    if tiny:
        ts = tiny_spec().titok
        # GroupNorm in the pixel CNN runs 32 groups (reference parity), so
        # even the tiny spec keeps channels at multiples of 32
        pix = MaskGITVQGANSpec(hidden_channels=32, channel_mult=(1, 2),
                               num_res_blocks=1, z_channels=32,
                               num_embeddings=32, embedding_dim=32)
    else:
        from ..models.hybrid import TiTokSpec
        ts, pix = TiTokSpec(), MaskGITVQGANSpec()
    model = TiTok(spec=ts, pixel=pix)
    if titok_ckpt:
        import torch

        from ..port import port_titok
        sd = torch.load(titok_ckpt, map_location="cpu")
        sd = {k: v for k, v in (sd.get("state_dict", sd)).items()}
        params = port_titok(sd, num_layers=ts.num_layers)
    else:
        print("[WARN] no --titok_ckpt given; pixel decode runs with random "
              "weights", file=sys.stderr)
        tile = ts.tile_px
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, tile, tile, 3)))
    return model, params


def load_generator(maskgit_ckpt, titok_spec, tiny: bool):
    import jax
    import jax.numpy as jnp

    from ..models.maskgit import MaskGITGenerator, MaskGITSpec

    if tiny:
        spec = MaskGITSpec(codebook_size=titok_spec.codebook_size,
                           condition_num_classes=10,
                           image_seq_len=titok_spec.num_latent_tokens,
                           hidden=64, num_layers=2, num_heads=2)
    else:
        spec = MaskGITSpec(codebook_size=titok_spec.codebook_size,
                           image_seq_len=titok_spec.num_latent_tokens)
    model = MaskGITGenerator(spec)
    if maskgit_ckpt:
        import flax.serialization

        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, spec.image_seq_len), jnp.int32),
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1,), bool))
        params = flax.serialization.from_bytes(
            template, Path(maskgit_ckpt).read_bytes())
    else:
        print("[WARN] no --maskgit_ckpt given; sampling runs with random "
              "weights", file=sys.stderr)
        params = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, spec.image_seq_len), jnp.int32),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1,), bool))
    return model, params


def main(argv=None):
    from ._common import respect_platform_env
    respect_platform_env()
    ap = argparse.ArgumentParser(
        description="Sample images from the MaskGIT prior over TiTok tokens")
    ap.add_argument("--save_dir", type=str, required=True)
    ap.add_argument("--classes", type=str, default="0",
                    help="comma-separated class ids, one image per entry")
    ap.add_argument("--titok_ckpt", type=str, default=None,
                    help="tokenizer_titok_l32.bin (torch)")
    ap.add_argument("--maskgit_ckpt", type=str, default=None,
                    help="flax-msgpack MaskGITGenerator params")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--guidance_scale", type=float, default=3.0)
    ap.add_argument("--temperature", type=float, default=4.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="test-scale specs (CPU-friendly)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models.maskgit import generate

    titok, titok_params = load_titok(args.titok_ckpt, args.tiny)
    gen, gen_params = load_generator(args.maskgit_ckpt, titok.spec, args.tiny)

    cond = jnp.asarray([int(c) for c in args.classes.split(",") if c.strip()],
                       jnp.int32)
    tokens = generate(gen, gen_params, jax.random.PRNGKey(args.seed), cond,
                      guidance_scale=args.guidance_scale,
                      randomize_temperature=args.temperature,
                      num_sample_steps=args.steps)
    pixels = titok.apply(titok_params, tokens, method=titok.decode_tokens)
    # the pixel decoder's conv output is unbounded; the public TiTok demo
    # clamps to [0, 1] before viewing — same here
    pixels = np.clip(np.asarray(pixels, np.float32), 0.0, 1.0)

    out = Path(args.save_dir)
    out.mkdir(parents=True, exist_ok=True)
    from PIL import Image
    names = []
    for i, c in enumerate(np.asarray(cond)):
        u8 = (pixels[i] * 255.0 + 0.5).astype(np.uint8)
        name = f"sample_class{int(c)}_{i}.png"
        Image.fromarray(u8).save(out / name)
        names.append(name)
    print(f"[OK] wrote {len(names)} samples -> {out}")
    return names


if __name__ == "__main__":
    main()
