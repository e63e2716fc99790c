"""Factorized-prior entropy model (learned per-channel CDF).

Counterpart of ``Bitparm``/``BitEstimator``
(reference: src/entropy/entropy_models.py:97-249): four monotone layers
parameterize a per-channel CDF; ``update`` scans [-50, 50] for the support
and builds one quantized CDF table per channel; coding selects the table by
channel index.  In the shipped model this path is only instantiated when a
``mv_z_channel`` is configured (reference: compression_model.py:35-37) —
provided here for full capability parity.

Layout: NHWC; per-channel parameters have shape (C,) and broadcast on the
last axis.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .coder import EntropyCoder, pmf_to_quantized_cdf
from .gaussian import lower_bound


class Bitparm(nn.Module):
    """One monotone CDF layer (reference: entropy_models.py:97-117)."""
    channel: int
    final: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.normal(0.01)
        h = self.param("h", init, (self.channel,))
        b = self.param("b", init, (self.channel,))
        x = x * jax.nn.softplus(h) + b
        if self.final:
            return x
        a = self.param("a", init, (self.channel,))
        return x + jnp.tanh(x) * jnp.tanh(a)


class BitEstimator(nn.Module):
    """Stacked Bitparm CDF model over the channel axis."""
    channel: int

    def setup(self):
        self.f1 = Bitparm(self.channel)
        self.f2 = Bitparm(self.channel)
        self.f3 = Bitparm(self.channel)
        self.f4 = Bitparm(self.channel, final=True)

    def get_logits_cdf(self, x):
        return self.f4(self.f3(self.f2(self.f1(x))))

    def get_cdf(self, x):
        return jax.nn.sigmoid(self.get_logits_cdf(x))

    def __call__(self, x):
        return self.get_cdf(x)

    def get_prob(self, x):
        """P(round == x), numerically-stable sign trick
        (reference: entropy_models.py:160-170)."""
        lower = self.get_logits_cdf(x - 0.5)
        upper = self.get_logits_cdf(x + 0.5)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        prob = jnp.abs(jax.nn.sigmoid(sign * upper)
                       - jax.nn.sigmoid(sign * lower))
        return lower_bound(prob, 1e-9)

    def get_bits(self, x):
        return jnp.clip(-jnp.log2(self.get_prob(x) + 1e-5), 0.0, None)


class FactorizedCoder:
    """Host driver: builds per-channel CDF tables + codes with the native
    rANS (the reference's ``BitEstimator.update``/``encode``/``decode``,
    entropy_models.py:172-249)."""

    def __init__(self, module: BitEstimator, params,
                 coder: Optional[EntropyCoder] = None):
        self.module = module
        self.params = params
        self.channel = module.channel
        self.coder = coder or EntropyCoder()

        cdf_fn = jax.jit(lambda p, x: module.apply(p, x))
        C = self.channel

        def cdf_at(v: np.ndarray) -> np.ndarray:
            # v: (n,) sample offsets -> (n, C) CDF values
            x = jnp.broadcast_to(jnp.asarray(v, jnp.float32)[:, None], (len(v), C))
            return np.asarray(cdf_fn(params, x))

        # support scan (reference: entropy_models.py:180-205)
        minima = np.full(C, 50, np.int64)
        maxima = np.full(C, 50, np.int64)
        for i in range(50, 1, -1):
            probs_lo = cdf_at(np.array([-float(i)]))[0]
            probs_hi = cdf_at(np.array([float(i)]))[0]
            minima = np.where(probs_lo < 1e-4, i, minima)
            maxima = np.where(probs_hi > 0.9999, i, maxima)

        offset = -minima
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max())
        samples = np.arange(max_length, dtype=np.float32)

        # per-channel sample grid: samples - minima[c]
        grid = samples[None, :] - minima[:, None]            # (C, L)
        x = jnp.asarray(grid.T, jnp.float32)                 # (L, C)
        lower = np.asarray(cdf_fn(params, x - 0.5)).T        # (C, L)
        upper = np.asarray(cdf_fn(params, x + 0.5)).T
        pmf = upper - lower
        tail_mass = lower[:, 0] + (1.0 - upper[:, -1])

        quantized = np.zeros((C, max_length + 2), np.int32)
        for c in range(C):
            row = np.concatenate([pmf[c, : pmf_length[c]], tail_mass[c:c + 1]])
            cdf = pmf_to_quantized_cdf(row, 16)
            quantized[c, : cdf.shape[0]] = cdf

        self.quantized_cdf = quantized
        self.cdf_length = (pmf_length + 2).astype(np.int32)
        self.offset = offset.astype(np.int32)
        self.cdf_group = self.coder.add_cdf(self.quantized_cdf,
                                            self.cdf_length, self.offset)

    def build_indexes(self, shape_bhwc) -> np.ndarray:
        """Channel-index plane (reference: entropy_models.py:229-234; NHWC)."""
        B, H, W, C = shape_bhwc
        return np.broadcast_to(
            np.arange(C, dtype=np.int16)[None, None, None, :],
            (B, H, W, C)).copy()

    def encode(self, symbols) -> None:
        x = np.asarray(symbols)
        idx = self.build_indexes(x.shape)
        self.coder.encode_with_indexes(x.reshape(-1), idx.reshape(-1),
                                       self.cdf_group)

    def decode_stream(self, shape_bhwc) -> np.ndarray:
        idx = self.build_indexes(shape_bhwc)
        out = self.coder.decode_stream(idx.reshape(-1), self.cdf_group)
        return out.reshape(shape_bhwc)
