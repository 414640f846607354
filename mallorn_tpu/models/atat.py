"""ATAT: Astronomical Transformer for time series And Tabular data.

Flax port of the capability in reference src/models/atat.py (itself after
arXiv 2405.03078): Fourier time-modulation encoding of the lightcurve
(:25-111), a quantile feature tokenizer for tabular features (:113-157),
twin transformer encoders (:159-307) and a fused classification head
(:308-400). Best DL result in the reference (F1 = 0.50, BENCHMARKS.md:60).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.models.data import SequenceBatch
from mallorn_tpu.models.transformer import EncoderBlock


class TimeModulation(nn.Module):
    """Learnable Fourier temporal encoding: per-band harmonic embeddings
    modulated by observation time (reference :25-111)."""

    embed_dim: int = 32
    n_harmonics: int = 8
    max_time: float = 1000.0

    @nn.compact
    def __call__(self, flux, times, band, n_bands=6):
        # flux [N, T], times [N, T], band [N, T]
        w = 2.0 * np.pi * (jnp.arange(self.n_harmonics) + 1.0) / self.max_time
        ang = times[..., None] * w  # [N, T, H]
        fourier = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        # band-conditioned projection of (flux, fourier phases)
        x = jnp.concatenate([flux[..., None], fourier], axis=-1)
        proj = nn.Dense(self.embed_dim)(x)
        band_scale = nn.Embed(n_bands, self.embed_dim)(band)
        band_shift = nn.Embed(n_bands, self.embed_dim)(band)
        return proj * (1.0 + band_scale) + band_shift


class QuantileFeatureTokenizer(nn.Module):
    """Tabular features -> per-feature tokens (reference :113-157; the
    quantile transform itself is fit host-side and applied before the
    model — here features arrive already rank-normalized)."""

    embed_dim: int = 32

    @nn.compact
    def __call__(self, feats):
        # feats [N, F] -> tokens [N, F, D]: value * learned per-feature
        # direction + per-feature bias
        n_f = feats.shape[-1]
        weight = self.param("weight", nn.initializers.normal(0.02),
                            (n_f, self.embed_dim))
        bias = self.param("bias", nn.initializers.zeros, (n_f, self.embed_dim))
        return feats[..., None] * weight + bias


class ATAT(nn.Module):
    embed_dim: int = 32
    n_heads: int = 4
    n_lc_layers: int = 2
    n_tab_layers: int = 2
    dropout: float = 0.2

    @nn.compact
    def __call__(self, batch: SequenceBatch,
                 tabular: Optional[jnp.ndarray] = None, train: bool = False):
        n = batch.features.shape[0]

        # lightcurve branch
        lc = TimeModulation(self.embed_dim)(batch.features[..., 0],
                                            batch.times, batch.band)
        lc = jnp.where(batch.mask[..., None], lc, 0.0)
        cls = self.param("lc_cls", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dim))
        lc = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), lc], axis=1)
        lc_mask = jnp.concatenate([jnp.ones((n, 1), bool), batch.mask], axis=1)
        for _ in range(self.n_lc_layers):
            lc = EncoderBlock(self.embed_dim, self.n_heads, self.dropout)(
                lc, lc_mask, train)
        lc_repr = nn.LayerNorm()(lc[:, 0])

        # tabular branch
        if tabular is None:
            tabular = batch.meta
        tokens = QuantileFeatureTokenizer(self.embed_dim)(tabular)
        tcls = self.param("tab_cls", nn.initializers.normal(0.02),
                          (1, 1, self.embed_dim))
        tokens = jnp.concatenate([jnp.tile(tcls, (n, 1, 1)), tokens], axis=1)
        tmask = jnp.ones(tokens.shape[:2], bool)
        for _ in range(self.n_tab_layers):
            tokens = EncoderBlock(self.embed_dim, self.n_heads, self.dropout)(
                tokens, tmask, train)
        tab_repr = nn.LayerNorm()(tokens[:, 0])

        # fusion
        h = jnp.concatenate([lc_repr, tab_repr], axis=-1)
        h = nn.Dense(self.embed_dim * 2)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(1)(h)[..., 0]
