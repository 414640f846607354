"""Transformer encoder classifier with sinusoidal *time-value* encoding
(Flax port of the capability in reference
src/models/transformer_classifier.py:25-234: feature embedding + band
embedding + continuous-time sinusoidal encoding + CLS pooling)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.models.data import SequenceBatch


def time_encoding(times, d_model, max_time=1000.0):
    """Sinusoidal encoding of continuous observation times [N, T] -> [N, T, D]."""
    half = d_model // 2
    div = jnp.exp(jnp.arange(half) * 2.0 * (-np.log(10000.0) / d_model))
    ang = times[..., None] * div  # t * exp(-2i ln(1e4)/d)
    pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if pe.shape[-1] < d_model:
        pe = jnp.pad(pe, (*[(0, 0)] * (pe.ndim - 1), (0, d_model - pe.shape[-1])))
    return pe


class EncoderBlock(nn.Module):
    d_model: int
    n_heads: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask, train: bool):
        attn_mask = mask[:, None, None, :]  # [N, 1, 1, T]
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout,
            deterministic=not train)(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.d_model * 4)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class TransformerClassifier(nn.Module):
    d_model: int = 64
    n_heads: int = 4
    n_layers: int = 3
    n_bands: int = 6
    dropout: float = 0.2
    max_time: float = 1000.0

    @nn.compact
    def __call__(self, batch: SequenceBatch, train: bool = False,
                 return_embedding: bool = False):
        """``return_embedding=True`` returns the normalized CLS trunk
        representation [N, d_model] instead of logits — the first-class
        embedding API (used by features.astromer's native substitute for
        the reference's pooled pretrained embeddings,
        src/features/astromer_embeddings.py:32-268)."""
        x = nn.Dense(self.d_model)(batch.features)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        x = x + nn.Embed(self.n_bands, self.d_model)(batch.band)
        x = x + time_encoding(batch.times, self.d_model, self.max_time)
        x = jnp.where(batch.mask[..., None], x, 0.0)

        # prepend CLS token
        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, self.d_model))
        n = x.shape[0]
        x = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), x], axis=1)
        mask = jnp.concatenate([jnp.ones((n, 1), bool), batch.mask], axis=1)

        for _ in range(self.n_layers):
            x = EncoderBlock(self.d_model, self.n_heads, self.dropout)(x, mask, train)

        h = nn.LayerNorm()(x[:, 0])
        if return_embedding:
            return h
        h = jnp.concatenate([h, batch.meta], axis=-1)
        h = nn.Dense(self.d_model)(h)
        h = nn.relu(h)
        return nn.Dense(1)(h)[..., 0]
