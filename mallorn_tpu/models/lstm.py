"""BiLSTM + additive attention classifier (Flax port of the capability in
reference src/models/lstm_classifier.py:22-237: band embeddings, stacked
bidirectional LSTM, additive attention pooling, metadata fusion head).
A documented-failure baseline (OOF F1 ~ 0.12, BENCHMARKS.md:32-41) kept
for capability parity."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mallorn_tpu.models.data import SequenceBatch


class AdditiveAttention(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, h, mask):
        # h: [N, T, H]; mask: [N, T]
        s = nn.Dense(self.hidden_dim // 2)(h)
        s = jnp.tanh(s)
        score = nn.Dense(1, use_bias=False)(s)[..., 0]  # [N, T]
        score = jnp.where(mask, score, -1e9)
        w = jax.nn.softmax(score, axis=-1)
        return jnp.einsum("nt,nth->nh", w, h)


class LSTMClassifier(nn.Module):
    band_embed_dim: int = 8
    hidden_dim: int = 64
    n_layers: int = 2
    n_bands: int = 6
    dropout: float = 0.3

    @nn.compact
    def __call__(self, batch: SequenceBatch, train: bool = False):
        x = batch.features  # [N, T, 3]
        be = nn.Embed(self.n_bands, self.band_embed_dim)(batch.band)
        x = jnp.concatenate([x, be], axis=-1)
        x = jnp.where(batch.mask[..., None], x, 0.0)

        for _ in range(self.n_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim))(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim), reverse=True,
                         keep_order=True)(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)

        ctx = AdditiveAttention(x.shape[-1])(x, batch.mask)
        h = jnp.concatenate([ctx, batch.meta], axis=-1)
        h = nn.Dense(self.hidden_dim)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(1)(h)[..., 0]  # logits
