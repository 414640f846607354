"""Band-parallel attention-GRU classifier (v27).

Flax port of the capability in reference scripts/train_v27_gru.py:147-260
(`AttentionGRU`): a bidirectional GRU SHARED across bands encodes each
band's sequence, additive attention pools each band, band representations
concatenate into an aggregation MLP + classifier head, with a
`return_features` hook for the GBDT hybrid.

TPU-first: the reference loops over the 6 bands in python, calling the
shared GRU once per band; here bands fold into the batch dimension
([N, 6, T, F] -> [N*6, T, F]) so ONE RNN dispatch covers all bands — same
weights, same math, 6x fewer kernel launches.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mallorn_tpu.models.data import BandBatch
from mallorn_tpu.models.lstm import AdditiveAttention


class GRUClassifier(nn.Module):
    band_embed_dim: int = 16
    hidden_dim: int = 64
    n_layers: int = 2
    n_bands: int = 6
    dropout: float = 0.3

    @nn.compact
    def __call__(self, batch: BandBatch, train: bool = False,
                 return_features: bool = False):
        n, nb, t, _ = batch.features.shape
        # band embedding appended to each step (reference :203-206)
        be = nn.Embed(self.n_bands, self.band_embed_dim)(jnp.arange(nb))
        be = jnp.broadcast_to(be[None, :, None, :],
                              (n, nb, t, self.band_embed_dim))
        x = jnp.concatenate([batch.features, be], axis=-1)
        x = jnp.where(batch.mask[..., None], x, 0.0)

        # bands -> batch dim: one shared bidirectional GRU dispatch.
        # Valid observations are packed contiguously from index 0 per band
        # (data/packing.py), so seq_lengths keeps the backward pass from
        # accumulating state over trailing padding (the reference's torch
        # GRU runs over padding and relies on attention masking alone —
        # per-band padding is much heavier here, so mask properly).
        x = x.reshape(n * nb, t, x.shape[-1])
        mask = batch.mask.reshape(n * nb, t)
        lengths = mask.sum(axis=1)
        for _ in range(self.n_layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden_dim))(x, seq_lengths=lengths)
            bwd = nn.RNN(nn.GRUCell(self.hidden_dim), reverse=True,
                         keep_order=True)(x, seq_lengths=lengths)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            x = jnp.where(mask[..., None], x, 0.0)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)

        # per-band attention pooling; empty bands -> zero representation
        # (reference :211-233 uniform-weights + has_valid zeroing)
        rep = AdditiveAttention(x.shape[-1])(x, mask)
        rep = jnp.where(mask.any(axis=1)[:, None], rep, 0.0)
        all_bands = rep.reshape(n, nb * 2 * self.hidden_dim)

        # band aggregation MLP (reference :172-180)
        h = nn.Dense(2 * self.hidden_dim)(all_bands)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if return_features:
            return h  # GBDT-hybrid features (reference `return_features`)

        h = jnp.concatenate([h, batch.meta], axis=-1)
        h = nn.Dense(self.hidden_dim)(h)
        h = nn.relu(h)
        return nn.Dense(1)(h)[..., 0]  # logits
