"""ASTROMER embedding features — gated capability stub.

The reference (src/features/astromer_embeddings.py, v26) pools pre-trained
single-band transformer embeddings from the external ASTROMER TensorFlow
package; the experiment hurt the leaderboard and the weights are an
external download. This environment has neither TensorFlow nor the
weights, so the module degrades explicitly: `available()` reports False
and `extract` raises with guidance. The in-repo transformer encoder
(mallorn_tpu.models.transformer) provides the equivalent learned-embedding
capability natively; `extract_learned_embeddings` pools its CLS states as
a drop-in replacement.
"""

from __future__ import annotations

import numpy as np


def available() -> bool:
    return False  # external pretrained weights are not shipped


def extract(packed, meta=None):
    raise NotImplementedError(
        "ASTROMER pretrained embeddings require the external TF package + "
        "weights (reference v26; LB-negative). Use "
        "mallorn_tpu.features.astromer.extract_learned_embeddings for the "
        "native equivalent."
    )


def extract_learned_embeddings(packed, meta, d_model: int = 32,
                               n_epochs: int = 100, seed: int = 0):
    """Train the in-repo time-series transformer briefly and return pooled
    CLS embeddings as features {emb_0..emb_{d-1}}."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from mallorn_tpu.models.data import make_sequence_batch
    from mallorn_tpu.models.train_dl import train_model
    from mallorn_tpu.models.transformer import (EncoderBlock,
                                                TransformerClassifier,
                                                time_encoding)

    batch = make_sequence_batch(packed, meta)
    model = TransformerClassifier(d_model=d_model, n_layers=2)
    res = train_model(model, batch, n_epochs=n_epochs, seed=seed)

    class Embedder(nn.Module):
        base: TransformerClassifier

        @nn.compact
        def __call__(self, b):
            return self.base(b, train=False)

    # pooled CLS representation via a capture of the penultimate layer:
    # rerun the trunk manually with the trained params
    def trunk(params, b):
        # reuse the classifier forward but return the logit-adjacent CLS
        # representation by probing intermediates
        _, state = model.apply(params, b, train=False,
                               capture_intermediates=True)
        inter = state["intermediates"]
        # last LayerNorm output before the head
        for key in reversed(list(inter.keys())):
            if "LayerNorm" in key:
                return inter[key]["__call__"][0]
        raise KeyError("no LayerNorm intermediate found")

    emb = np.asarray(trunk(res.params, batch))
    if emb.ndim == 3:  # [N, T, D] -> CLS token
        emb = emb[:, 0]
    return {f"emb_{i}": emb[:, i] for i in range(emb.shape[1])}
