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
    """Whether the ORIGINAL pretrained ASTROMER weights are present
    (they never are in this environment — external TF download)."""
    return False


def extract(packed, meta=None, d_model: int = 32, n_epochs: int = 100,
            seed: int = 0):
    """Transformer-embedding features {emb_0..emb_{d-1}}.

    The reference pools PRE-TRAINED single-band ASTROMER embeddings
    (reference: src/features/astromer_embeddings.py:32-268, v26 —
    LB-negative). The pretrained TF weights are an external download
    this environment cannot ship, so this trains the in-repo time-series
    transformer briefly on the given objects and pools its CLS states —
    the same learned-embedding capability, natively. Callers that need
    the exact pretrained-ASTROMER vectors should check ``available()``.
    """
    import warnings

    warnings.warn(
        "pretrained ASTROMER weights are unavailable in this environment; "
        "extract() returns natively-trained transformer embeddings instead "
        "(semantically different features). Check available() or call "
        "extract_learned_embeddings() directly to acknowledge.",
        stacklevel=2)
    return extract_learned_embeddings(packed, meta, d_model=d_model,
                                      n_epochs=n_epochs, seed=seed)


def extract_learned_embeddings(packed, meta, d_model: int = 32,
                               n_epochs: int = 100, seed: int = 0):
    """Train the in-repo time-series transformer briefly and return pooled
    CLS embeddings as features {emb_0..emb_{d-1}}."""
    from mallorn_tpu.models.data import make_sequence_batch
    from mallorn_tpu.models.train_dl import train_model
    from mallorn_tpu.models.transformer import TransformerClassifier

    batch = make_sequence_batch(packed, meta)
    model = TransformerClassifier(d_model=d_model, n_layers=2)
    res = train_model(model, batch, n_epochs=n_epochs, seed=seed)

    # first-class trunk API: the classifier returns its normalized CLS
    # representation directly (no intermediate probing)
    emb = np.asarray(model.apply(res.params, batch, train=False,
                                 return_embedding=True))
    return {f"emb_{i}": emb[:, i] for i in range(emb.shape[1])}
