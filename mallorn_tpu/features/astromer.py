"""ASTROMER embedding features from the in-repo pretrained encoder.

The reference pools pretrained single-band ASTROMER transformer
embeddings per band (reference: src/features/astromer_embeddings.py,
v26): for each of g,r,i,z it converts flux to relative magnitudes,
encodes with the pretrained SingleBandEncoder, mean+max-pools the
sequence embedding, keeps the first 32 dims plus 4 summary stats
(lines 152-190), and adds two cross-band mean ratios (lines 248-266) —
146 features total, NaN where a band has <5 valid points.

This implementation produces the same feature surface from the in-repo
self-supervised encoder (models/astromer.py, masked-reconstruction
pretraining a la Donoso-Oliva et al. 2022 on the synthetic corpus;
artifact under mallorn_tpu/artifacts/, recipe in
tools/pretrain_astromer.py). The weights are NOT the original
MACHO-trained TF artifact — ``pretrained_origin()`` says which weights
are in use — but the capability (pretrained-transformer light-curve
embeddings pooled into GBM features) is the same, and the extraction is
TPU-first: all (object, band) sequences are encoded in ONE batched
forward pass, no per-object loop.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# reference band list (src/features/astromer_embeddings.py:30) and their
# indices in LSST u..y = 0..5 packing order
ASTROMER_BANDS = ("g", "r", "i", "z")
_BAND_IDX = (1, 2, 3, 4)
_N_EMB = 32  # dims kept per band (reference line 180)
_MIN_POINTS = 5  # reference lines 71, 220


def available(weights_path=None) -> bool:
    """Whether pretrained encoder weights are present.

    True for the in-repo self-supervised artifact; the ORIGINAL
    MACHO-pretrained TF weights are an external download this
    environment cannot ship (see pretrained_origin())."""
    from mallorn_tpu.models.astromer import DEFAULT_WEIGHTS

    p = weights_path if weights_path is not None else DEFAULT_WEIGHTS
    try:
        return p.exists()
    except AttributeError:
        import os

        return os.path.exists(p)


def pretrained_origin() -> str:
    """Provenance of the weights extract() will use."""
    if available():
        return ("in-repo self-supervised (masked-reconstruction on the "
                "synthetic corpus; tools/pretrain_astromer.py)")
    return "unavailable"


def feature_names() -> list:
    """The reference's 146-name astromer feature surface, in order."""
    names = []
    for band in ASTROMER_BANDS:
        names += [f"{band}_astromer_emb_{i}" for i in range(_N_EMB)]
        names += [f"{band}_astromer_emb_{s}"
                  for s in ("mean", "std", "max", "min")]
    names += ["astromer_gr_mean_ratio", "astromer_ri_mean_ratio"]
    return names


from functools import partial


@partial(jax.jit, static_argnums=0)
def _encode_pool(model, params, times, mags, errs, mask):
    """Module-level jit (model static, hashable flax dataclass): the
    compiled executable is reused across extract() calls / splits."""
    emb, _ = model.apply(params, times, mags, errs, mask)
    return _pool(emb, mask)


def _pool(emb, valid):
    """Masked mean+max pool [B, T, D] -> [B, 2D] (reference pools the
    sequence embedding with np.mean/np.max, lines 166-171)."""
    v = valid[..., None]
    n = jnp.maximum(jnp.sum(v, axis=1), 1.0)
    mean = jnp.sum(jnp.where(v, emb, 0.0), axis=1) / n
    mx = jnp.max(jnp.where(v, emb, -jnp.inf), axis=1)
    return jnp.concatenate([mean, mx], axis=-1)


def extract(packed, meta=None, weights_path=None) -> Dict[str, np.ndarray]:
    """Pretrained-embedding features {band}_astromer_emb_* + ratios.

    One batched forward: all N objects x 4 bands are normalized
    (models/astromer.normalize_band — the reference's flux->relative-mag
    prep, src/features/astromer_embeddings.py:52-118), encoded together
    as a [N*4, T] batch, and pooled per the reference's scheme. Bands
    with <{MIN} valid points get NaN across their 36 features (reference
    lines 240-246); ratios use the 1e-6-guarded mean convention
    (line 262).
    """
    from mallorn_tpu.models.astromer import load_pretrained, normalize_band

    if not available(weights_path):
        # the reference emits all-NaN astromer features when the model
        # cannot be loaded (src/features/astromer_embeddings.py:211-215,
        # 240-246) — same surface on train AND test, so downstream
        # matrices stay aligned (the NaN-native tree layer absorbs them).
        import warnings

        warnings.warn(
            "no pretrained astromer weights found; emitting the all-NaN "
            "146-feature surface (reference model-unavailable behavior). "
            "Run tools/pretrain_astromer.py to produce the artifact, or "
            "call extract_learned_embeddings() for supervised "
            "embeddings.", stacklevel=2)
        n = packed.band_time.shape[0]
        nan = np.full(n, np.nan, np.float32)
        return {name: nan.copy() for name in feature_names()}

    params, model, _config = load_pretrained(weights_path)

    n = packed.band_time.shape[0]
    t = packed.band_time[:, _BAND_IDX].reshape(n * 4, -1)
    f = packed.band_flux[:, _BAND_IDX].reshape(n * 4, -1)
    e = packed.band_err[:, _BAND_IDX].reshape(n * 4, -1)
    m = packed.band_mask[:, _BAND_IDX].reshape(n * 4, -1)
    seqs = normalize_band(t, f, e, m)
    vec = np.asarray(_encode_pool(model, params, seqs.times, seqs.mags,
                                  seqs.errs, seqs.mask), np.float32)  # [N*4, 2D]
    ok = (np.asarray(seqs.n_valid) >= _MIN_POINTS).reshape(n, 4)
    vec = vec.reshape(n, 4, -1)

    out: Dict[str, np.ndarray] = {}
    band_means = {}
    for bi, band in enumerate(ASTROMER_BANDS):
        v = vec[:, bi]
        good = ok[:, bi]
        for i in range(min(_N_EMB, v.shape[1])):
            out[f"{band}_astromer_emb_{i}"] = np.where(good, v[:, i], np.nan)
        stats = {
            "mean": v.mean(axis=1), "std": v.std(axis=1),
            "max": v.max(axis=1), "min": v.min(axis=1),
        }
        for s, arr in stats.items():
            out[f"{band}_astromer_emb_{s}"] = np.where(good, arr, np.nan)
        band_means[band] = out[f"{band}_astromer_emb_mean"]

    # cross-band achromaticity ratios (reference lines 248-266). The
    # reference's bare `+ 1e-6` guard assumed positive embedding means;
    # ours are means of STANDARDIZED pooled embeddings (zero-centered),
    # so the denominator guard must be sign-preserving to keep the
    # feature bounded instead of exploding near zero.
    for b1, b2 in (("g", "r"), ("r", "i")):
        m2 = band_means[b2]
        denom = np.where(m2 >= 0, np.maximum(m2, 1e-6),
                         np.minimum(m2, -1e-6))
        r = band_means[b1] / denom
        both = ~np.isnan(band_means[b1]) & ~np.isnan(m2)
        out[f"astromer_{b1}{b2}_mean_ratio"] = np.where(both, r, np.nan)
    return out


def extract_learned_embeddings(packed, meta, d_model: int = 32,
                               n_epochs: int = 100, seed: int = 0):
    """Supervised fallback: train the in-repo time-series transformer
    briefly on the given objects and return pooled CLS embeddings as
    features {emb_0..emb_{d-1}} (the pre-round-4 native substitute)."""
    from mallorn_tpu.models.data import make_sequence_batch
    from mallorn_tpu.models.train_dl import train_model
    from mallorn_tpu.models.transformer import TransformerClassifier

    batch = make_sequence_batch(packed, meta)
    model = TransformerClassifier(d_model=d_model, n_layers=2)
    res = train_model(model, batch, n_epochs=n_epochs, seed=seed)

    emb = np.asarray(model.apply(res.params, batch, train=False,
                                 return_embedding=True))
    return {f"emb_{i}": emb[:, i] for i in range(emb.shape[1])}
