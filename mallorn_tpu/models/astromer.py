"""ASTROMER-style single-band light-curve encoder with self-supervised
masked-reconstruction pretraining.

The reference pools embeddings from the external pretrained ASTROMER
TensorFlow package (reference: src/features/astromer_embeddings.py:32-50,
``SingleBandEncoder().from_pretraining('macho')`` + ``model.encode``).
That artifact (TF weights trained on MACHO) cannot be shipped here, so
this module provides the same *capability* natively: a single-band
transformer encoder pretrained with ASTROMER's objective — predict the
magnitudes of probed (hidden) observations from the visible ones
(Donoso-Oliva et al. 2022, A&A 670 A54; BERT-style probe/replace/keep
masking) — on light curves from the in-repo synthetic generator.

TPU-first design notes:
- everything is fixed-shape batched [B, T] masked math: the probe mask,
  the random replacements, and the loss are computed with vectorized
  `jax.random` ops, no per-sequence loops;
- the encoder reuses the attention blocks of models/transformer.py and a
  continuous-time sinusoidal encoding (ASTROMER's PE on time values);
- pretraining is one jitted Adam step scanned over minibatches.

The pretrained weights ship in-repo as an .npz artifact (see
tools/pretrain_astromer.py for the reproducible recipe) and are loaded
by features/astromer.py at extraction time.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mallorn_tpu.models.transformer import EncoderBlock, time_encoding

# in-repo pretrained artifact (see tools/pretrain_astromer.py)
DEFAULT_WEIGHTS = Path(__file__).resolve().parent.parent / "artifacts" / \
    "astromer_selfsup_synthetic.npz"


class SingleBandEncoder(nn.Module):
    """Transformer over one band's (time, magnitude, error) sequence.

    Mirrors the role of ASTROMER's SingleBandEncoder (reference:
    src/features/astromer_embeddings.py:43-45): input is a single band's
    observations, output is a per-observation embedding sequence [B, T, D]
    plus a magnitude-reconstruction head used only during pretraining.
    """

    d_model: int = 48
    n_heads: int = 4
    n_layers: int = 2
    dropout: float = 0.0
    max_time: float = 1000.0

    @nn.compact
    def __call__(self, times, mags, errs, mask, probe=None, train: bool = False):
        """times/mags/errs/mask: [B, T]; probe: [B, T] bool (positions whose
        magnitude is hidden from the encoder; None = all visible).

        Returns (embedding [B, T, D], reconstructed magnitude [B, T]).
        """
        if probe is None:
            probe = jnp.zeros_like(mask)
        visible = mask & ~probe
        x_in = jnp.stack([
            jnp.where(visible, mags, 0.0),
            jnp.where(visible, errs, 0.0),
            probe.astype(jnp.float32),  # "this magnitude is hidden" flag
        ], axis=-1)
        x = nn.Dense(self.d_model)(x_in)
        x = x + time_encoding(times, self.d_model, self.max_time)
        x = jnp.where(mask[..., None], x, 0.0)
        for _ in range(self.n_layers):
            x = EncoderBlock(self.d_model, self.n_heads, self.dropout)(
                x, mask, train)
        h = nn.LayerNorm()(x)
        recon = nn.Dense(1)(h)[..., 0]
        return h, recon


class BandSequences(NamedTuple):
    """A batch of single-band, per-sequence-normalized light curves."""

    times: jnp.ndarray  # [B, T] days since first valid observation
    mags: jnp.ndarray  # [B, T] normalized relative magnitude
    errs: jnp.ndarray  # [B, T] normalized magnitude error
    mask: jnp.ndarray  # [B, T] bool valid
    n_valid: jnp.ndarray  # [B] int


def normalize_band(time, flux, err, mask) -> BandSequences:
    """Flux -> per-sequence-normalized relative magnitudes, batched.

    Matches the reference's per-band preparation
    (src/features/astromer_embeddings.py:52-118): keep flux>0, err>0
    points, mag = -2.5 log10(flux), dm = 2.5/ln10 * err/flux, time from 0.
    On top of that the magnitudes are standardized per sequence (the
    ASTROMER library does the same internally before encoding) so the
    encoder sees scale-free inputs.
    """
    time = jnp.asarray(time, jnp.float32)
    flux = jnp.asarray(flux, jnp.float32)
    err = jnp.asarray(err, jnp.float32)
    valid = jnp.asarray(mask, bool) & (flux > 0) & (err > 0)

    safe_f = jnp.where(valid, flux, 1.0)
    mag = -2.5 * jnp.log10(safe_f)
    dmag = 2.5 / jnp.log(10.0) * jnp.where(valid, err, 0.0) / safe_f

    n = jnp.maximum(valid.sum(axis=1), 1)
    mu = jnp.sum(jnp.where(valid, mag, 0.0), axis=1) / n
    sd = jnp.sqrt(jnp.sum(jnp.where(valid, (mag - mu[:, None]) ** 2, 0.0),
                          axis=1) / n)
    sd = jnp.where(sd > 1e-6, sd, 1.0)
    mag = jnp.where(valid, (mag - mu[:, None]) / sd[:, None], 0.0)
    dmag = jnp.where(valid, dmag / sd[:, None], 0.0)

    t0 = jnp.min(jnp.where(valid, time, jnp.inf), axis=1)
    t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
    rel_t = jnp.where(valid, time - t0[:, None], 0.0)
    return BandSequences(times=rel_t, mags=mag, errs=dmag, mask=valid,
                         n_valid=valid.sum(axis=1))


def make_probe_masks(key, mask, probe_frac: float = 0.5,
                     hide_frac: float = 0.8, random_frac: float = 0.1):
    """ASTROMER/BERT-style probe selection, fully batched.

    probe_frac of valid positions carry the reconstruction loss; of
    those, hide_frac are hidden from the encoder, random_frac get a
    random other magnitude from the same sequence, and the rest stay
    visible (Donoso-Oliva et al. 2022 §3.3 masking strategy).

    Returns (probe [B,T] loss positions, hidden [B,T] positions hidden
    from the encoder, swapped [B,T] positions given a replacement value,
    swap_idx [B,T] the replacement source index per position).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, mask.shape)
    probe = mask & (u < probe_frac)
    v = jax.random.uniform(k2, mask.shape)
    hidden = probe & (v < hide_frac)
    swapped = probe & (v >= hide_frac) & (v < hide_frac + random_frac)
    # random replacement magnitudes: uniform position per row (invalid
    # draws are harmless: swapped positions are valid, replacement values
    # come from where()-guarded mags)
    swap_idx = jax.random.randint(k3, mask.shape, 0, mask.shape[1])
    return probe, hidden, swapped, swap_idx


def pretrain_loss(params, model, batch: BandSequences, key):
    probe, hidden, swapped, swap_idx = make_probe_masks(key, batch.mask)
    swap_vals = jnp.take_along_axis(batch.mags, swap_idx, axis=1)
    mags_in = jnp.where(swapped, swap_vals, batch.mags)
    _, recon = model.apply(params, batch.times, mags_in, batch.errs,
                           batch.mask, probe=hidden)
    se = (recon - batch.mags) ** 2
    w = probe.astype(jnp.float32)
    return jnp.sum(se * w) / jnp.maximum(jnp.sum(w), 1.0)


def pretrain(seqs: BandSequences, d_model: int = 48, n_layers: int = 2,
             n_heads: int = 4, n_steps: int = 1200, batch_size: int = 256,
             lr: float = 1e-3, seed: int = 0,
             eval_every: int = 100) -> Tuple[dict, "SingleBandEncoder", list]:
    """Masked-reconstruction pretraining over a batch of band sequences.

    Returns (params, model, loss_history[(step, loss)...]).
    """
    import optax

    model = SingleBandEncoder(d_model=d_model, n_heads=n_heads,
                              n_layers=n_layers)
    seqs = BandSequences(*(jnp.asarray(a) for a in seqs))  # device-resident
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    n = seqs.times.shape[0]
    params = model.init(k_init, seqs.times[:2], seqs.mags[:2], seqs.errs[:2],
                        seqs.mask[:2])
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        key, k_batch, k_mask = jax.random.split(key, 3)
        idx = jax.random.randint(k_batch, (min(batch_size, n),), 0, n)
        mb = BandSequences(*(a[idx] for a in seqs[:4]), n_valid=seqs.n_valid[idx])
        loss, grads = jax.value_and_grad(pretrain_loss)(params, model, mb,
                                                        k_mask)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, key, loss

    history = []
    for i in range(n_steps):
        params, opt_state, key, loss = step(params, opt_state, key)
        if i % eval_every == 0 or i == n_steps - 1:
            history.append((i, float(loss)))
    return params, model, history


# ---------------------------------------------------------------- artifact IO

def save_pretrained(path, params, config: Dict) -> None:
    """Flatten flax params into an npz + a JSON config entry (atomic write)."""
    import os
    import tempfile

    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(params).items()}
    flat["__config__"] = np.frombuffer(
        json.dumps(config).encode(), dtype=np.uint8)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".npz.tmp")
    with os.fdopen(fd, "wb") as f:  # file handle: savez won't append .npz
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_pretrained(path=None) -> Tuple[dict, SingleBandEncoder, Dict]:
    """Load the pretrained encoder (params, model, config) from an npz."""
    from flax.traverse_util import unflatten_dict

    path = Path(path) if path is not None else DEFAULT_WEIGHTS
    with np.load(path) as z:
        config = json.loads(bytes(z["__config__"]).decode())
        flat = {tuple(k.split("/")): jnp.asarray(z[k])
                for k in z.files if k != "__config__"}
    params = unflatten_dict(flat)
    model = SingleBandEncoder(d_model=config["d_model"],
                              n_heads=config["n_heads"],
                              n_layers=config["n_layers"])
    return params, model, config
