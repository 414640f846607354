"""Reproduce the in-repo pretrained ASTROMER-style encoder artifact.

The reference downloads external pretrained ASTROMER weights
(reference: scripts/download_astromer_weights.py, src/features/
astromer_embeddings.py:32-50). This environment cannot, so the shipped
artifact mallorn_tpu/artifacts/astromer_selfsup_synthetic.npz is produced
by THIS script: masked-reconstruction pretraining (Donoso-Oliva et al.
2022 objective) of models/astromer.SingleBandEncoder on single-band
sequences drawn from the in-repo synthetic light-curve generator.

Deterministic given the seed. Run:  python tools/pretrain_astromer.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_sequences(n_objects: int, seed: int):
    """All-band pretraining corpus: each (object, band) with >=5 valid
    points is one single-band training sequence."""
    import jax.numpy as jnp

    from mallorn_tpu.data.synthetic import generate_dataset
    from mallorn_tpu.models.astromer import BandSequences, normalize_band

    packed, _meta, _cols = generate_dataset(n_objects=n_objects, seed=seed)
    nb = packed.band_time.shape[0] * packed.band_time.shape[1]
    t = packed.band_time.reshape(nb, -1)
    f = packed.band_flux.reshape(nb, -1)
    e = packed.band_err.reshape(nb, -1)
    m = packed.band_mask.reshape(nb, -1)
    seqs = normalize_band(t, f, e, m)
    keep = np.asarray(seqs.n_valid) >= 5
    return BandSequences(*(jnp.asarray(np.asarray(a)[keep]) for a in seqs))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-objects", type=int, default=5000)
    ap.add_argument("--n-steps", type=int, default=4000)
    ap.add_argument("--d-model", type=int, default=48)
    ap.add_argument("--n-heads", type=int, default=4)
    ap.add_argument("--n-layers", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from mallorn_tpu.models.astromer import (DEFAULT_WEIGHTS, pretrain,
                                             save_pretrained)

    t0 = time.perf_counter()
    seqs = build_sequences(args.n_objects, seed=args.seed + 1)
    print(f"corpus: {seqs.times.shape[0]} single-band sequences, "
          f"T={seqs.times.shape[1]} ({time.perf_counter() - t0:.1f}s)")

    params, _model, history = pretrain(
        seqs, d_model=args.d_model, n_layers=args.n_layers,
        n_heads=args.n_heads, n_steps=args.n_steps, seed=args.seed)
    for step, loss in history:
        print(f"  step {step:5d}  masked-recon MSE {loss:.4f}")

    config = {"d_model": args.d_model, "n_heads": args.n_heads,
              "n_layers": args.n_layers, "n_steps": args.n_steps,
              "n_objects": args.n_objects, "seed": args.seed,
              "corpus": "mallorn_tpu.data.synthetic.generate_dataset",
              "objective": "masked magnitude reconstruction "
                           "(Donoso-Oliva et al. 2022)",
              "final_loss": history[-1][1]}
    out = Path(args.out) if args.out else DEFAULT_WEIGHTS
    save_pretrained(out, params, config)
    size_kb = out.stat().st_size / 1024
    print(f"saved {out} ({size_kb:.0f} KB), "
          f"loss {history[0][1]:.4f} -> {history[-1][1]:.4f} "
          f"in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
