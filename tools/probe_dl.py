"""DL-baseline training on the real chip at competition scale.

The reference's DL family are documented failures (LSTM/Transformer F1
0.10-0.12, ATAT 0.50 after ~2 h on an RTX 3080 — reference
BENCHMARKS.md:32-60). This probe trains the Flax ports on the bench
train split (3,054 objects, 80/20 split) and records wall time + val F1
— the capability-parity evidence plus the TPU speed story.

Run SOLO; scratch AOT dir (probe hygiene).
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["MALLORN_AOT_CACHE"] = "/tmp/aot_scratch"
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax.numpy as jnp

    import bench
    from mallorn_tpu.data.packing import Metadata, PackedLightcurves
    from mallorn_tpu.models import (ATAT, GRUClassifier, LSTMClassifier,
                                    TransformerClassifier)
    from mallorn_tpu.models.data import make_band_batch, make_sequence_batch
    from mallorn_tpu.models.train_dl import train_model

    (tr_packed, tr_meta), _ = bench.get_data()
    n = tr_packed.n_objects
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    tr_idx, va_idx = perm[: int(0.8 * n)], perm[int(0.8 * n):]

    def subset(idx, make_batch=make_sequence_batch):
        fields = [np.asarray(x)[idx] if hasattr(x, "ndim") and x.ndim >= 1
                  else x for x in tr_packed[:-1]]
        p = PackedLightcurves(*fields, time_offset=tr_packed.time_offset)
        m = Metadata(object_ids=tr_meta.object_ids[idx],
                     z=tr_meta.z[idx], ebv=tr_meta.ebv[idx],
                     target=tr_meta.target[idx])
        return make_batch(p, m)

    b_tr, b_va = subset(tr_idx), subset(va_idx)
    g_tr, g_va = (subset(tr_idx, make_band_batch),
                  subset(va_idx, make_band_batch))
    print(f"train batch: {b_tr.features.shape}, "
          f"val: {b_va.features.shape}", flush=True)

    out = {}
    for name, model, tab, btr, bva in (
        ("lstm_v10", LSTMClassifier(hidden_dim=64), False, b_tr, b_va),
        ("transformer_v13", TransformerClassifier(d_model=64, n_layers=2),
         False, b_tr, b_va),
        ("atat_v22", ATAT(embed_dim=32, n_lc_layers=2, n_tab_layers=2),
         True, b_tr, b_va),
        ("gru_v27", GRUClassifier(), False, g_tr, g_va),
    ):
        kw = {}
        if tab:
            t_tr = jnp.concatenate(
                [btr.meta, btr.features[:, :, 0].mean(1, keepdims=True)], 1)
            t_va = jnp.concatenate(
                [bva.meta, bva.features[:, :, 0].mean(1, keepdims=True)], 1)
            kw = {"tabular": t_tr, "val_tabular": t_va}
        n_params = None
        t0 = time.perf_counter()
        res = train_model(model, btr, val_batch=bva, n_epochs=300,
                          lr=1e-3, **kw)
        dt = time.perf_counter() - t0
        try:
            import jax as _jax

            n_params = int(sum(np.prod(p.shape)
                               for p in _jax.tree.leaves(res.params)))
        except Exception:
            pass
        out[name] = {"seconds": round(dt, 1), "val_f1": round(res.val_f1, 4),
                     "epochs": 300, "n_params": n_params}
        print(f"{name}: {dt:.1f}s for 300 full-batch epochs, "
              f"val F1={res.val_f1:.4f} @ {res.threshold:.3f}", flush=True)

    print(json.dumps(out))
    (Path(__file__).parent / "probe_dl.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
