"""Submission CSV writer (reference output contract: object_id,target —
scripts/train_v34a_bazin.py:252-266)."""

from pathlib import Path

import numpy as np
import pandas as pd


def write_submission(path, object_ids, binary_preds) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pd.DataFrame({
        "object_id": np.asarray(object_ids),
        "target": np.asarray(binary_preds).astype(int),
    }).to_csv(path, index=False)
    return path
