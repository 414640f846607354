"""Convert flat synthetic columns into the reference DataFrame schema."""

import numpy as np
import pandas as pd

from mallorn_tpu.utils.constants import LSST_BANDS


def to_reference_frames(cols, meta):
    """Returns (lightcurves_df, metadata_df) in the reference CSV schema."""
    band_names = np.array(LSST_BANDS)
    lc = pd.DataFrame({
        "object_id": meta.object_ids[cols["object_index"]],
        "Time (MJD)": cols["time"],
        "Flux": cols["flux"],
        "Flux_err": cols["flux_err"],
        "Filter": band_names[cols["band"]],
    })
    log = pd.DataFrame({
        "object_id": meta.object_ids,
        "Z": meta.z,
        "EBV": meta.ebv,
    })
    if meta.target is not None:
        log["target"] = meta.target
    return lc, log
