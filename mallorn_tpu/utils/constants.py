"""Survey constants shared across the framework.

Parity contract: LSST band order and central wavelengths follow the
reference data layer (reference: src/utils/data_loader.py:122-130 for the
nm table; src/features/physics_based.py:25-28 and multiband_gp.py:26-29 for
the Angstrom table used by physics/GP features).
"""

LSST_BANDS = ("u", "g", "r", "i", "z", "y")
N_BANDS = len(LSST_BANDS)

BAND_INDEX = {b: i for i, b in enumerate(LSST_BANDS)}

# Central wavelengths in nanometres.
BAND_WAVELENGTHS_NM = {
    "u": 367.0,
    "g": 482.5,
    "r": 622.2,
    "i": 754.5,
    "z": 869.1,
    "y": 971.0,
}

# Effective wavelengths in Angstroms (used by temperature / GP features).
BAND_WAVELENGTHS_A = {
    "u": 3670.0,
    "g": 4825.0,
    "r": 6222.0,
    "i": 7545.0,
    "z": 8691.0,
    "y": 9710.0,
}

# Vector forms in band order, handy for jnp ops.
WAVELENGTHS_NM = tuple(BAND_WAVELENGTHS_NM[b] for b in LSST_BANDS)
WAVELENGTHS_A = tuple(BAND_WAVELENGTHS_A[b] for b in LSST_BANDS)

# Sentinel used to pad time arrays so that a time-sort keeps real
# observations in front of padding.
TIME_PAD = 1.0e9
