"""MALLORN-TPU: a TPU-native lightcurve-classification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
MALLORN Astronomical Classification Challenge reference solution
(TDE vs non-TDE binary classification of LSST lightcurves):

- batched, vmapped feature-extraction kernels over all objects x 6 bands
  (statistics, colors, shape, physics, Bazin/power-law NLLS fits, 2D GP),
- a TPU histogram gradient-boosted-tree trainer with ICI allreduce,
- adversarial-validation reweighting, CV orchestration, threshold sweeps,
- a staged feature store and submission writer.

The object axis is the batch axis; every kernel takes (values, mask) padded
arrays and is shardable over a 1-D device mesh with `shard_map`.
"""

__version__ = "0.1.0"

from mallorn_tpu.utils.constants import LSST_BANDS, BAND_WAVELENGTHS_NM, BAND_WAVELENGTHS_A
