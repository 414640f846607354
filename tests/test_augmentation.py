"""Augmentation transforms: shape/mask invariants and statistical effect."""

import jax
import numpy as np
import pytest

from mallorn_tpu.data import augmentation as aug
from mallorn_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def data():
    return generate_dataset(24, seed=3, tde_frac=0.25)


def test_flux_scale(data):
    packed, meta, _ = data
    out = aug.flux_scale(packed, jax.random.PRNGKey(0))
    m = np.asarray(packed.band_mask)
    ratio = np.asarray(out.band_flux)[m] / np.asarray(packed.band_flux)[m]
    assert np.nanmin(ratio[np.isfinite(ratio)]) >= 0.8 - 1e-5
    assert np.nanmax(ratio[np.isfinite(ratio)]) <= 1.2 + 1e-5


def test_time_shift_preserves_cadence(data):
    packed, meta, _ = data
    out = aug.time_shift(packed, jax.random.PRNGKey(1))
    m = np.asarray(packed.band_mask[0, 2])
    dt_old = np.diff(np.asarray(packed.band_time[0, 2])[m])
    dt_new = np.diff(np.asarray(out.band_time[0, 2])[m])
    np.testing.assert_allclose(dt_old, dt_new, rtol=1e-5)


def test_dropout_keeps_minimum(data):
    packed, meta, _ = data
    out = aug.observation_dropout(packed, jax.random.PRNGKey(2), frac=0.9,
                                  min_keep=5)
    nb_old = np.asarray(packed.band_mask).sum(-1)
    nb_new = np.asarray(out.band_mask).sum(-1)
    assert (nb_new[nb_old >= 5] >= 5).all()
    assert nb_new.sum() < nb_old.sum()


def test_snr_degradation_inflates_errors(data):
    packed, meta, _ = data
    out = aug.snr_degradation(packed, jax.random.PRNGKey(3))
    m = np.asarray(packed.band_mask)
    assert (np.asarray(out.band_err)[m] >= np.asarray(packed.band_err)[m] - 1e-6).all()


def test_redshift_augment(data):
    packed, meta, _ = data
    out, meta2 = aug.redshift_augment(packed, meta, jax.random.PRNGKey(4))
    assert not np.allclose(meta2.z, meta.z)
    # time span scales with (1+z')/(1+z)
    i = 0
    m = np.asarray(packed.band_mask[i, 2])
    span_old = np.ptp(np.asarray(packed.band_time[i, 2])[m])
    span_new = np.ptp(np.asarray(out.band_time[i, 2])[m])
    expect = (1 + meta2.z[i]) / (1 + meta.z[i])
    np.testing.assert_allclose(span_new / span_old, expect, rtol=1e-4)


def test_dataset_expansion(data):
    packed, meta, _ = data
    out, mo = aug.augment_dataset(packed, meta, jax.random.PRNGKey(5), n_copies=2)
    assert out.n_objects == 3 * packed.n_objects
    assert len(mo.object_ids) == 3 * packed.n_objects
    assert (mo.target[: packed.n_objects] == meta.target).all()


def test_mixup_only_touches_tdes(data):
    packed, meta, _ = data
    out = aug.tde_mixup(packed, meta, jax.random.PRNGKey(6))
    non = meta.target == 0
    np.testing.assert_array_equal(np.asarray(out.band_flux)[non],
                                  np.asarray(packed.band_flux)[non])
