"""Native C++ CSV parser: build, parse, and parity with the pandas path."""

import numpy as np
import pytest

from mallorn_tpu.io import native


def test_native_builds():
    assert native.available(), "g++ build of fast_csv.so failed"


def test_native_matches_pandas(tmp_path, tiny_dataset):
    from mallorn_tpu.data.loader import load_all_data
    from mallorn_tpu.data.synthetic import write_reference_layout

    packed0, meta0, cols = tiny_dataset
    write_reference_layout(tmp_path, cols, meta0, split="train")

    nat = load_all_data(tmp_path, use_native=True)
    pan = load_all_data(tmp_path, use_native=False)

    pn, pp = nat["train_packed"], pan["train_packed"]
    assert pn.band_time.shape == pp.band_time.shape
    np.testing.assert_array_equal(np.asarray(pn.band_mask), np.asarray(pp.band_mask))
    np.testing.assert_allclose(np.asarray(pn.band_flux), np.asarray(pp.band_flux),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pn.all_time), np.asarray(pp.all_time),
                               rtol=1e-6, atol=1e-4)
    assert (nat["train_meta"].object_ids == pan["train_meta"].object_ids).all()


def test_native_parse_direct(tmp_path):
    p = tmp_path / "lc.csv"
    p.write_text(
        "object_id,Time (MJD),Flux,Flux_err,Filter\n"
        "OBJ1,60001.5,10.25,0.5,g\n"
        "OBJ1,60002.5,11.0,0.5,r\n"
        "OBJ2,60003.0,-3.5,1.25,u\n"
        "OBJ1,60004.0,9.0,0.4,g\n")
    d = native.parse_lightcurves(p)
    assert d is not None
    assert list(d["object_ids"]) == ["OBJ1", "OBJ2"]
    np.testing.assert_array_equal(d["object_index"], [0, 0, 1, 0])
    np.testing.assert_allclose(d["time"], [60001.5, 60002.5, 60003.0, 60004.0])
    np.testing.assert_allclose(d["flux"], [10.25, 11.0, -3.5, 9.0])
    np.testing.assert_array_equal(d["band"], [1, 2, 0, 1])


def test_native_empty_field_is_nan(tmp_path):
    """An empty or non-numeric numeric field parses as NaN (pandas
    semantics) — bare strtod would silently turn an empty Flux into 0.0."""
    p = tmp_path / "lc.csv"
    p.write_text(
        "object_id,Time (MJD),Flux,Flux_err,Filter\n"
        "OBJ1,60001.5,,0.5,g\n"
        "OBJ1,60002.5,11.0,junk,r\n"
        "OBJ1,60003.5,1e30,0.5,i\n")
    d = native.parse_lightcurves(p)
    assert d is not None
    assert np.isnan(d["flux"][0]) and d["flux"][2] == 1e30
    assert np.isnan(d["flux_err"][1])
    np.testing.assert_allclose(d["time"], [60001.5, 60002.5, 60003.5])
