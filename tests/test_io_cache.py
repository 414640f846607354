"""Feature cache (io/cache.py): roundtrip, load-or-compute, self-heal.

The staged-artifact store is the reference's pickle-cache analog
(SURVEY §5.4, "if cache exists load, else compute and dump"); these pin
the npz+manifest contract plus the crash-safety behaviors the pickles
never had (atomic writes, corrupt-entry recovery)."""

import json

import numpy as np
import pytest

from mallorn_tpu.io.cache import cached, load_features, save_features


@pytest.fixture
def feats():
    return {"a": np.arange(5.0), "b": np.full(5, np.nan)}, \
        np.array([f"OBJ{i}" for i in range(5)])


def test_roundtrip(tmp_path, feats):
    f, ids = feats
    save_features(tmp_path / "fam_train.npz", f, ids)
    mat, names, oids = load_features(tmp_path / "fam_train.npz")
    assert names == ["a", "b"]
    np.testing.assert_array_equal(mat[:, 0], f["a"])
    assert np.isnan(mat[:, 1]).all()
    assert list(oids) == list(ids)
    assert not list(tmp_path.glob("*.tmp*"))  # atomic writes leave nothing


def test_cached_hits_without_recompute(tmp_path, feats):
    f, ids = feats
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return f

    m1, _, _ = cached(tmp_path / "fam.npz", compute, ids)
    m2, _, _ = cached(tmp_path / "fam.npz", lambda: 1 / 0, ids)
    assert calls["n"] == 1
    np.testing.assert_array_equal(m1, m2)


def test_cached_self_heals_corrupt_entry(tmp_path, feats):
    f, ids = feats
    npz = tmp_path / "fam.npz"
    cached(npz, lambda: f, ids)
    npz.write_bytes(npz.read_bytes()[: 40])  # truncated by a crash
    mat, names, _ = cached(npz, lambda: f, ids)
    assert names == ["a", "b"]
    np.testing.assert_array_equal(mat[:, 0], f["a"])
    # and the healed entry is valid on a plain load
    load_features(npz)
    assert json.loads(
        npz.with_suffix(".manifest.json").read_text())["names"] == ["a", "b"]


def test_entry_is_self_contained(tmp_path, feats):
    """Names live inside the npz: the entry is ONE atomic file, immune to
    manifest/matrix generation skew, and loads with the sidecar manifest
    deleted."""
    f, ids = feats
    npz = tmp_path / "fam.npz"
    save_features(npz, f, ids)
    npz.with_suffix(".manifest.json").unlink()
    mat, names, _ = load_features(npz)
    assert names == ["a", "b"]
    # a mismatched-generation pairing (old 1-col npz + new 2-col names)
    # is detected, and cached() heals it
    import numpy as np2

    np2.savez(tmp_path / "skew.npz", matrix=np.zeros((5, 1)),
              object_ids=ids.astype(str), names=np.array(["a", "b"]))
    with pytest.raises(ValueError, match="mismatched generations"):
        load_features(tmp_path / "skew.npz")
    mat, names, _ = cached(tmp_path / "skew.npz", lambda: f, ids)
    assert names == ["a", "b"] and mat.shape == (5, 2)
