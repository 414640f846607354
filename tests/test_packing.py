"""Packing invariants: masks, sorting, round-trip vs the flat columns."""

import numpy as np

from mallorn_tpu.utils.constants import N_BANDS, TIME_PAD


def test_counts_match(small_dataset):
    packed, meta, cols = small_dataset
    n = packed.n_objects
    for i in range(0, n, 17):
        sel = cols["object_index"] == i
        assert int(packed.all_mask[i].sum()) == int(sel.sum())
        for b in range(N_BANDS):
            selb = sel & (cols["band"] == b)
            assert int(packed.band_mask[i, b].sum()) == int(selb.sum())


def test_band_view_time_sorted(small_dataset):
    packed, _, _ = small_dataset
    bt = np.asarray(packed.band_time)
    bm = np.asarray(packed.band_mask)
    # valid prefix is contiguous and sorted; padding is TIME_PAD
    diffs = np.diff(bt, axis=-1)
    assert (diffs >= 0).all()  # TIME_PAD keeps sorted order
    assert (bt[~bm] == TIME_PAD).all()
    # mask is a prefix
    first_invalid = bm.shape[-1] - bm[..., ::-1].argmax(axis=-1)
    assert ((bm.cumsum(axis=-1) <= first_invalid[..., None])).all()


def test_values_roundtrip(small_dataset):
    packed, _, cols = small_dataset
    i = 3
    sel = cols["object_index"] == i
    want = np.sort(cols["flux"][sel])
    got = np.sort(np.asarray(packed.all_flux[i])[np.asarray(packed.all_mask[i])])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_all_view_band_ids(small_dataset):
    packed, _, cols = small_dataset
    i = 5
    sel = cols["object_index"] == i
    order = np.argsort(cols["time"][sel], kind="stable")
    want = cols["band"][sel][order]
    got = np.asarray(packed.all_band[i])[np.asarray(packed.all_mask[i])]
    # same multiset per timestamp; exact order can differ on ties
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_pad_objects(small_dataset):
    from mallorn_tpu.data.packing import pad_objects

    packed, _, _ = small_dataset
    p2 = pad_objects(packed, packed.n_objects + 5)
    assert p2.n_objects == packed.n_objects + 5
    assert not bool(p2.all_mask[-1].any())
