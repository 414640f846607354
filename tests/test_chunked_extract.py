"""chunked_extract must be bit-equivalent to a single-shot extraction."""

import numpy as np
import pytest

from mallorn_tpu.features import statistical, tde
from mallorn_tpu.features.base import chunked_extract


@pytest.mark.slow
def test_chunked_equals_whole(small_dataset):
    packed, meta, _ = small_dataset  # 64 objects
    whole = statistical.extract(packed, meta)
    chunked = chunked_extract(statistical.extract, packed, meta, chunk_size=24)
    assert set(whole) == set(chunked)
    for k in whole:
        np.testing.assert_array_equal(np.asarray(whole[k]),
                                      np.asarray(chunked[k]), err_msg=k)


def test_chunked_no_meta(small_dataset):
    packed, meta, _ = small_dataset
    whole = tde.extract(packed)
    chunked = chunked_extract(tde.extract, packed, chunk_size=20)
    for k in whole:
        np.testing.assert_array_equal(np.asarray(whole[k]),
                                      np.asarray(chunked[k]), err_msg=k)
