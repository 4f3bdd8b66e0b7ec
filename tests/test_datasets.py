"""Dataset registry tests (small sets + one synthesized BAL config)."""

import numpy as np
import pytest

from psba_tpu import datasets
from tests.conftest import requires_data


@requires_data
def test_registry_complete_sets():
    p = datasets.load("7camsvarK")
    assert p.n_cams == 7 and p.n_pts == 465
    p3 = datasets.load("3cams")
    assert p3.n_cams == 3  # shared-K fill-in for the 7-column file


@requires_data
def test_registry_synthesized(tmp_path):
    p = datasets.load("trafalgar50", cache_dir=str(tmp_path))
    assert p.n_cams == 50
    assert p.n_pts == 20431
    # every point observed >= 2 times, all cameras referenced sanely
    counts = np.bincount(p.pt_idx, minlength=p.n_pts)
    assert counts.min() >= 2
    assert p.cam_idx.max() < 50
    # cache hit returns identical arrays
    p2 = datasets.load("trafalgar50", cache_dir=str(tmp_path))
    np.testing.assert_array_equal(p.obs, p2.obs)


def test_registry_names():
    assert "venice52" in datasets.names()
    with pytest.raises(KeyError):
        datasets.load("nope")
