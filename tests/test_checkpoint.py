"""Checkpoint round-trip tests (SURVEY.md §5 checkpoint/resume)."""

import numpy as np

import linearcorex_tpu as lc
from linearcorex_tpu.utils.checkpoint import load_corex, save_corex


def test_save_load_roundtrip(tmp_path, small_block_data):
    x = small_block_data
    c = lc.Corex(n_hidden=4, seed=0, dtype="float64").fit(x)
    path = str(tmp_path / "model.npz")
    save_corex(c, path)
    c2 = load_corex(path)
    assert np.array_equal(np.asarray(c2.ws), np.asarray(c.ws))
    assert abs(c2.tc - c.tc) < 1e-12
    assert np.array_equal(np.asarray(c2.clusters), np.asarray(c.clusters))
    # inference from the restored model matches
    y1, y2 = np.asarray(c.transform(x)), np.asarray(c2.transform(x))
    assert np.abs(y1 - y2).max() < 1e-12
    cov1, cov2 = np.asarray(c.get_covariance()), np.asarray(
        c2.get_covariance())
    assert np.abs(cov1 - cov2).max() < 1e-12


def test_resume_warm_start(tmp_path, small_block_data):
    x = small_block_data
    c = lc.Corex(n_hidden=4, seed=0).fit(x)
    path = str(tmp_path / "model.npz")
    save_corex(c, path)
    c2 = load_corex(path)
    c2.fit(x)  # warm start from stored ws (rides the full anneal schedule)
    cold_iters = int(np.asarray(c.diagnostics.iters_per_stage).sum())
    warm_iters = int(np.asarray(c2.diagnostics.iters_per_stage).sum())
    assert warm_iters < cold_iters
    assert abs(c2.tc - c.tc) < 1e-2


def test_unfitted_raises(tmp_path):
    import pytest
    with pytest.raises(ValueError):
        save_corex(lc.Corex(n_hidden=2), str(tmp_path / "x.npz"))
