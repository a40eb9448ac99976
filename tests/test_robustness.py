"""Edge-case robustness for the estimator surface."""

import numpy as np
import pytest

import linearcorex_tpu as lc
from tests.conftest import block_data


def test_n_hidden_one(small_block_data):
    c = lc.Corex(n_hidden=1, seed=0).fit(small_block_data)
    assert np.asarray(c.tcs).shape == (1,)
    assert np.all(np.asarray(c.clusters) == 0)
    assert np.isfinite(c.tc)


def test_max_iter_one(small_block_data):
    c = lc.Corex(n_hidden=4, seed=0, max_iter=1).fit(small_block_data)
    assert np.all(np.asarray(c.diagnostics.iters_per_stage) == 1)
    assert np.isfinite(c.tc)


def test_huge_tol_stops_immediately(small_block_data):
    c = lc.Corex(n_hidden=4, seed=0, tol=1e9).fit(small_block_data)
    assert int(np.asarray(c.diagnostics.iters_per_stage).sum()) <= 7
    assert np.isfinite(c.tc)


def test_gd_optimizer_still_available(small_block_data):
    c_gd = lc.Corex(n_hidden=4, seed=0, optimizer="gd").fit(small_block_data)
    c_mo = lc.Corex(n_hidden=4, seed=0).fit(small_block_data)
    assert abs(c_gd.tc - c_mo.tc) / c_mo.tc < 0.01
    # momentum converges in fewer total iterations
    assert (np.asarray(c_mo.diagnostics.iters_per_stage).sum()
            < np.asarray(c_gd.diagnostics.iters_per_stage).sum())


def test_constant_column_does_not_nan():
    x = block_data(n=300, p=16, m=2, seed=0)
    x[:, 5] = 3.14  # zero-variance column
    c = lc.Corex(n_hidden=2, seed=0).fit(x)
    assert np.isfinite(c.tc)
    assert np.all(np.isfinite(np.asarray(c.ws)))


def test_more_factors_than_variables():
    x = block_data(n=400, p=8, m=2, seed=1)
    c = lc.Corex(n_hidden=12, seed=0, max_iter=3000).fit(x)
    assert np.isfinite(c.tc)
    # extra factors die: their tcs go to ~0
    assert float(np.asarray(c.tcs)[-1]) < 0.05


def test_nonfinite_free_under_annealing_extremes():
    """Strongly correlated data (rho near 1) with the clip active."""
    x = block_data(n=500, p=24, m=3, seed=2, strength=0.999)
    c = lc.Corex(n_hidden=3, seed=0).fit(x)
    assert np.isfinite(c.tc)
    assert np.all(np.isfinite(np.asarray(c.mis)))


def test_input_validation_errors():
    c = lc.Corex(n_hidden=2)
    with pytest.raises(ValueError, match="2-D"):
        c.fit(np.zeros(10))
    with pytest.raises(ValueError, match="2 samples"):
        c.fit(np.zeros((1, 5)))
    with pytest.raises(ValueError, match="NaN"):
        x = np.random.RandomState(0).normal(size=(50, 5))
        x[3, 2] = np.nan
        c.fit(x)
    with pytest.raises(ValueError, match="NaN/inf"):
        x = np.random.RandomState(0).normal(size=(50, 5))
        x[3, 2] = np.inf
        c.fit(x)


def test_nan_ok_with_missing_values_sentinel():
    x = block_data(n=200, p=8, m=2, seed=0)
    x[5, 3] = -999.0
    c = lc.Corex(n_hidden=2, missing_values=-999.0, seed=0).fit(x)
    assert np.isfinite(c.tc)


def test_nan_sentinel_missing_values():
    """missing_values=np.nan works (NaN != NaN needs an isnan path)."""
    x = block_data(n=300, p=16, m=2, seed=4)
    x_nan = x.copy()
    x_nan[::6, 3] = np.nan
    c = lc.Corex(n_hidden=2, missing_values=float("nan"), seed=0,
                 dtype="float64").fit(x_nan)
    assert np.isfinite(c.tc)
    from linearcorex_tpu.oracle import OracleCorex
    o = OracleCorex(n_hidden=2, missing_values=float("nan"), seed=0).fit(
        x_nan)
    assert abs(c.tc - o.tc) < 1e-5


def test_native_nan_impute():
    from linearcorex_tpu.utils import native
    if not native.available():
        return
    x = np.random.RandomState(0).normal(size=(100, 4))
    x[::5, 1] = np.nan
    got = native.mean_impute(x, float("nan"))
    ref = x.copy()
    mask = np.isnan(ref[:, 1])
    ref[mask, 1] = ref[~mask, 1].mean()
    assert np.abs(got - ref).max() < 1e-12


def test_unfitted_errors_are_clear(small_block_data):
    c = lc.Corex(n_hidden=2)
    with pytest.raises(lc.NotFittedError, match="not fitted"):
        c.transform(small_block_data)
    with pytest.raises(lc.NotFittedError, match="not fitted"):
        c.predict(np.zeros((5, 2)))
    with pytest.raises(lc.NotFittedError, match="not fitted"):
        c.get_covariance()


def test_refit_different_width_reinitializes(small_block_data):
    c = lc.Corex(n_hidden=3, seed=1).fit(small_block_data[:, :16])
    c.fit(small_block_data[:, :24])  # must not crash on stale warm-start
    assert c.nv == 24
    assert np.isfinite(c.tc)


def test_init_ws_shape_mismatch_raises(small_block_data):
    c = lc.Corex(n_hidden=3)
    with pytest.raises(ValueError, match="init_ws shape"):
        c.fit(small_block_data, init_ws=np.zeros((3, 7)))


def test_fixed_point_degenerate_rank1_no_crash():
    """Near-rank-1 data drives rho to the clip boundary; the fixed-point
    update's m x m system approaches singularity — the damped accept/
    reject must still finish with a finite (if suboptimal, per DESIGN.md)
    fit rather than NaN weights."""
    import linearcorex_tpu as lc
    rng = np.random.RandomState(0)
    z = rng.normal(size=(400, 1))
    x = np.repeat(z, 16, axis=1) + 1e-6 * rng.normal(size=(400, 16))
    m = lc.Corex(n_hidden=3, seed=0, optimizer="fixed_point",
                 dtype="float64").fit(x)
    assert np.isfinite(m.tc)
    assert np.isfinite(np.asarray(m.ws)).all()


def test_inference_width_validation(small_block_data):
    """Wrong-width inference inputs raise clear ValueErrors instead of raw
    broadcasting TypeErrors; max_iter/n_hidden bounds validate."""
    c = lc.Corex(n_hidden=4, seed=0).fit(small_block_data)
    bad = np.zeros((5, small_block_data.shape[1] + 1))
    for call in (c.transform, c.score):
        with pytest.raises(ValueError, match="columns"):
            call(bad)
    with pytest.raises(ValueError, match="n_hidden"):
        c.predict(np.zeros((5, 3)))
    # config-bound validation is deferred to first use (sklearn contract)
    with pytest.raises(ValueError, match="max_iter"):
        lc.Corex(n_hidden=2, max_iter=0).fit(small_block_data)
    with pytest.raises(ValueError, match="n_hidden"):
        lc.Corex(n_hidden=0).fit(small_block_data)
