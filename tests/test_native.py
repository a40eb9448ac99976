"""Native C++ preprocessing library vs the scipy reference."""

import numpy as np
import pytest
from scipy.stats import norm, rankdata

from linearcorex_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_ndtri_matches_scipy():
    p = np.linspace(1e-12, 1 - 1e-12, 10001)
    got = native.ndtri(p)
    want = norm.ppf(p)
    assert np.abs(got - want).max() < 1e-12


def test_empirical_gaussianize_matches_scipy():
    rng = np.random.RandomState(0)
    x = rng.lognormal(size=(500, 7))
    x[::13, 2] = x[0, 2]  # inject ties
    got = native.empirical_gaussianize(x)
    n = x.shape[0]
    want = np.empty_like(x)
    for j in range(x.shape[1]):
        want[:, j] = norm.ppf((rankdata(x[:, j]) - 0.5) / n)
    assert np.abs(got - want).max() < 1e-12


def test_mean_impute_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.normal(size=(200, 5))
    x[::7, 1] = -999.0
    x[:, 4] = -999.0  # fully missing column → zeros
    got = native.mean_impute(x, -999.0)
    ref = x.copy()
    for j in range(5):
        mask = ref[:, j] == -999.0
        obs = ref[~mask, j]
        ref[mask, j] = obs.mean() if obs.size else 0.0
    assert np.abs(got - ref).max() < 1e-12


def test_oracle_uses_native_consistently():
    """The oracle preprocessing (scipy path) and the native path agree, so
    either can feed the solver."""
    from linearcorex_tpu.oracle.oracle import _Preprocessor
    rng = np.random.RandomState(2)
    x = rng.lognormal(size=(300, 6))
    pre = _Preprocessor(gaussianize="empirical")
    want = pre.fit_transform(x)
    got = native.empirical_gaussianize(x)
    assert np.abs(got - want).max() < 1e-12


def test_corex_host_preprocess_matches_device():
    """Corex.fit with the native host gaussianize equals the device path."""
    import linearcorex_tpu as lc
    rng = np.random.RandomState(3)
    x = rng.lognormal(size=(400, 24))
    w0 = rng.normal(scale=1 / np.sqrt(24), size=(4, 24))
    c_host = lc.Corex(n_hidden=4, gaussianize="empirical",
                      dtype="float64").fit(x, init_ws=w0)  # native path
    import jax.numpy as jnp
    c_dev = lc.Corex(n_hidden=4, gaussianize="empirical",
                     dtype="float64").fit(jnp.asarray(x), init_ws=w0)
    # AS241 (native) vs jax ndtri differ at ~1e-9 per value; the fit
    # amplifies this slightly
    assert abs(c_host.tc - c_dev.tc) < 1e-5
    assert np.abs(np.asarray(c_host.ws) - np.asarray(c_dev.ws)).max() < 1e-3
