"""Seeded mini-fuzz: broad invariant coverage over random config x shape
combinations (SURVEY.md §4.2 property-test strategy, randomized).

Every draw asserts the universal invariants: finite TC, tcs sorted
decreasing, MI >= 0, correct output shapes, a PSD-ish unit-diagonal
covariance, and a finite score where defined. A randomized f64
seed-matched oracle-parity draw guards the contract from angles the
hand-picked parity shapes might miss."""

import numpy as np
import pytest

import linearcorex_tpu as lc
from linearcorex_tpu.oracle import OracleCorex
from tests.conftest import block_data

_GAUSS = ("none", "standard", "outliers", "empirical")
_OPT = ("momentum", "gd", "fixed_point", "auto")
_MM = ("float32", "bfloat16", "int8")


def _draw(rng):
    m_true = int(rng.randint(1, 5))
    p = int(rng.randint(max(4, m_true * 2), 40))
    n = int(rng.randint(30, 300))
    m = int(rng.randint(1, 7))
    cfg = dict(
        n_hidden=m,
        seed=int(rng.randint(0, 100)),
        tol=10.0 ** -int(rng.randint(3, 5)),
        max_iter=400,
        anneal=bool(rng.randint(0, 2)),
        gaussianize=_GAUSS[rng.randint(0, len(_GAUSS))],
        optimizer=_OPT[rng.randint(0, len(_OPT))],
        matmul_dtype=_MM[rng.randint(0, len(_MM))],
        discourage_overlap=bool(rng.randint(0, 4)),  # mostly True
        moment_strategy=("auto", "samples", "gram")[rng.randint(0, 3)],
    )
    # respect documented constraints instead of skipping
    if not cfg["discourage_overlap"]:
        if cfg["optimizer"] in ("fixed_point",):
            cfg["optimizer"] = "momentum"
        cfg["matmul_dtype"] = "float32"
    if cfg["matmul_dtype"] == "int8":
        cfg["tol"] = max(cfg["tol"], 1e-3)
    x = block_data(n=n, p=p, m=m_true, seed=int(rng.randint(0, 1000)))
    return x, cfg


@pytest.mark.parametrize("trial", range(16))
def test_fuzz_invariants(trial):
    rng = np.random.RandomState(1234 + trial)
    x, cfg = _draw(rng)
    n, p = x.shape
    m = cfg["n_hidden"]
    model = lc.Corex(**cfg)
    with np.errstate(all="ignore"):
        model.fit(x)
    tc = float(model.tc)
    assert np.isfinite(tc), (cfg, x.shape)
    if cfg["discourage_overlap"]:
        # the non-overlap solver maximizes this TC lower bound directly,
        # so a converged fit keeps it non-negative; the overlap path
        # optimizes the exact Gaussian likelihood instead, and the bound
        # can legitimately end negative (it is only a lower bound)
        assert tc >= -1e-3, (tc, cfg)
    tcs = np.asarray(model.tcs)
    assert tcs.shape == (m,)
    assert np.all(np.diff(tcs) <= 1e-5), (tcs, cfg)   # sorted decreasing
    mis = np.asarray(model.mis)
    assert mis.shape == (m, p) and np.all(mis >= -1e-6)
    clusters = np.asarray(model.clusters)
    assert clusters.shape == (p,)
    assert clusters.min() >= 0 and clusters.max() < m
    y = model.transform(x)
    assert y.shape == (n, m)
    xh = model.predict(y)
    assert xh.shape == (n, p) and np.isfinite(np.asarray(xh)).all()
    cov = np.asarray(model.get_covariance(), np.float64)
    assert np.allclose(np.diag(cov / np.outer(
        np.asarray(model.theta.std, np.float64),
        np.asarray(model.theta.std, np.float64))), 1.0, atol=1e-4)
    ev = np.linalg.eigvalsh((cov + cov.T) / 2)
    assert ev.min() > -1e-3 * max(1.0, ev.max()), (ev.min(), cfg)
    v = np.asarray(model.covariance_matvec(np.ones(p)))
    assert np.allclose(v, cov @ np.ones(p), rtol=2e-2, atol=2e-2 * np.abs(
        cov @ np.ones(p)).max())
    if cfg["gaussianize"] in ("none", "standard"):
        assert np.isfinite(float(model.score(x)))


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_oracle_parity_f64(trial):
    """Randomized seed-matched f64 parity: JAX == oracle step-for-step on
    shapes/configs the hand-picked parity tests do not cover."""
    rng = np.random.RandomState(777 + trial)
    m_true = int(rng.randint(1, 4))
    p = int(rng.randint(8, 48))
    n = int(rng.randint(60, 400))
    m = int(rng.randint(1, 6))
    opt = ("momentum", "gd", "fixed_point")[rng.randint(0, 3)]
    anneal = bool(rng.randint(0, 2))
    x = block_data(n=n, p=p, m=m_true, seed=int(rng.randint(0, 1000)))
    w0 = np.random.RandomState(int(rng.randint(0, 1000))).normal(
        scale=1.0 / np.sqrt(p), size=(m, p))
    c = lc.Corex(n_hidden=m, dtype="float64", optimizer=opt,
                 anneal=anneal).fit(x, init_ws=w0)
    o = OracleCorex(n_hidden=m, optimizer=opt, anneal=anneal).fit(
        x, init_ws=w0)
    assert np.asarray(c.diagnostics.iters_per_stage).tolist() == \
        o.history["iters_per_stage"], (opt, anneal, p, n, m)
    assert abs(c.tc - o.tc) < 1e-5 * max(1.0, abs(o.tc))
    assert np.abs(np.asarray(c.ws) - o.ws).max() < 1e-5
