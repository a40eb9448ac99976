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
        stage_tol_factor=(1.0, 10.0)[rng.randint(0, 2)],
        # round-4/5 knobs: the staged-subsample driver and the vmapped
        # restart sweep ride the same invariant battery
        stage_subsample=(1.0, 0.5, 0.25)[rng.randint(0, 3)],
        n_restarts=int(rng.randint(1, 4)),
        # round-5: spectral sweeps are legal (per-lane random
        # projections) — the fuzz draws them too
        init=("random", "random", "spectral")[rng.randint(0, 3)],
    )
    # respect documented constraints instead of skipping
    if cfg["init"] == "spectral":
        # the documented pairing: spectral + anneal=True is measured
        # HARMFUL (config.py warns) — fuzz draws the legal recipe
        cfg["anneal"] = False
    if not cfg["discourage_overlap"]:
        if cfg["optimizer"] in ("fixed_point",):
            cfg["optimizer"] = "momentum"
        cfg["matmul_dtype"] = "float32"
    if cfg["matmul_dtype"] == "int8":
        cfg["tol"] = max(cfg["tol"], 1e-3)
    if cfg["n_restarts"] > 1:
        # n_restarts x active stage_subsample raises by name (the sweep
        # is one vmapped program over the whole schedule; whether the
        # subsample is ACTIVE depends on the resolved strategy, which
        # 'auto' decides by shape) — pinned in
        # tests/test_restarts_estimator.py; the fuzz draws legal configs
        cfg["stage_subsample"] = 1.0
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


_MESH_LAYOUTS = (
    # (mesh axes, plan kwargs) — every production layout incl. 2-level
    ((("data", 8),), dict()),
    ((("data", 4), ("model", 2)), dict(shard_factors=True)),
    ((("var", 8),), dict(shard_samples=False, shard_vars=True)),
    ((("slice", 2), ("data", 4)), dict(shard_slices=True)),
    ((("slice", 2), ("model", 4)),
     dict(shard_samples=False, shard_slices=True, shard_factors=True)),
)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_round3_surface(trial):
    """Randomized coverage of the round-3 surface: blocked covariance
    export ≡ dense, matmat ≡ dense, warmup-then-fit, and a random mesh
    layout reproducing the single-device fit (f64)."""
    from linearcorex_tpu.parallel.sharding import ShardingPlan, make_mesh

    rng = np.random.RandomState(31337 + trial)
    m_true = int(rng.randint(2, 5))
    # shapes divisible by every layout's axis extents (8 devices; the
    # divisibility requirement itself is tested by name below)
    p = int(rng.randint(2, 9)) * 8
    n = int(rng.randint(8, 50)) * 8
    m = int(rng.randint(1, 3)) * 4
    x = block_data(n=n, p=p, m=m_true, seed=int(rng.randint(0, 1000)))
    model = lc.Corex(n_hidden=m, dtype="float64", seed=0,
                     record_history=False)
    model.warmup(n, p)
    model.fit(x)
    cov = np.asarray(model.get_covariance())
    bs = int(rng.randint(1, p + 5))
    out = np.vstack([np.asarray(r) for _, r in
                     model.covariance_blocks(bs)])
    assert out.shape == cov.shape
    assert np.abs(out - cov).max() < 1e-8, (bs, p)
    k = int(rng.randint(1, 6))
    v = rng.normal(size=(p, k))
    assert np.abs(np.asarray(model.covariance_matmat(v))
                  - cov @ v).max() < 1e-8

    axes, plan_kw = _MESH_LAYOUTS[rng.randint(0, len(_MESH_LAYOUTS))]
    mesh = make_mesh(tuple(axes))
    w0 = np.random.RandomState(5).normal(scale=1 / np.sqrt(p),
                                         size=(m, p))
    ref = lc.Corex(n_hidden=m, dtype="float64", record_history=False,
                   moment_strategy="samples").fit(x, init_ws=w0)
    msh = lc.Corex(n_hidden=m, dtype="float64", record_history=False,
                   moment_strategy="samples").fit(
        x, init_ws=w0, mesh=mesh, sharding_plan=ShardingPlan(**plan_kw))
    assert abs(msh.tc - ref.tc) < 1e-7, (axes, plan_kw)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_int8_guard_no_false_raise(trial):
    """The wrap guard never RAISES on standardized Gaussian-ish data of
    random shapes (raising is reserved for demonstrated wraps)."""
    from linearcorex_tpu.ops import moments as M
    import jax.numpy as jnp

    rng = np.random.RandomState(4242 + trial)
    n = int(rng.randint(2, 500))
    p = int(rng.randint(2, 500))
    x = rng.normal(size=(n, p)).astype(np.float32)
    x = (x - x.mean(0)) / np.maximum(x.std(0), 1e-6)
    qd = M.quantize_samples(jnp.asarray(x))
    assert qd.q.shape == (n, p)


def test_sharding_divisibility_errors_are_named():
    """Non-divisible shapes fail FAST with the dimension named, not with
    GSPMD's opaque device_put exception (found by the round-3 fuzzer)."""
    from linearcorex_tpu.config import CorexConfig
    from linearcorex_tpu.parallel.sharding import (ShardingPlan,
                                                   fit_shard_map,
                                                   fit_sharded, make_mesh)
    import jax.numpy as jnp

    x = jnp.asarray(block_data(n=100, p=55, m=3, seed=0)[:, :55],
                    jnp.float32)
    w = jnp.zeros((5, 55), jnp.float32)
    cfg = CorexConfig(n_hidden=5, max_iter=2, record_history=False)
    mesh = make_mesh((("data", 4), ("model", 2)))
    with pytest.raises(ValueError, match="n_hidden"):
        fit_sharded(x, w, cfg, mesh,
                    ShardingPlan(shard_factors=True))
    with pytest.raises(ValueError, match="n_samples"):
        fit_sharded(x[:99], w, cfg, mesh, ShardingPlan())
    with pytest.raises(ValueError, match="n_variables"):
        fit_sharded(x, w, cfg, make_mesh((("var", 8),)),
                    ShardingPlan(shard_samples=False, shard_vars=True))
    with pytest.raises(ValueError, match="sample rows"):
        fit_shard_map(x[:99], w, cfg, make_mesh())


def test_restart_sharding_divisibility_named():
    from linearcorex_tpu.config import CorexConfig
    from linearcorex_tpu.parallel.restarts import (fit_restarts_sharded,
                                                   init_restarts)
    from linearcorex_tpu.parallel.sharding import make_mesh
    import jax.numpy as jnp

    x = jnp.asarray(block_data(n=64, p=16, m=2, seed=0), jnp.float32)
    w0 = init_restarts(5, 2, 16, seed=0, dtype=jnp.float32)  # 5 % 8 != 0
    cfg = CorexConfig(n_hidden=2, max_iter=2, record_history=False)
    with pytest.raises(ValueError, match="restart batch"):
        fit_restarts_sharded(x, w0, cfg, "samples",
                             make_mesh((("restarts", 8),)))


_R4_PLANS = (
    dict(),                                       # DP (sample rows)
    dict(shard_samples=True, shard_vars=True),    # DP x SP
    dict(shard_samples=False, shard_vars=True),   # SP only
)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_round4_mesh_prepare(trial):
    """Randomized coverage of the round-4 mesh-aware prepare:
    fit(mesh=...) under a random plan / gaussianize / moment strategy
    either reproduces the single-device fit (divisible shapes, f64,
    1e-7) or fails by NAME on a non-divisible sample count — never via
    GSPMD's opaque device_put exception. The named-error arm covers
    every strategy, because the prepare shards the RAW X per the plan
    regardless of the operand (the round-4 gram/raw-X divisibility
    finding's class)."""
    import warnings

    from linearcorex_tpu.parallel.sharding import ShardingPlan, make_mesh

    rng = np.random.RandomState(88000 + trial)
    p = int(rng.randint(2, 6)) * 8
    n = int(rng.randint(8, 30)) * 8
    m = int(rng.randint(1, 3)) * 2
    gauss = ("none", "standard", "empirical")[rng.randint(0, 3)]
    strat = ("auto", "samples", "gram")[rng.randint(0, 3)]
    plan = ShardingPlan(**_R4_PLANS[rng.randint(0, len(_R4_PLANS))])
    mesh = (make_mesh((("data", 4), ("var", 2))) if plan.shard_vars
            else make_mesh())
    x = block_data(n=n, p=p, m=2, seed=int(rng.randint(0, 1000)))
    w0 = np.random.RandomState(5).normal(scale=1 / np.sqrt(p), size=(m, p))
    kw = dict(n_hidden=m, dtype="float64", record_history=False,
              gaussianize=gauss, moment_strategy=strat)
    with warnings.catch_warnings():
        # explicit 'gram' + a sample-only plan warns (documented); the
        # fuzz draw asserts equivalence, not the warning
        warnings.simplefilter("ignore")
        ref = lc.Corex(**kw).fit(x, init_ws=w0)
        msh = lc.Corex(**kw).fit(x, init_ws=w0, mesh=mesh,
                                 sharding_plan=plan)
        assert abs(msh.tc - ref.tc) < 1e-7, (gauss, strat, plan)
        if plan.shard_samples:
            with pytest.raises(ValueError, match="n_samples"):
                lc.Corex(**kw).fit(x[:-1], init_ws=w0, mesh=mesh,
                                   sharding_plan=plan)
