"""Streaming Gram accumulation: batched fit == in-memory fit."""

import numpy as np
import pytest

import linearcorex_tpu as lc
from linearcorex_tpu.utils.streaming import GramAccumulator
from tests.conftest import block_data


def test_streaming_equals_in_memory():
    x = block_data(n=1200, p=64, m=8, seed=0)
    acc = GramAccumulator(p=64, dtype="float64")
    for start in range(0, 1200, 256):   # uneven final batch on purpose
        acc.update(x[start:start + 256])
    assert acc.n_samples == 1200
    m_stream = acc.fit(n_hidden=8, seed=0)
    m_mem = lc.Corex(n_hidden=8, seed=0, dtype="float64",
                     moment_strategy="gram").fit(x)
    assert abs(m_stream.tc - m_mem.tc) < 1e-6
    assert np.abs(np.asarray(m_stream.ws) - np.asarray(m_mem.ws)).max() < 1e-6
    assert np.array_equal(np.asarray(m_stream.clusters),
                          np.asarray(m_mem.clusters))
    # inference from the streamed model matches too
    y_s = np.asarray(m_stream.transform(x))
    y_m = np.asarray(m_mem.transform(x))
    assert np.abs(y_s - y_m).max() < 1e-6


def test_streaming_correlation_matches_numpy():
    x = block_data(n=500, p=16, m=2, seed=1)
    acc = GramAccumulator(p=16, dtype="float64")
    acc.update(x[:200]).update(x[200:])
    corr = np.asarray(acc.correlation())
    want = np.corrcoef(x.T)
    assert np.abs(corr - want).max() < 1e-10


def test_streaming_validation():
    acc = GramAccumulator(p=8)
    with pytest.raises(ValueError, match="at least 2"):
        acc.fit(n_hidden=2)
    with pytest.raises(ValueError, match="expected batch"):
        acc.update(np.zeros((5, 9)))


def test_streaming_large_means_f32_accuracy():
    """Cancellation stress: with column means >> stds in float32, the
    shifted accumulation + high-precision batch GEMMs keep the correlation
    matrix accurate (naive E[xx']-mm' accumulation loses ~1% here)."""
    x = block_data(n=2000, p=32, m=4, seed=7).astype(np.float32) + 1000.0
    acc = GramAccumulator(p=32, dtype="float32")
    for i in range(0, 2000, 512):
        acc.update(x[i:i + 512])
    corr = np.asarray(acc.correlation(), np.float64)
    truth = np.corrcoef(x.astype(np.float64).T)
    assert np.abs(corr - truth).max() < 1e-4


def test_fit_from_covariance_matches_data_fit():
    """Fitting from the exact sample covariance equals fitting the data."""
    from linearcorex_tpu.utils.streaming import fit_from_covariance
    x = block_data(n=1500, p=48, m=6, seed=3)
    sigma = np.cov(x.T, bias=True)
    m_cov = fit_from_covariance(sigma, n_samples=1500, n_hidden=6, seed=0,
                                dtype="float64",
                                variable_means=x.mean(0))
    m_dat = lc.Corex(n_hidden=6, seed=0, dtype="float64",
                     moment_strategy="gram").fit(x)
    assert abs(m_cov.tc - m_dat.tc) < 1e-6
    assert np.array_equal(np.asarray(m_cov.clusters),
                          np.asarray(m_dat.clusters))
    y1 = np.asarray(m_cov.transform(x))
    y2 = np.asarray(m_dat.transform(x))
    assert np.abs(y1 - y2).max() < 1e-6


def test_fit_from_covariance_validation():
    from linearcorex_tpu.utils.streaming import fit_from_covariance
    with pytest.raises(ValueError, match="square"):
        fit_from_covariance(np.zeros((4, 5)), 100, 2)


def test_streaming_rejects_nan_batch():
    """A NaN batch poisons the accumulated Gram irreversibly (TC=nan after
    fit, no error) — reject it at update() for host arrays."""
    from linearcorex_tpu.utils.streaming import GramAccumulator

    x = np.random.RandomState(0).normal(size=(100, 8))
    x[3, 2] = np.nan
    acc = GramAccumulator(8)
    with pytest.raises(ValueError, match="NaN"):
        acc.update(x)


def test_streaming_rejects_missing_values():
    """Moment-input fits cannot mean-impute (no samples to impute) — the
    kwarg must raise, not be silently ignored."""
    from linearcorex_tpu.utils.streaming import (GramAccumulator,
                                                 fit_from_covariance)

    x = np.random.RandomState(0).normal(size=(100, 8))
    acc = GramAccumulator(8).update(x)
    with pytest.raises(ValueError, match="missing_values"):
        acc.fit(n_hidden=2, missing_values=-999.0)
    with pytest.raises(ValueError, match="missing_values"):
        fit_from_covariance(np.eye(8), 100, 2, missing_values=-999.0)


# ---------------------------------------------------------------------------
# Corex.partial_fit — the sklearn out-of-core spelling of GramAccumulator
# ---------------------------------------------------------------------------

def test_partial_fit_single_batch_equals_acc_fit():
    """One partial_fit call over the whole data IS GramAccumulator.fit:
    same accumulated moments, same seeded init policy (_resolve_w0), same
    gram program — the results must agree to fp noise."""
    x = block_data(n=800, p=48, m=6, seed=3)
    m_pf = lc.Corex(n_hidden=6, seed=0, dtype="float64").partial_fit(x)
    m_acc = GramAccumulator(p=48, dtype="float64").update(x).fit(
        n_hidden=6, seed=0, dtype="float64")
    assert abs(m_pf.tc - m_acc.tc) < 1e-8
    assert np.abs(np.asarray(m_pf.ws) - np.asarray(m_acc.ws)).max() < 1e-8


def test_partial_fit_batched_equals_full_fit():
    """partial_fit over row batches converges to the in-memory fit's
    optimum: the final call sees identical accumulated moments; only the
    warm-started W trajectory differs."""
    x = block_data(n=1200, p=64, m=8, seed=0)
    mdl = lc.Corex(n_hidden=8, seed=0, dtype="float64")
    for start in range(0, 1200, 256):    # uneven final batch on purpose
        mdl.partial_fit(x[start:start + 256])
        assert mdl.transform(x[:4]).shape == (4, 8)   # usable every call
    assert mdl.n_samples == 1200
    m_mem = lc.Corex(n_hidden=8, seed=0, dtype="float64",
                     moment_strategy="gram").fit(x)
    assert abs(mdl.tc - m_mem.tc) < 1e-3 * abs(m_mem.tc)
    assert np.array_equal(np.asarray(mdl.clusters),
                          np.asarray(m_mem.clusters))


def test_partial_fit_fit_resets_accumulation():
    """sklearn contract: fit is fresh (drops the partial state);
    partial_fit after it starts a new accumulation."""
    x = block_data(n=400, p=32, m=4, seed=5)
    mdl = lc.Corex(n_hidden=4, seed=0, dtype="float64")
    mdl.partial_fit(x[:200])
    assert mdl.n_samples == 200
    mdl.fit(x)                       # fresh full fit
    assert mdl._partial_acc is None
    assert mdl.n_samples == 400
    mdl.partial_fit(x[:100])         # new accumulation, not 400+100
    assert mdl.n_samples == 100


def test_partial_fit_validation():
    x = block_data(n=100, p=16, m=2, seed=6)
    with pytest.raises(ValueError, match="gaussianize='standard'|standard"):
        lc.Corex(n_hidden=2, gaussianize="empirical").partial_fit(x)
    with pytest.raises(ValueError, match="missing_values"):
        lc.Corex(n_hidden=2, missing_values=-999.0).partial_fit(x)
    with pytest.raises(ValueError, match="moment_strategy"):
        lc.Corex(n_hidden=2, moment_strategy="samples").partial_fit(x)
    mdl = lc.Corex(n_hidden=2, seed=0).partial_fit(x)
    with pytest.raises(ValueError, match="16"):
        mdl.partial_fit(np.zeros((10, 9)))   # width change mid-stream


def test_partial_fit_single_row_first_batch_defers():
    """A 1-row first batch is retained (warn, no solve); the next call
    solves from both rows' accumulation."""
    x = block_data(n=64, p=8, m=2, seed=7)
    mdl = lc.Corex(n_hidden=2, seed=0, dtype="float64")
    with pytest.warns(UserWarning, match="single sample"):
        mdl.partial_fit(x[:1])
    with pytest.raises(lc.NotFittedError):
        mdl.transform(x[:4])
    mdl.partial_fit(x[1:])
    assert mdl.n_samples == 64           # the first row was not dropped
    assert mdl.transform(x[:4]).shape == (4, 2)


def test_moment_input_fits_honor_init_policy():
    """fit_from_covariance/_solve_from_moments route W init through
    _resolve_w0: pretrained weights (and init='spectral') now apply to
    moment-input fits instead of silently falling back to random."""
    from linearcorex_tpu.utils.streaming import fit_from_covariance

    x = block_data(n=600, p=32, m=4, seed=8)
    sigma = np.cov(x.T)
    m1 = fit_from_covariance(sigma, 600, 4, seed=0, dtype="float64")
    m2 = fit_from_covariance(sigma, 600, 4, seed=0, dtype="float64",
                             pretrained_weights=np.asarray(m1.ws))
    # warm-started at m1's optimum: stays there (far fewer iterations
    # than the cold fit, same basin)
    assert np.abs(np.asarray(m2.ws) - np.asarray(m1.ws)).max() < 1e-4
    assert int(np.asarray(m2.diagnostics.iters_per_stage)[-1]) <= \
        int(np.asarray(m1.diagnostics.iters_per_stage)[-1])
    # spectral init is deterministic given the seed and differs from the
    # random draw — the two inits must produce different first-stage
    # trajectories on the same moments
    with pytest.warns(UserWarning, match="spectral.*anneal"):
        # spectral+anneal warns (measured-harmful pairing at scale) —
        # expected here; this toy check only needs the init to apply
        m3 = fit_from_covariance(sigma, 600, 4, seed=0, dtype="float64",
                                 init="spectral")
    assert m3.tc == pytest.approx(m1.tc, rel=0.05)   # same optimum class


def test_partial_fit_after_mesh_fit_warm_start():
    """A mesh fit leaves ws committed to mesh devices; partial_fit's
    warm start must uncommit it or the single-device solve rejects
    mixed-device arguments (review finding, session 4)."""
    from linearcorex_tpu.parallel.sharding import make_mesh

    x = block_data(n=512, p=32, m=4, seed=9)
    mdl = lc.Corex(n_hidden=4, seed=0, dtype="float64")
    mdl.fit(x, mesh=make_mesh((("data", 8),)))
    mdl.partial_fit(x[:256])      # fresh accumulation, warm from mesh ws
    assert mdl.n_samples == 256
    assert mdl.transform(x[:4]).shape == (4, 4)


def test_partial_fit_width_change_after_fit_raises():
    """sklearn n_features consistency: a new partial_fit stream on an
    estimator fit on different-width data raises instead of silently
    refitting from scratch (review finding, session 4)."""
    x = block_data(n=200, p=64, m=4, seed=10)
    mdl = lc.Corex(n_hidden=4, seed=0, dtype="float64").fit(x)
    with pytest.raises(ValueError, match="64"):
        mdl.partial_fit(np.asarray(x)[:, :32])


# ---------------------------------------------------------------------------
# Mesh-aware streaming: the accumulated p x p Gram row-sharded over 'var'
# (streaming + p-beyond-one-chip COMPOSE — round-4 session 5)
# ---------------------------------------------------------------------------

def _var_mesh(d=8):
    from linearcorex_tpu.parallel.sharding import VAR_AXIS, make_mesh
    return make_mesh(((VAR_AXIS, d),))


def test_streaming_sharded_equals_single_device():
    """Accumulate + fit under a var-sharded mesh == the single-device
    accumulator fit (f64): same moments, same program math — GSPMD only
    changes the layout."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from linearcorex_tpu.parallel.sharding import VAR_AXIS

    x = block_data(n=1200, p=64, m=8, seed=0)
    mesh = _var_mesh()
    acc = GramAccumulator(p=64, dtype="float64", mesh=mesh)
    acc_ref = GramAccumulator(p=64, dtype="float64")
    for start in range(0, 1200, 256):       # uneven final batch on purpose
        acc.update(x[start:start + 256])
        acc_ref.update(x[start:start + 256])
    # the accumulator state is ROW-SHARDED from the first batch: each
    # device holds a (p/8, p) block, never the full p x p
    assert acc._g.sharding.is_equivalent_to(
        NamedSharding(mesh, PS(VAR_AXIS, None)), 2)
    assert acc._g.addressable_shards[0].data.shape == (8, 64)
    corr_s = np.asarray(acc.correlation())
    corr_r = np.asarray(acc_ref.correlation())
    assert np.abs(corr_s - corr_r).max() < 1e-12
    m_mesh = acc.fit(n_hidden=8, seed=0)
    m_ref = acc_ref.fit(n_hidden=8, seed=0)
    assert abs(m_mesh.tc - m_ref.tc) < 1e-7
    assert np.abs(np.asarray(m_mesh.ws) - np.asarray(m_ref.ws)).max() < 1e-7
    assert np.array_equal(np.asarray(m_mesh.clusters),
                          np.asarray(m_ref.clusters))
    # the fitted estimator carries the layout and serves under it
    assert m_mesh._serving_plan is acc.plan
    y = np.asarray(m_mesh.transform(x[:16], mesh=mesh))
    y_ref = np.asarray(m_ref.transform(x[:16]))
    assert np.abs(y - y_ref).max() < 1e-7


def test_partial_fit_mesh_equals_plain():
    """partial_fit(mesh=...) == partial_fit, batch for batch; the mesh
    binds on the first call and later calls may omit it."""
    x = block_data(n=1024, p=32, m=4, seed=11)
    mesh = _var_mesh()
    a = lc.Corex(n_hidden=4, seed=0, dtype="float64")
    b = lc.Corex(n_hidden=4, seed=0, dtype="float64")
    first = True
    for start in range(0, 1024, 256):
        a.partial_fit(x[start:start + 256],
                      mesh=mesh if first else None)   # layout continues
        b.partial_fit(x[start:start + 256])
        first = False
    assert a.n_samples == b.n_samples == 1024
    assert abs(a.tc - b.tc) < 1e-7
    assert np.abs(np.asarray(a.ws) - np.asarray(b.ws)).max() < 1e-7


def test_fit_from_covariance_mesh_equals_plain():
    from linearcorex_tpu.utils.streaming import fit_from_covariance

    x = block_data(n=900, p=48, m=6, seed=12)
    sigma = np.cov(x.T, bias=True)
    mesh = _var_mesh()
    m1 = fit_from_covariance(sigma, 900, 6, seed=0, dtype="float64",
                             mesh=mesh)
    m2 = fit_from_covariance(sigma, 900, 6, seed=0, dtype="float64")
    assert abs(m1.tc - m2.tc) < 1e-7
    assert np.abs(np.asarray(m1.ws) - np.asarray(m2.ws)).max() < 1e-7


def test_fit_csv_mesh(tmp_path):
    from linearcorex_tpu.utils.streaming import fit_csv

    x = block_data(n=300, p=16, m=2, seed=13)
    f = tmp_path / "data.csv"
    np.savetxt(f, np.asarray(x), delimiter=",")
    m1 = fit_csv(str(f), n_hidden=2, block_rows=128, seed=0,
                 dtype="float64", mesh=_var_mesh())
    m2 = fit_csv(str(f), n_hidden=2, block_rows=128, seed=0,
                 dtype="float64")
    assert abs(m1.tc - m2.tc) < 1e-7


def test_streaming_sharded_int8_runs_guarded():
    """int8 under the mesh streaming path: quantize_gram runs the eager
    wrap guard on the SHARDED operand (the int8 invariant: no new int8
    path routes around it), and the solve agrees with the single-device
    int8 gram fit (int8 is outside the f64 parity surface — loose tol)."""
    x = block_data(n=800, p=32, m=4, seed=14).astype(np.float32)
    mesh = _var_mesh()
    acc = GramAccumulator(p=32, dtype="float32", mesh=mesh)
    acc_ref = GramAccumulator(p=32, dtype="float32")
    for start in range(0, 800, 256):
        acc.update(x[start:start + 256])
        acc_ref.update(x[start:start + 256])
    m1 = acc.fit(n_hidden=4, seed=0, matmul_dtype="int8", tol=1e-4)
    m2 = acc_ref.fit(n_hidden=4, seed=0, matmul_dtype="int8", tol=1e-4)
    assert m1.tc == pytest.approx(m2.tc, rel=0.05)
    assert np.array_equal(np.asarray(m1.clusters), np.asarray(m2.clusters))


def test_streaming_mesh_validation():
    """Named errors: sample-only plans (a Gram operand has no sample
    axis), GSPMD divisibility, mid-stream mesh change."""
    from linearcorex_tpu.parallel.sharding import ShardingPlan

    mesh = _var_mesh()
    with pytest.raises(ValueError, match="shard_vars"):
        GramAccumulator(64, mesh=mesh, sharding_plan=ShardingPlan())
    with pytest.raises(ValueError, match="divisible"):
        GramAccumulator(63, mesh=mesh)
    with pytest.raises(ValueError, match="shard_vars"):
        from linearcorex_tpu.utils.streaming import fit_from_covariance
        fit_from_covariance(np.eye(64), 100, 4, mesh=mesh,
                            sharding_plan=ShardingPlan(shard_samples=True))
    x = block_data(n=128, p=32, m=4, seed=15)
    mdl = lc.Corex(n_hidden=4, seed=0, dtype="float64")
    mdl.partial_fit(x[:64], mesh=mesh)
    from linearcorex_tpu.parallel.sharding import VAR_AXIS, make_mesh
    import jax
    other = make_mesh(((VAR_AXIS, 4),), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="mid-stream"):
        mdl.partial_fit(x[64:], mesh=other)
    # same mesh object mid-stream is fine
    mdl.partial_fit(x[64:], mesh=mesh)
    assert mdl.n_samples == 128


def test_streaming_rejects_empty_batch():
    """An empty FIRST batch would set the shift point to NaN and silently
    poison the accumulation (review finding, session 4)."""
    acc = GramAccumulator(8)
    with pytest.raises(ValueError, match="0 rows"):
        acc.update(np.zeros((0, 8)))
    with pytest.raises(ValueError, match="0 rows"):
        lc.Corex(n_hidden=2).partial_fit(np.zeros((0, 8)))
