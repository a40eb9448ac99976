"""Tests for stacked (2-layer) CorEx — BASELINE.json config 4 shape."""

import numpy as np

from linearcorex_tpu.models.stacked import StackedCorex


def hierarchical_data(n=1500, seed=0):
    """Two-level structure: 4 fine blocks of variables; fine factors pair up
    under 2 coarse super-factors (what layer 2 should discover)."""
    rng = np.random.RandomState(seed)
    g = rng.normal(size=(n, 2))                        # coarse
    z = np.empty((n, 4))
    for j in range(4):
        z[:, j] = 0.8 * g[:, j // 2] + 0.6 * rng.normal(size=n)
    x = np.empty((n, 24))
    for j in range(4):
        for i in range(6):
            x[:, j * 6 + i] = 0.9 * z[:, j] + 0.436 * rng.normal(size=n)
    return x


def test_two_layer_fit_recovers_hierarchy():
    x = hierarchical_data()
    s = StackedCorex([4, 2], seed=0, dtype="float64").fit(x)
    # layer 1: each of the 4 fine blocks gets one factor
    cl1 = np.asarray(s.clusters[0])
    for j in range(4):
        assert len(set(cl1[j * 6:(j + 1) * 6])) == 1
    assert len({cl1[j * 6] for j in range(4)}) == 4
    # layer 2: fine factors (0,1) and (2,3) pair under distinct coarse ones
    cl2 = np.asarray(s.clusters[1])
    fine_of = {}  # coarse block id -> layer-2 cluster of its two fine factors
    inv = np.empty(4, dtype=int)
    for j in range(4):
        inv[cl1[j * 6]] = j          # factor index -> fine block id
    pair = {}
    for f in range(4):
        blk = inv[f] // 2
        pair.setdefault(blk, set()).add(int(cl2[f]))
    assert all(len(v) == 1 for v in pair.values()), \
        "sibling fine factors must share a layer-2 factor"
    assert pair[0] != pair[1]


def test_transform_predict_shapes():
    x = hierarchical_data()
    s = StackedCorex([4, 2], seed=0).fit(x)
    y2 = s.transform(x)
    assert np.asarray(y2).shape == (1500, 2)
    ys = s.transform_all(x)
    assert [np.asarray(a).shape[1] for a in ys] == [4, 2]
    xh = s.predict(y2)
    assert np.asarray(xh).shape == x.shape
    # reconstruction from the top of the hierarchy keeps most structure
    corr = np.corrcoef(np.asarray(xh).ravel(), x.ravel())[0, 1]
    assert corr > 0.6


def test_stacked_tc_positive_layers():
    x = hierarchical_data()
    s = StackedCorex([4, 2], seed=0).fit(x)
    assert s.tc > 0
    assert all(float(np.sum(np.asarray(t))) > 0 for t in s.tcs)


def test_stacked_mesh_fit_matches_single_device():
    """StackedCorex.fit(mesh=...) runs every layer's fit sharded and
    reproduces the single-device stack (f64, 8-device CPU mesh)."""
    from linearcorex_tpu.parallel.sharding import make_mesh
    from tests.conftest import block_data

    x = block_data(n=512, p=64, m=8, seed=4)
    ref = StackedCorex([8, 2], seed=0, dtype="float64").fit(x)
    msh = StackedCorex([8, 2], seed=0, dtype="float64").fit(
        x, mesh=make_mesh())
    assert abs(msh.tc - ref.tc) < 1e-8
    for a, b in zip(msh.tcs, ref.tcs):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8


def test_stacked_mesh_drops_var_factor_axes_for_deep_layers():
    """A var/factor plan applies to layer 1 only: deeper layers fit on
    narrow (n, m_k) factor matrices that need not divide those mesh
    extents (round-3 self-review finding — previously the layer-1 fit
    succeeded and layer 2 raised, wasting the work)."""
    from linearcorex_tpu.parallel.sharding import ShardingPlan, make_mesh
    from tests.conftest import block_data

    x = block_data(n=512, p=64, m=8, seed=4)
    plan = ShardingPlan(shard_samples=False, shard_vars=True)
    ref = StackedCorex([8, 2], seed=0, dtype="float64").fit(x)
    msh = StackedCorex([8, 2], seed=0, dtype="float64").fit(
        x, mesh=make_mesh((("var", 8),)), sharding_plan=plan)
    assert abs(msh.tc - ref.tc) < 1e-8


def test_stacked_sklearn_conventions():
    """StackedCorex mirrors the Corex sklearn slots: ignored y on
    fit/fit_transform, inverse_transform == predict."""
    from tests.conftest import block_data
    x = block_data(n=200, p=16, m=4, seed=1)
    s = StackedCorex([4, 2], seed=0).fit(x, np.arange(200))
    z = StackedCorex([4, 2], seed=0).fit_transform(x, None)
    assert np.allclose(np.asarray(z), np.asarray(s.transform(x)))
    assert np.allclose(np.asarray(s.inverse_transform(z)),
                       np.asarray(s.predict(z)))


def test_stacked_restart_sweep_composes_with_mesh():
    """StackedCorex threads n_restarts into every layer (each layer runs
    its own best-of-k sweep), and under a (restarts, data) mesh each
    layer's sweep shards its lanes — winners and weights must match the
    single-device stack."""
    from linearcorex_tpu.parallel.sharding import DATA_AXIS, make_mesh
    from tests.conftest import block_data

    x = np.asarray(block_data(n=256, p=32, m=4, seed=3, strength=0.3))
    kw = dict(n_restarts=2, seed=7, max_iter=100, record_history=False,
              moment_strategy="samples", dtype="float64")
    ref = StackedCorex([4, 2], **kw).fit(x)
    assert all(layer.best_restart_ is not None for layer in ref.layers)
    msh = StackedCorex([4, 2], **kw).fit(
        x, mesh=make_mesh((("restarts", 2), (DATA_AXIS, 4))))
    for la, lb in zip(ref.layers, msh.layers):
        assert la.best_restart_ == lb.best_restart_
        assert np.abs(np.asarray(la.ws) - np.asarray(lb.ws)).max() < 1e-7
    # restart-ONLY mesh: no serving axes — the inter-layer transform
    # falls back to single-device (mirroring Corex.fit_transform)
    # instead of failing the DP-plan validation after layer 1 fit
    ronly = StackedCorex([4, 2], **kw).fit(
        x, mesh=make_mesh((("restarts", 8),)))
    for la, lb in zip(ref.layers, ronly.layers):
        assert la.best_restart_ == lb.best_restart_
    y = StackedCorex([4, 2], **kw).fit_transform(
        x, mesh=make_mesh((("restarts", 8),)))
    assert np.abs(np.asarray(y)
                  - np.asarray(ref.transform(x))).max() < 1e-7
