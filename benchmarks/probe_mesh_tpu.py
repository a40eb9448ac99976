"""Probe: execute the sharded (mesh) programs on REAL TPU hardware.

Every sharded layout is equivalence-tested on the 8-virtual-device CPU
mesh (tests/test_sharding.py) and dryrun-compiled by the driver, but
until this probe nothing in the repo had EXECUTED a mesh program on a
physical TPU chip — only one chip is ever attached, so multi-chip
remains compile-validated. A 1-device mesh runs the SAME programs
(GSPMD-partitioned mesh-aware prepare + fit, sharded serving, the
explicit-psum shard_map path with the COMPILED Pallas chain kernel, and
the 2-D restarts x data sweep) through the real XLA:TPU backend,
closing two gaps the CPU mesh cannot:

- backend validation: XLA:TPU partition lowering, and the Pallas chain
  kernel in compiled (non-interpret) mode UNDER shard_map — tests only
  run that combination in interpret mode on CPU;
- the mesh-path overhead measurement vs the plain single-device path
  (expected ~0: the same program modulo partition annotations).

Timing discipline per BASELINE.md §2: warm (untimed) call first, then
min over 3 repeats, each closed by a scalar fetch.

Results recorded in benchmarks/RESULTS.md ("Mesh path on real TPU").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def timed(fn, repeats=3):
    """min wall over `repeats`; fn must close with a scalar fetch."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import linearcorex_tpu as lc
    from linearcorex_tpu.config import CorexConfig
    from linearcorex_tpu.parallel.restarts import (best_restart,
                                                   fit_restarts_sharded)
    from linearcorex_tpu.parallel.sharding import (DATA_AXIS, ShardingPlan,
                                                   fit_shard_map, make_mesh)
    from linearcorex_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    dev = jax.devices()[0]
    print(json.dumps({"platform": dev.platform,
                      "device": str(dev)}), flush=True)

    n, p, m = 8192, 4096, 128
    key_z, key_e = jax.random.split(jax.random.PRNGKey(0))

    @jax.jit
    def make_data():
        z = jax.random.normal(key_z, (n, 64), jnp.float32)
        e = jax.random.normal(key_e, (n, p), jnp.float32)
        return jnp.repeat(z, p // 64, axis=1) * 0.7 + e

    x = make_data()
    x.block_until_ready()
    mesh = make_mesh(((DATA_AXIS, 1),))

    # --- Corex.fit: plain vs mesh (GSPMD prepare + fit) -----------------
    # Step-matched comparison: fixed 200 iterations (tol=0, anneal=False)
    # and moment_strategy pinned to 'samples' — mesh fits FORCE the
    # samples strategy (sample-sharding plans, models.corex.
    # pick_fit_strategy) while the plain path resolves 'auto' to gram at
    # this n/p, so default configs would compare different programs (the
    # first run of this probe measured exactly that: ~1% TC apart).
    kw = dict(n_hidden=m, seed=0, max_iter=200, tol=0.0, anneal=False,
              moment_strategy="samples")

    def fit_plain():
        mdl = lc.Corex(**kw)
        mdl.fit(x)
        float(mdl.tc)  # scalar close
        return mdl

    def fit_mesh():
        mdl = lc.Corex(**kw)
        mdl.fit(x, mesh=mesh)
        float(mdl.tc)
        return mdl

    mp_, mm_ = fit_plain(), fit_mesh()      # warm/compile, untimed
    t_plain, t_mesh = timed(fit_plain), timed(fit_mesh)
    tc_p, tc_m = float(mp_.tc), float(mm_.tc)
    print(json.dumps({"probe": "corex_fit", "wall_plain_s": round(t_plain, 3),
                      "wall_mesh_s": round(t_mesh, 3), "tc_plain": tc_p,
                      "tc_mesh": tc_m,
                      "overhead_pct": round(100 * (t_mesh / t_plain - 1), 1)}),
          flush=True)
    # f32 tolerance: the partitioned program may order reductions
    # differently; 200 step-matched iterations bound the drift
    assert abs(tc_p - tc_m) <= 2e-3 * abs(tc_p), (tc_p, tc_m)

    # --- sharded serving: transform / score on the mesh -----------------
    y_plain = np.asarray(mp_.transform(x))
    y_mesh = np.asarray(mm_.transform(x, mesh=mesh))
    s_plain = float(mp_.score(x))
    s_mesh = float(mm_.score(x, mesh=mesh))
    # scalar-fetch close (the full (n, m) D2H would swamp the timing)
    t_tr = timed(lambda: float(mm_.transform(x, mesh=mesh)[0, 0]))
    print(json.dumps({"probe": "serving", "transform_mesh_s": round(t_tr, 4),
                      "max_abs_dy": float(np.abs(y_plain - y_mesh).max()),
                      "score_plain": s_plain, "score_mesh": s_mesh}),
          flush=True)
    assert abs(s_plain - s_mesh) <= 1e-4 * abs(s_plain)

    # --- explicit-psum shard_map path, COMPILED Pallas chain kernel -----
    xs = (x - x.mean(0)) / x.std(0)
    cfg = CorexConfig(n_hidden=m, max_iter=200, tol=0.0, anneal=False,
                      use_pallas="always", record_history=False)
    w0 = jnp.asarray(np.random.RandomState(1).normal(
        scale=1.0 / np.sqrt(p), size=(m, p)), jnp.float32)
    ws, mom, diag = fit_shard_map(xs, w0, cfg, mesh)   # warm
    tc_sm = float(diag.tc_per_stage[-1])
    t_sm = timed(lambda: float(
        fit_shard_map(xs, w0, cfg, mesh)[2].tc_per_stage[-1]))
    cfg_np = CorexConfig(n_hidden=m, max_iter=200, tol=0.0, anneal=False,
                         use_pallas="never", record_history=False)
    _, _, diag_np = fit_shard_map(xs, w0, cfg_np, mesh)
    tc_np = float(diag_np.tc_per_stage[-1])
    print(json.dumps({"probe": "shard_map_pallas", "wall_s": round(t_sm, 3),
                      "tc": tc_sm, "tc_no_pallas": tc_np,
                      "iters": int(diag.iters_per_stage.sum())}), flush=True)
    # kernel-vs-XLA-chain fp drift compounds over 200 momentum iterations
    assert abs(tc_sm - tc_np) <= 5e-3 * abs(tc_np), (tc_sm, tc_np)

    # --- combined restarts x data 2-D layout on the TPU mesh ------------
    mesh2 = make_mesh((("restarts", 1), (DATA_AXIS, 1)))
    w0b = jnp.asarray(np.random.RandomState(2).normal(
        scale=1.0 / np.sqrt(p), size=(4, m, p)), jnp.float32)
    wsb, momb, diagb = fit_restarts_sharded(
        xs, w0b, cfg_np, "samples", mesh2, data_axis=DATA_AXIS)
    wbest, mbest, dbest, _ = best_restart(wsb, momb, diagb)
    t_rs = timed(lambda: float(fit_restarts_sharded(
        xs, w0b, cfg_np, "samples", mesh2,
        data_axis=DATA_AXIS)[2].tc_per_stage[..., -1].max()))
    print(json.dumps({"probe": "restarts_x_data",
                      "best_tc": float(dbest.tc_per_stage[-1]),
                      "wall_4_restarts_s": round(t_rs, 3)}), flush=True)

    # --- estimator-surface restart sweep under the mesh (round 5) -------
    # Corex(n_restarts=k).fit(mesh=...) reaches the same combined layout
    # without dropping to parallel.restarts; 3 lanes pad to no-op on the
    # 1-wide axis. Winner must match the single-device estimator sweep.
    kwr = dict(kw, n_restarts=3, max_iter=50)
    est_plain = lc.Corex(**kwr).fit(x)
    est_mesh = lc.Corex(**kwr).fit(x, mesh=mesh2)
    print(json.dumps({"probe": "estimator_restarts_mesh",
                      "best_plain": est_plain.best_restart_,
                      "best_mesh": est_mesh.best_restart_,
                      "tc_plain": float(est_plain.tc),
                      "tc_mesh": float(est_mesh.tc)}), flush=True)
    assert est_mesh.best_restart_ == est_plain.best_restart_
    assert abs(float(est_mesh.tc) - float(est_plain.tc)) \
        <= 2e-3 * abs(float(est_plain.tc))
    print("mesh-on-TPU probe: all equivalence checks passed")


if __name__ == "__main__":
    main()
