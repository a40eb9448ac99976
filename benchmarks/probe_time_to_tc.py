"""Measured-vs-measured time-to-TC (VERDICT r4 Missing #2).

Every e2e speedup in RESULTS.md divides a measured TPU wall by an
ESTIMATED NumPy wall (per-iteration time x iteration count). This probe
measures BOTH sides end-to-end on the SAME data and the SAME init:

- NumPy side: the float64 oracle (`linearcorex_tpu.oracle.OracleCorex`)
  run to convergence — the executable spec for the reference
  (`[U] linearcorex/linearcorex.py :: Corex.fit`), single-core NumPy
  per BASELINE.md §2 (observed single-threaded BLAS).
- TPU side: the production one-program `fit_core` (f32), min-of-3
  steady-state wall plus the first-call wall.

Data/init protocol mirrors benchmarks/run_benchmarks.py::run_e2e
(PRNGKey(0) block data, 100 planted factors, loading 0.9,
RandomState(1) init) so the rows slot next to the estimated ones.
Data is generated ONCE on the CPU backend and saved to /tmp so both
sides consume bit-identical arrays.

Usage:
  python benchmarks/probe_time_to_tc.py --side numpy   # hours; run in bg
  python benchmarks/probe_time_to_tc.py --side tpu     # minutes
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SHAPES = {
    # name: (n, p, m, optimizer, tol)
    "cfg2": (10_000, 2_000, 32, "momentum", 1e-5),
    "northstar_fp": (10_000, 10_000, 512, "fixed_point", 1e-5),
    "northstar_mom": (10_000, 10_000, 512, "momentum", 1e-5),
}


def data_path(name):
    return f"/tmp/ttc_data_{name}.npz"


def make_data(name):
    """Generate on the CPU jax backend (deterministic threefry draws,
    platform-independent values to f32 rounding) and cache to /tmp."""
    path = data_path(name)
    if os.path.exists(path):
        d = np.load(path)
        return d["x"], d["w0"]
    import jax
    import jax.numpy as jnp
    n, p, m, _, _ = SHAPES[name]
    key_z, key_e = jax.random.split(jax.random.PRNGKey(0))

    @jax.jit
    def make_x():
        z = jax.random.normal(key_z, (n, 100), jnp.float32)
        e = jax.random.normal(key_e, (n, p), jnp.float32)
        x = jnp.repeat(z, p // 100, axis=1) * 0.9 + 0.436 * e
        return (x - x.mean(0)) / x.std(0)

    with jax.default_device(jax.devices("cpu")[0]):
        x = np.asarray(make_x())
    w0 = np.random.RandomState(1).normal(
        scale=1.0 / np.sqrt(p), size=(m, p)).astype(np.float32)
    np.savez(path, x=x, w0=w0)
    return x, w0


def run_numpy(name):
    from linearcorex_tpu.oracle import OracleCorex
    n, p, m, opt, tol = SHAPES[name]
    x, w0 = make_data(name)
    xd = x.astype(np.float64)
    oc = OracleCorex(n_hidden=m, max_iter=2000, tol=tol, anneal=True,
                     optimizer=opt, gaussianize="standard")
    # report BOTH clocks: on this 1-core box any concurrent process
    # halves the oracle's wall share, but the oracle is a single-threaded
    # compute-bound process (BASELINE.md §2: observed single-threaded
    # BLAS), so its process CPU time == its uncontended wall; cpu is the
    # honest single-core number, wall the upper bound actually observed
    t0, c0 = time.perf_counter(), time.process_time()
    oc.fit(xd, init_ws=w0)
    wall = time.perf_counter() - t0
    cpu = time.process_time() - c0
    iters = int(np.sum(oc.history["iters_per_stage"]))
    tc = float(np.sum(oc.moments["TCs"]))
    print(f"NUMPY {name}: cpu={cpu:.1f}s wall={wall:.1f}s iters={iters} "
          f"({cpu/max(iters,1):.3f} cpu-s/iter) TC={tc:.1f}", flush=True)


def run_tpu(name):
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from linearcorex_tpu.config import CorexConfig
    from linearcorex_tpu.core.solver import fit_core
    from linearcorex_tpu.models.corex import _make_obj_grad
    from linearcorex_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    n, p, m, opt, tol = SHAPES[name]
    x_host, w0_host = make_data(name)
    x = jnp.asarray(x_host)
    w0 = jnp.asarray(w0_host)
    cfg = CorexConfig(n_hidden=m, max_iter=2000, tol=tol, anneal=True,
                      record_history=False, optimizer=opt,
                      dtype="float32")

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def run(d, w, c, strat):
        return fit_core(_make_obj_grad(d, c, strat), w, c)

    # the oracle fits on SAMPLES semantics; at n >= p 'auto' would pick
    # gram — pin 'samples' for a like-for-like program, and also report
    # the gram program (the production choice at these shapes)
    for strat in ("samples", "gram"):
        d = x
        if strat == "gram":
            from linearcorex_tpu.ops import moments as M
            d = jax.jit(M.compute_gram)(x)
            d.block_until_ready()
        t0 = time.perf_counter()
        ws, diag = run(d, w0, cfg, strat)
        tc = float(diag.tc_per_stage[-1])
        first = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ws, diag = run(d, w0, cfg, strat)
            tc = float(diag.tc_per_stage[-1])
            dt = min(dt, time.perf_counter() - t0)
        iters = int(np.asarray(diag.iters_per_stage).sum())
        print(f"TPU {name} [{strat}]: wall={dt:.3f}s (first-call "
              f"{first:.1f}s) iters={iters} TC={tc:.1f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=("numpy", "tpu"), required=True)
    ap.add_argument("--shapes", default="cfg2,northstar_fp,northstar_mom")
    args = ap.parse_args()
    if args.side == "numpy":
        import jax
        jax.config.update("jax_platforms", "cpu")
    for name in args.shapes.split(","):
        if args.side == "numpy":
            run_numpy(name)
        else:
            run_tpu(name)


if __name__ == "__main__":
    main()
