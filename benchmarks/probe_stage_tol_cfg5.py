"""TPU wall measurement: stage_tol_factor at cfg5 scale (p=100k, m=512,
n=10k), heavy-ball annealed, BOTH structure regimes (strong 0.9 = the
cfg5 data; weak 0.3 = the annealing-essential data), 2 init seeds.
Protocol mirrors benchmarks/run_benchmarks.py::run_e2e_cfg5: on-device
data gen, one compiled program per fit, scalar-fetch close, min of 3.

Usage:
    python benchmarks/probe_stage_tol_cfg5.py [--dtype int8|float32]
        [--tol T] [--factors 1,10]

Findings log (full table: benchmarks/RESULTS.md "stage-tol study"
cfg5 rows, 2026-08-18):
- f32 tol=1e-5: factor=10 holds TC on both regimes and delivers the
  wall win (weak 12.9 -> 8.6 s = 1.5x; strong 1.24x); factor=30 also
  holds at this scale.
- int8 tol=1e-4: factor=10 COLLAPSES TC ~24% on both regimes, both
  seeds; strong collapses already at factor=3 (identical to factor=10
  to the decimal — the delta trajectory plunges through 3e-4 and 1e-3
  at the same iterations). f32 at the SAME composed tols holds, so the
  hazard is int8 moment noise vs the ~1/sqrt(p) W-entry scale;
  resolve_optimizer warns at tol*factor*sqrt(p) >= 0.05 on int8.
"""
import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from linearcorex_tpu.config import CorexConfig
from linearcorex_tpu.core.solver import fit_core
from linearcorex_tpu.models.corex import _make_obj_grad, resolve_config
from linearcorex_tpu.ops.moments import quantize_samples
from linearcorex_tpu.utils.compile_cache import ensure_compile_cache

ap = argparse.ArgumentParser()
ap.add_argument("--dtype", default="int8", choices=("int8", "float32"))
ap.add_argument("--tol", type=float, default=None,
                help="default: 1e-4 for int8, 1e-5 for float32")
ap.add_argument("--factors", default="1,10")
# round-5 threshold bracketing (VERDICT r4 Weak #3): --p sweeps the
# composed-hazard metric tol*factor*sqrt(p) through the unexplored
# 0.05-0.09 band (e.g. p=10k factor=5 -> 0.05, factor=9 -> 0.09;
# p=50k factor=3 -> 0.067)
ap.add_argument("--p", type=int, default=100_000)
ap.add_argument("--n", type=int, default=10_000)
args = ap.parse_args()
tol = args.tol if args.tol is not None else (
    1e-4 if args.dtype == "int8" else 1e-5)
factors = tuple(float(f) for f in args.factors.split(","))

ensure_compile_cache()
n, p, m = args.n, args.p, 512


@functools.partial(jax.jit, static_argnums=(1,))
def make_data(keys, loading):
    z = jax.random.normal(keys[0], (n, 100), jnp.float32)
    e = jax.random.normal(keys[1], (n, p), jnp.float32)
    noise = float(np.sqrt(1.0 - loading ** 2))
    x = jnp.repeat(z, p // 100, axis=1) * loading + noise * e
    return (x - x.mean(0)) / x.std(0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def run(d, w0, cfg, strat):
    return fit_core(_make_obj_grad(d, cfg, strat), w0, cfg)


w0s = {seed: jnp.asarray(np.random.RandomState(seed).normal(
    scale=1.0 / np.sqrt(p), size=(m, p)), jnp.float32) for seed in (1, 2)}

for loading, name in ((0.9, "strong"), (0.3, "weak")):
    keys = jax.random.split(jax.random.PRNGKey(7 if loading < 0.5 else 0))
    x = make_data(keys, loading)
    if args.dtype == "int8":
        operand = jax.jit(quantize_samples)(x)
        operand.q.block_until_ready()
        # free the f32 X before fitting: x (4 GB) + the next regime's
        # make_data peak (~12 GB) together exhaust the 15.75 GB HBM
        # (observed OOM)
        x.delete()
    else:
        operand = x
        operand.block_until_ready()
    for factor in factors:
        cfg = CorexConfig(n_hidden=m, max_iter=1000, tol=tol, anneal=True,
                          record_history=False, matmul_dtype=args.dtype,
                          optimizer="momentum", stage_tol_factor=factor)
        cfg = resolve_config(cfg, p)
        for seed, w0 in w0s.items():
            run(operand, w0, cfg, "samples")[1].tc_per_stage.block_until_ready()
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ws, diag = run(operand, w0, cfg, "samples")
                tc = float(diag.tc_per_stage[-1])
                dt = min(dt, time.perf_counter() - t0)
            total = int(np.asarray(diag.iters_per_stage).sum())
            hazard = tol * factor * float(np.sqrt(p))
            print(f"{name} p={p} {args.dtype} tol={tol:g} "
                  f"factor={factor:>4.0f} (hazard={hazard:.3f}) "
                  f"seed={seed}: {total:4d} iters, {dt:6.2f} s, "
                  f"TC={tc:.1f}", flush=True)
    if args.dtype == "float32":
        x.delete()
