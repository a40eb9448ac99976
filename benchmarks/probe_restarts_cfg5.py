"""Estimator-level restarts at cfg5 scale (round 5, VERDICT r4 Weak #5
"Done" criterion): `Corex(n_restarts=4, matmul_dtype='int8')` at
p=100k/m=512/n=10k — the ONE-CALL surface over the round-4 measured
basis (RESULTS.md multi-restart note: int8 best-of-4 as one vmapped
program is memory-feasible on one chip, 14 s steady-state).

Measures the estimator call end-to-end (prepare + quantize + vmapped
sweep + best-TC selection), first call and min-of-3 steady state, and
cross-checks `best_restart_`/TC against the per-lane TCs recovered from
the sweep's own diagnostics. Protocol mirrors probe_stage_tol_cfg5.py:
on-device data gen, scalar-fetch close.

    python benchmarks/probe_restarts_cfg5.py [--restarts 4] [--seed 0]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import linearcorex_tpu as lc
from linearcorex_tpu.utils.compile_cache import ensure_compile_cache

ap = argparse.ArgumentParser()
ap.add_argument("--restarts", type=int, default=4)
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--loading", type=float, default=0.9)
ap.add_argument("--preset", default=None, choices=[None, "throughput"],
                help="throughput = the one-call best-of-k the preset "
                     "caveat prescribes: k SPECTRAL lanes (one random "
                     "projection each), int8, anneal=False, tol=1e-4")
args = ap.parse_args()

ensure_compile_cache()
n, p, m = 10_000, 100_000, 512


@jax.jit
def make_data():
    kz, ke = jax.random.split(jax.random.PRNGKey(42))
    z = jax.random.normal(kz, (n, 100), jnp.float32)
    e = jax.random.normal(ke, (n, p), jnp.float32)
    x = jnp.repeat(z, p // 100, axis=1) * args.loading + 0.436 * e
    return (x - x.mean(0)) / x.std(0)


x = make_data()
x.block_until_ready()

if args.preset == "throughput":
    kw = dict(n_hidden=m, max_iter=2000, record_history=False,
              moment_strategy="samples", preset="throughput")
else:
    kw = dict(n_hidden=m, max_iter=2000, tol=1e-4, anneal=True,
              record_history=False, matmul_dtype="int8",
              moment_strategy="samples", optimizer="momentum")

best_wall = float("inf")
first = None
for rep in range(3):
    c = lc.Corex(n_restarts=args.restarts, seed=args.seed, **kw)
    t0 = time.perf_counter()
    c.fit(x)
    tc = float(c.tc)  # scalar fetch closes the timed region
    dt = time.perf_counter() - t0
    if first is None:
        first = dt
    best_wall = min(best_wall, dt)
print(f"sweep n_restarts={args.restarts} seed={args.seed}: "
      f"wall={best_wall:.2f}s (first-call {first:.1f}s) "
      f"best_restart_={c.best_restart_} TC={tc:.1f}", flush=True)

# per-lane TCs via the single fits (seed policy: lane r == seed + r)
for r in range(args.restarts):
    s = lc.Corex(seed=args.seed + r, **kw)
    t0 = time.perf_counter()
    s.fit(x)
    stc = float(s.tc)
    dt = time.perf_counter() - t0
    print(f"  single seed={args.seed + r}: wall={dt:.2f}s TC={stc:.1f}",
          flush=True)
