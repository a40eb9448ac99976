"""Selection at flagship scale (round 5, VERDICT r4 #7): one measured
`pick_n_hidden` run at p=10k — the selection surface was previously
measured only at p=1024, while SURVEY §3.5 / BASELINE config 5 frame
selection as a scale workload.

Planted structure: m_true=12 factors at loading 0.8 over p=10k,
n=10k rows. Sweep n_hidden in 1..16 with the heldout criterion (the
knob whose plateau/decline makes chosen-n meaningful at scale;
RESULTS.md selection note), repeat=2 restarts per candidate, int8
operand (single-chip memory feasibility for the padded sweep at this
shape), anneal=False + spectral would defeat restarts, so random init
annealed at tol=1e-4.

Prints the chosen n, per-candidate scores, and the steady-state wall
(min of 2 — the sweep is one compiled program after the first call;
a second process run re-uses the persistent cache).

    python benchmarks/probe_selection_scale.py [--padded|--sequential]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from linearcorex_tpu.models.selection import pick_n_hidden
from linearcorex_tpu.utils.compile_cache import ensure_compile_cache

ap = argparse.ArgumentParser()
ap.add_argument("--sequential", action="store_true")
ap.add_argument("--max-n", type=int, default=16)
ap.add_argument("--repeat", type=int, default=2)
ap.add_argument("--p", type=int, default=10_000,
                help="number of variables (cfg5-scale run: 100000)")
ap.add_argument("--n", type=int, default=10_000)
args = ap.parse_args()

ensure_compile_cache()
n, p, m_true = args.n, args.p, 12


@jax.jit
def make_data():
    kz, ke = jax.random.split(jax.random.PRNGKey(11))
    z = jax.random.normal(kz, (n, m_true), jnp.float32)
    e = jax.random.normal(ke, (n, p), jnp.float32)
    x = jnp.repeat(z, p // m_true + 1, axis=1)[:, :p] * 0.8 + 0.6 * e
    return (x - x.mean(0)) / x.std(0)


x = make_data()
x.block_until_ready()

kw = dict(repeat=args.repeat, max_n_hidden=args.max_n, seed=0,
          criterion="heldout", padded_sweep=not args.sequential,
          max_iter=500, tol=1e-4, anneal=True, record_history=False,
          matmul_dtype="int8", moment_strategy="samples")

t0 = time.perf_counter()
best, scores = pick_n_hidden(x, **kw)
first = time.perf_counter() - t0
t0 = time.perf_counter()
best2, scores2 = pick_n_hidden(x, **kw)
steady = time.perf_counter() - t0
mode = "sequential" if args.sequential else "padded"
print(f"selection p={p} n={n} m_true={m_true} max_n={args.max_n} "
      f"repeat={args.repeat} [{mode}]: chose n={best} "
      f"(first {first:.1f} s, steady {steady:.1f} s)", flush=True)
print("scores:", np.array2string(np.asarray(scores), precision=4),
      flush=True)
assert best == best2
