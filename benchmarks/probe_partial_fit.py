"""Probe: what does an incremental partial_fit call cost at scale, and
does the warm start pay?

Stream p=10k data in n=1000 row batches through `Corex.partial_fit` and
measure each call's solver iterations + wall, against the baseline of a
cold `fit` on the cumulative data at each step. Two configs:

- anneal=True (reference schedule): every call re-runs the FULL eps
  ladder from the warm W — the high-eps stages re-scramble a converged
  init, so the warm start may buy little here.
- anneal=False: the warm start lands near the new optimum (the
  accumulated moments move O(batch/n) per call), so late calls should
  converge in a handful of iterations.

Output: one JSON line per call; summary line at the end. The measured
recommendation lands in docs/API.md's partial_fit row.

Timing discipline per BASELINE.md §2: the solve is closed by a scalar
fetch inside partial_fit's diagnostics read; walls here are single-shot
per call (each call is a DIFFERENT program state — min-of-3 would refit
identical moments), so treat absolute walls as indicative and the
iteration counts as the robust signal.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def run(anneal, x, batches, m):
    import numpy as np

    import linearcorex_tpu as lc

    mdl = lc.Corex(n_hidden=m, seed=0, anneal=anneal, tol=1e-5,
                   max_iter=500, record_history=False)
    rows = []
    for k, (lo, hi) in enumerate(batches):
        t0 = time.perf_counter()
        mdl.partial_fit(x[lo:hi])
        wall = time.perf_counter() - t0
        iters = int(np.asarray(mdl.diagnostics.iters_per_stage).sum())
        rows.append({"call": k, "n_acc": mdl.n_samples, "iters": iters,
                     "wall_s": round(wall, 3), "tc": round(float(mdl.tc), 2)})
        print(json.dumps({"anneal": anneal, **rows[-1]}), flush=True)
    # cold-refit baseline on the full accumulated data (what a user
    # without partial_fit would re-run at the end of the stream)
    cold = lc.Corex(n_hidden=m, seed=0, anneal=anneal, tol=1e-5,
                    max_iter=500, record_history=False,
                    moment_strategy="gram")
    t0 = time.perf_counter()
    cold.fit(x)
    wall = time.perf_counter() - t0
    iters = int(np.asarray(cold.diagnostics.iters_per_stage).sum())
    print(json.dumps({"anneal": anneal, "cold_full_fit": True,
                      "iters": iters, "wall_s": round(wall, 3),
                      "tc": round(float(cold.tc), 2)}), flush=True)
    return rows


def main():
    import jax
    import jax.numpy as jnp

    n, p, m = 10_000, 10_000, 512
    key_z, key_e = jax.random.split(jax.random.PRNGKey(0))

    @jax.jit
    def make_data():
        z = jax.random.normal(key_z, (n, 100), jnp.float32)
        e = jax.random.normal(key_e, (n, p), jnp.float32)
        return jnp.repeat(z, p // 100, axis=1) * 0.9 + 0.436 * e

    x = make_data()
    x.block_until_ready()
    batches = [(i, i + 1000) for i in range(0, n, 1000)]
    for anneal in (False, True):
        rows = run(anneal, x, batches, m)
        tail = rows[len(rows) // 2:]
        print(json.dumps({
            "anneal": anneal,
            "late_call_iters_mean": round(
                sum(r["iters"] for r in tail) / len(tail), 1),
            "late_call_wall_mean_s": round(
                sum(r["wall_s"] for r in tail) / len(tail), 3)}),
            flush=True)


if __name__ == "__main__":
    main()
