"""One-off probe: explain the in-harness 837 it/s vs bench.py 978 it/s gap
for the northstar int8_gram_fp row (VERDICT r2 Weak #1).

Hypothesis: per-program fixed overhead (dispatch + scalar-fetch sync)
amortized over different iteration counts — run_benchmarks times a
100-iteration program (its --iters default), bench.py a 200-iteration
one. 0.172 ms/iter of rate difference x 100 iters ≈ 17 ms of fixed
overhead would explain the whole gap. This script measures the SAME
program at several iteration counts in one process.
"""

import functools
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from linearcorex_tpu.config import CorexConfig
    from linearcorex_tpu.core.solver import fit_core
    from linearcorex_tpu.models.corex import _make_obj_grad, resolve_config
    from linearcorex_tpu.ops import moments as M
    from linearcorex_tpu.utils.compile_cache import ensure_compile_cache
    from linearcorex_tpu.utils.profiling import iteration_rate

    ensure_compile_cache()
    n, p, m = 10_000, 10_000, 512
    key_z, key_e = jax.random.split(jax.random.PRNGKey(0))

    @jax.jit
    def make_data():
        z = jax.random.normal(key_z, (n, 100), jnp.float32)
        e = jax.random.normal(key_e, (n, p), jnp.float32)
        x = jnp.repeat(z, p // 100, axis=1) * 0.9 + 0.436 * e
        return (x - x.mean(0)) / x.std(0)

    x = make_data()
    gram = M.quantize_gram(jax.jit(M.compute_gram)(x))
    gram.q.block_until_ready()

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def run(d, w0, cfg, strat):
        return fit_core(_make_obj_grad(d, cfg, strat), w0, cfg)

    w0 = jnp.asarray(np.random.RandomState(1).normal(
        scale=1.0 / np.sqrt(p), size=(m, p)), jnp.float32)
    out = {}
    for iters in (50, 100, 200, 400):
        cfg = resolve_config(
            CorexConfig(n_hidden=m, max_iter=iters, tol=0.0, anneal=False,
                        record_history=False, matmul_dtype="int8",
                        optimizer="auto"), p, n_samples=n)
        ips, total, dt = iteration_rate(
            functools.partial(run, gram, w0, cfg, "gram"))
        out[iters] = {"it_per_s": round(ips, 1),
                      "ms_per_iter": round(1000.0 / ips, 3)}
        print(json.dumps({"iters": iters, **out[iters]}), flush=True)
    # fixed-overhead fit: t(iters) = a*iters + b  (least squares)
    ks = sorted(out)
    t = np.array([ks[i] * 1e-3 * out[ks[i]]["ms_per_iter"]
                  for i in range(len(ks))])
    A = np.vstack([ks, np.ones(len(ks))]).T
    a, b = np.linalg.lstsq(A, t, rcond=None)[0]
    print(json.dumps({"per_iter_ms": round(a * 1e3, 3),
                      "fixed_overhead_ms": round(b * 1e3, 1)}))


if __name__ == "__main__":
    main()
