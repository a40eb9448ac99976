"""Primary benchmark: fit iterations/sec at p=10k, m=512 (BASELINE.json).

Baseline: single-core NumPy float64 measured at 12.72 s/iter for the
per-iteration moment step at this size (BASELINE.md §2) → 0.0786 it/s.

Configuration measured: the recommended production-THROUGHPUT config at
this shape — matmul_dtype='int8' (per-tensor-quantized Σ on the int8 MXU
path, 2x the bf16 rate) with optimizer='auto', which at n=p=10k resolves
to the damped closed-form fixed-point update (the reference's own
`_update_ws` iteration style: `[U] linearcorex/linearcorex.py ::
_update_ws`) on the precomputed-Gram strategy with the fused Pallas
chain kernel. One iteration = one int8 Σ·Wᵀ MXU GEMM + the fused moment
chain + the m x m fixed-point solve + damped accept/reject update.

Quality evidence for this configuration (benchmarks/RESULTS.md +
DESIGN.md): at this shape the fixed point converges to BETTER TC than
heavy-ball (e2e annealed 12810 vs 11564 at f32), and int8 quantization
matched or exceeded the f32 converged TC in every measured run
(heavy-ball gram: 11888 vs 11902; fp gram: 14905 vs 13162; cfg5 samples:
204361 vs 204386 — identical partitions) — the accept/reject line search
absorbs the quantization noise. int8 is an OPT-IN mode (pair with
tol>=1e-4; the f64 parity surface and the tol=1e-5 default stay f32).

On like-for-likeness of the vs_baseline ratio: the NumPy 12.72 s/iter
baseline is the reference's per-iteration cost — `_calculate_moments`
(two GEMMs) feeding its `_update_ws` fixed-point update — so the
fixed-point iteration measured here is the SAME iteration type.
Longitudinal note: rounds before 2026-08-16 reported this metric for
the f32 heavy-ball iteration (604 it/s / 7,685x), then f32 'auto'
(757 it/s); each config change is disclosed here and every constituent
row (f32/bf16/int8 x momentum/fixed_point, plus a samples-path
like-for-like row) is reported in benchmarks/RESULTS.md.

Measurement protocol for this TPU attachment (BASELINE.md §2 trap list):
- the whole K-iteration loop runs as ONE compiled program (a fit_core call
  with tol=0), so there are zero host round-trips inside the timed region;
- timing is closed by fetching a scalar (TC) — bulk device→host copies are
  pathologically slow here and scalar fetch forces execution;
- compile is excluded (untimed warmup call on the same shapes);
- min over 3 timed repeats (the attachment shows rare ~0.5 s hiccups).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import sys

import numpy as np

BASELINE_ITERS_PER_SEC = 1.0 / 12.72   # BASELINE.md §2, NumPy f64 1-core


def main():
    quick = "--quick" in sys.argv
    import jax

    # Persistent compilation cache: compiles dominate wall time on this
    # attachment (remote compile service); repeat bench runs hit the cache.
    # Shared wiring with the library entry points (utils/compile_cache.py).
    from linearcorex_tpu.utils.compile_cache import ensure_compile_cache
    ensure_compile_cache()
    import jax.numpy as jnp

    from linearcorex_tpu.config import CorexConfig
    from linearcorex_tpu.core.solver import fit_core
    from linearcorex_tpu.models.corex import _make_obj_grad, resolve_config
    from linearcorex_tpu.ops import moments as M
    from linearcorex_tpu.utils.profiling import iteration_rate

    if quick:
        n, p, m, iters = 1024, 512, 32, 50
    else:
        n, p, m, iters = 10_000, 10_000, 512, 200

    # synthetic block data generated ON DEVICE (host→device bulk copies are
    # pathologically slow through this attachment, BASELINE.md §2)
    n_blocks = 100 if p % 100 == 0 else 8
    k = p // n_blocks
    key_z, key_e = jax.random.split(jax.random.PRNGKey(0))

    @jax.jit
    def make_data():
        z = jax.random.normal(key_z, (n, n_blocks), jnp.float32)
        e = jax.random.normal(key_e, (n, p), jnp.float32)
        x = jnp.repeat(z, k, axis=1) * 0.9 + 0.436 * e
        return (x - x.mean(0)) / x.std(0)

    x = make_data()
    x.block_until_ready()

    # production strategy at this size: precomputed Gram (ops/moments.py),
    # int8-quantized (see module docstring for the quality evidence)
    gram = M.quantize_gram(M.compute_gram(x))
    gram.q.block_until_ready()

    # every 'auto' knob resolved exactly as Corex.fit would
    cfg = resolve_config(
        CorexConfig(n_hidden=m, max_iter=iters, tol=0.0, anneal=False,
                    record_history=False, dtype="float32",
                    matmul_dtype="int8", optimizer="auto"),
        p, n_samples=n)

    import functools

    # Data must be a jit ARGUMENT, not a closure: a closed-over array is
    # baked into the HLO as a constant — a 400 MB Gram constant exceeds the
    # remote-compile request limit on this attachment (HTTP 413).
    @functools.partial(jax.jit, static_argnums=(2, 3))
    def run(data, w0, cfg, strategy):
        return fit_core(_make_obj_grad(data, cfg, strategy), w0, cfg)

    w0 = jnp.asarray(
        np.random.RandomState(1).normal(scale=1.0 / np.sqrt(p),
                                        size=(m, p)), jnp.float32)
    # untimed warmup + min-of-3 timed calls, each closed by a scalar TC
    # fetch — the one shared implementation of the measurement protocol
    ips, n_iter, dt = iteration_rate(
        functools.partial(run, gram, w0, cfg, "gram"))
    result = {
        "metric": "fit_iterations_per_sec_p10k_m512"
        if not quick else "fit_iterations_per_sec_quick",
        "value": round(ips, 3),
        "unit": "iter/s",
        "vs_baseline": round(ips / BASELINE_ITERS_PER_SEC, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
