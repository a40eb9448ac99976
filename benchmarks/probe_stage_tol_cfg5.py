"""TPU wall measurement: stage_tol_factor at cfg5 scale (p=100k, m=512,
n=10k), int8 heavy-ball annealed to tol=1e-4, BOTH structure regimes
(strong 0.9 = the cfg5 data; weak 0.3 = the annealing-essential data).
Protocol mirrors benchmarks/run_benchmarks.py::run_e2e_cfg5: on-device
data gen, one compiled program per fit, scalar-fetch close, min of 3.
"""
import dataclasses
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

ensure_compile_cache()
n, p, m = 10_000, 100_000, 512


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


w0 = jnp.asarray(np.random.RandomState(1).normal(
    scale=1.0 / np.sqrt(p), size=(m, p)), jnp.float32)

for loading, name in ((0.9, "strong"), (0.3, "weak")):
    keys = jax.random.split(jax.random.PRNGKey(7 if loading < 0.5 else 0))
    x = make_data(keys, loading)
    xq = jax.jit(quantize_samples)(x)
    xq.q.block_until_ready()
    for factor in (1.0, 10.0):
        cfg = CorexConfig(n_hidden=m, max_iter=1000, tol=1e-4, anneal=True,
                          record_history=False, matmul_dtype="int8",
                          optimizer="momentum", stage_tol_factor=factor)
        cfg = resolve_config(cfg, p)
        run(xq, w0, cfg, "samples")[1].tc_per_stage.block_until_ready()
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ws, diag = run(xq, w0, cfg, "samples")
            tc = float(diag.tc_per_stage[-1])
            dt = min(dt, time.perf_counter() - t0)
        total = int(np.asarray(diag.iters_per_stage).sum())
        print(f"{name} factor={factor:>4.0f}: {total:4d} iters, "
              f"{dt:6.2f} s, TC={tc:.1f}", flush=True)
