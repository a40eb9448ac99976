"""TPU wall measurement: stage_subsample at cfg5 scale (p=100k, m=512,
n=10k), heavy-ball annealed, BOTH structure regimes, 2 init seeds —
the scale confirmation for benchmarks/RESULTS.md "stage-subsample
study" (small-scale CPU-protocol table measured on TPU 2026-08-19),
including the int8 interaction the stage-tol study showed is
scale-dependent.

Drives the PRODUCTION two-program driver (`models.corex.
_fit_staged_subsample`: anneal-schedule prefix on x[::k], final eps=0
stage on the full rows at `tol`) against the one-program baseline, so
the measured wall includes the staging's extra dispatch/sync cost.
Protocol otherwise mirrors probe_stage_tol_cfg5.py: on-device data gen,
scalar-fetch close, min of 3.

Usage:
    python benchmarks/probe_stage_subsample_cfg5.py
        [--dtype int8|float32] [--tol T] [--fractions 1,0.25]
"""
import argparse
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
from linearcorex_tpu.models.corex import (_fit_staged_subsample,
                                          _make_obj_grad)
from linearcorex_tpu.ops.moments import quantize_samples
from linearcorex_tpu.utils.compile_cache import ensure_compile_cache

ap = argparse.ArgumentParser()
ap.add_argument("--dtype", default="float32", choices=("int8", "float32"))
ap.add_argument("--tol", type=float, default=None,
                help="default: 1e-4 for int8, 1e-5 for float32")
ap.add_argument("--fractions", default="1,0.25")
args = ap.parse_args()
tol = args.tol if args.tol is not None else (
    1e-4 if args.dtype == "int8" else 1e-5)
fractions = tuple(float(f) for f in args.fractions.split(","))

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


w0s = {seed: jnp.asarray(np.random.RandomState(seed).normal(
    scale=1.0 / np.sqrt(p), size=(m, p)), jnp.float32) for seed in (1, 2)}

for loading, name in ((0.9, "strong"), (0.3, "weak")):
    keys = jax.random.split(jax.random.PRNGKey(7 if loading < 0.5 else 0))
    x = make_data(keys, loading)
    if args.dtype == "int8":
        operand = jax.jit(quantize_samples)(x)
        operand.q.block_until_ready()
        x.delete()  # HBM headroom (probe_stage_tol_cfg5 observed OOM)
    else:
        operand = x
        operand.block_until_ready()
    for frac in fractions:
        cfg = CorexConfig(n_hidden=m, max_iter=1000, tol=tol, anneal=True,
                          record_history=False, matmul_dtype=args.dtype,
                          optimizer="momentum", stage_subsample=frac)

        def fit(w0, cfg=cfg):
            if cfg.stage_subsample < 1.0:
                ws, _, diag = _fit_staged_subsample(operand, w0, cfg,
                                                    "samples")
                return ws, diag
            c1 = dataclasses.replace(cfg, stage_subsample=1.0)
            return run(operand, w0, c1, "samples")

        for seed, w0 in w0s.items():
            fit(w0)[1].tc_per_stage.block_until_ready()
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ws, diag = fit(w0)
                tc = float(diag.tc_per_stage[-1])
                dt = min(dt, time.perf_counter() - t0)
            total = int(np.asarray(diag.iters_per_stage).sum())
            print(f"{name} {args.dtype} tol={tol:g} frac={frac:<5g} "
                  f"seed={seed}: {total:4d} raw iters, {dt:6.2f} s, "
                  f"TC={tc:.1f}", flush=True)
    if args.dtype == "float32":
        x.delete()
