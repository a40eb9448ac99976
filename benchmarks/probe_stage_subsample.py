"""CPU study: can the NON-FINAL anneal stages run on a row SUBSAMPLE of
X at equal final TC? The high-eps stages only need a coarse W (they exist
to smooth the landscape, SURVEY.md §2.4), and samples-path iteration cost
is linear in n — early stages at n/4 would cost 4x less per iteration.
The final eps=0 stage always runs on the FULL data at `tol`, so the
returned optimum's guarantee is unchanged (same contract shape as
stage_tol_factor).

Protocol mirrors the stage-tol study (benchmarks/RESULTS.md): p=2048,
m=64, n=4096, SAMPLES strategy (subsampling only matters there), f32
momentum, tol=1e-5, block data (64 planted factors, in-block corr =
loading^2), 5 seeds x 2 regimes. Staging mirrors the checkpoint driver:
one single-stage program per eps (eps_override, stage tol pre-baked),
warm-starting W — the exact two-operand production driver this would
ship as. Cost metric: weighted iterations = sub_iters x (n_sub/n) +
full-stage iters (per-iteration cost is ~linear in n on this path).
"""
import sys

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from linearcorex_tpu.config import CorexConfig
from linearcorex_tpu.core.solver import fit_core
from linearcorex_tpu.models.corex import _make_obj_grad, resolve_config

if "--tpu" in sys.argv:
    # iteration counts + TC are hardware-independent; the TPU runs the
    # study orders faster than this box's single CPU core (the remote
    # persistent cache amortizes the ~30 per-stage-program compiles)
    from linearcorex_tpu.utils.compile_cache import ensure_compile_cache
    ensure_compile_cache()

n, p, m = 4096, 2048, 64


@functools.partial(jax.jit, static_argnums=(2,))
def make_x(key, loading, _tag):
    kz, ke = jax.random.split(key)
    z = jax.random.normal(kz, (n, m), jnp.float32)
    e = jax.random.normal(ke, (n, p), jnp.float32)
    x = jnp.repeat(z, p // m, axis=1) * loading + jnp.sqrt(
        1.0 - loading ** 2) * e
    return (x - x.mean(0)) / x.std(0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def run(d, w0, cfg, strat):
    return fit_core(_make_obj_grad(d, cfg, strat), w0, cfg)


def staged_fit(x_sub, x_full, w0, cfg, frac):
    """Stages 0..k-1 on x_sub (stage tol = tol x factor), final stage on
    x_full at tol — the checkpoint-driver staging. Returns
    (tc, weighted_iters, raw_iters)."""
    eps_sched = cfg.anneal_schedule()
    tol_sched = cfg.tol_schedule()
    ws = w0
    weighted = 0.0
    raw = 0
    for eps, tol in zip(eps_sched[:-1], tol_sched[:-1]):
        scfg = dataclasses.replace(cfg, eps_override=eps, tol=tol,
                                   stage_tol_factor=1.0)
        ws, diag = run(x_sub, ws, scfg, "samples")
        it = int(np.asarray(diag.iters_per_stage).sum())
        weighted += it * frac
        raw += it
    fcfg = dataclasses.replace(cfg, eps_override=eps_sched[-1],
                               tol=cfg.tol, stage_tol_factor=1.0)
    ws, diag = run(x_full, ws, fcfg, "samples")
    it = int(np.asarray(diag.iters_per_stage).sum())
    return float(diag.tc_per_stage[-1]), weighted + it, raw + it


def main():
    seeds = (0, 1, 2, 3, 4)
    for loading, name in ((0.3, "weak"), (0.9, "strong")):
        for seed in seeds:
            x = make_x(jax.random.PRNGKey(seed), loading, name)
            w0 = jnp.asarray(np.random.RandomState(seed).normal(
                scale=1.0 / np.sqrt(p), size=(m, p)), jnp.float32)
            rows = []
            for factor in (1.0, 10.0):
                cfg = resolve_config(
                    CorexConfig(n_hidden=m, max_iter=2000, tol=1e-5,
                                anneal=True, record_history=False,
                                optimizer="momentum",
                                stage_tol_factor=factor),
                    p, n_samples=n)
                # baseline: ONE program, full data everywhere
                ws, diag = run(x, w0, cfg, "samples")
                base_it = int(np.asarray(diag.iters_per_stage).sum())
                base_tc = float(diag.tc_per_stage[-1])
                rows.append((f"full  f={factor:<3.0f}", base_tc,
                             float(base_it), base_it))
                # subsampled early stages (staged programs)
                for frac_name, frac in (("n/4", 0.25), ("n/16", 0.0625)):
                    n_sub = int(n * frac)
                    tc, wit, rit = staged_fit(x[:n_sub], x, w0, cfg, frac)
                    rows.append((f"{frac_name:4s}  f={factor:<3.0f}", tc,
                                 wit, rit))
            for tag, tc, wit, rit in rows:
                print(f"{name:6s} seed={seed} {tag}: TC={tc:9.3f} "
                      f"weighted_iters={wit:7.1f} raw_iters={rit:5d}",
                      flush=True)


if __name__ == "__main__":
    main()
