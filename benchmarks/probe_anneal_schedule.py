"""CPU study: can the 0.6^k anneal schedule be COARSENED (fewer stages)
at equal TC, and does that compose with stage_tol_factor=10?

Protocol mirrors the stage-tol study (benchmarks/RESULTS.md): p=2048,
m=64, n=4096, f32 momentum, tol=1e-5, block-structured data (64 planted
factors, in-block corr = loading^2), seeds per regime. Iteration counts
and TC are platform-independent (the solver is step-matched with the f64
oracle), so the wall win on TPU follows from the measured
t = 0.89 ms x iters + overhead law.

Schedule variants are injected via a CorexConfig SUBCLASS overriding
`anneal_schedule()` — each variant is a distinct class so jit static-arg
equality cannot alias two schedules to one compiled program.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from linearcorex_tpu.config import CorexConfig
from linearcorex_tpu.core.solver import fit_core
from linearcorex_tpu.models.corex import _make_obj_grad, resolve_config

n, p, m = 4096, 2048, 64

SCHEDULES = {
    "full7": (0.6, 0.36, 0.216, 0.1296, 0.07776, 0.046656, 0.0),
    "skip2": (0.6, 0.216, 0.07776, 0.0),
    "skip3": (0.6, 0.1296, 0.0),
    "two": (0.6, 0.0),
}


def make_cfg_cls(sched):
    class _Cfg(CorexConfig):
        def anneal_schedule(self):
            if self.eps_override is not None:
                return (self.eps_override,)
            return sched
    return _Cfg


CFG_CLS = {name: make_cfg_cls(s) for name, s in SCHEDULES.items()}


@functools.partial(jax.jit, static_argnums=(2,))
def make_data(key, loading, _tag):
    kz, ke = jax.random.split(key)
    z = jax.random.normal(kz, (n, m), jnp.float32)
    e = jax.random.normal(ke, (n, p), jnp.float32)
    x = jnp.repeat(z, p // m, axis=1) * loading + jnp.sqrt(
        1.0 - loading ** 2) * e
    x = (x - x.mean(0)) / x.std(0)
    return x.T @ x / n


@functools.partial(jax.jit, static_argnums=(2, 3))
def run(d, w0, cfg, strat):
    return fit_core(_make_obj_grad(d, cfg, strat), w0, cfg)


def main():
    seeds = (0, 1, 2)
    for loading, name in ((0.3, "weak"), (0.9, "strong")):
        for sched_name, cls in CFG_CLS.items():
            for factor in (1.0, 10.0):
                for seed in seeds:
                    g = make_data(jax.random.PRNGKey(seed), loading,
                                  name)
                    w0 = jnp.asarray(np.random.RandomState(seed).normal(
                        scale=1.0 / np.sqrt(p), size=(m, p)), jnp.float32)
                    cfg = cls(n_hidden=m, max_iter=2000, tol=1e-5,
                              anneal=True, record_history=False,
                              optimizer="momentum",
                              stage_tol_factor=factor)
                    cfg = resolve_config(cfg, p, n_samples=n)
                    ws, diag = run(g, w0, cfg, "gram")
                    total = int(np.asarray(diag.iters_per_stage).sum())
                    tc = float(diag.tc_per_stage[-1])
                    print(f"{name:6s} {sched_name:5s} factor={factor:>4.0f} "
                          f"seed={seed}: {total:5d} iters, TC={tc:9.3f}",
                          flush=True)


if __name__ == "__main__":
    main()
