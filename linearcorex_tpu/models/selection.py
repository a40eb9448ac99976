"""Model selection: `pick_n_hidden` (SURVEY.md §2.7, layer L6).

Parity anchor: `[U] linearcorex/linearcorex.py :: pick_n_hidden` — fit Corex
for increasing n_hidden with `repeat` random restarts each (keep the best
TC), stop when additional factors stop increasing TC; return the chosen n.

TPU-native difference (SURVEY.md §3.5: "rebuild as vmapped batched solves"):
the WHOLE scan — every (n_hidden candidate, restart) pair — is one compiled
program. Candidates share the padded factor axis max_n_hidden; candidate
nh's initial weights zero the surplus rows, and zero rows are an invariant
of the solver (their gradient is exactly zero: rho=0 ⇒ aa row = 0,
hmat/coef contributions = 0 — the same mechanism by which surplus factors
die to zero TC, tests/test_robustness.py) and contribute 0 to TCs and a
constant to the objective, so the padded fit reproduces the dedicated
nh-factor fit's trajectory for the active rows (bit-exact in float64; in
float32 the wider GEMM's tiling introduces rounding-level divergence).
Measured on the v5e attachment (p=1024, max_n=8, repeat=4, max_iter=2000):
12.2 s vs 16.1 s sequential — 1.33x end-to-end; the win scales with
per-candidate compile cost, the price is max_n/nh extra FLOPs per
candidate (benchmarks/RESULTS.md).

The one semantic difference vs per-candidate fits: the nh=1 candidate rides
the shared multi-factor anneal schedule (a dedicated n_hidden=1 fit skips
annealing); annealing only smooths the landscape, so its best-restart TC is
unchanged or better. Set padded_sweep=False for the reference's sequential
per-candidate loop (early-stops on saturation; one compile per candidate).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from linearcorex_tpu.config import CorexConfig
from linearcorex_tpu.models.corex import Corex
from linearcorex_tpu.ops import moments as M
from linearcorex_tpu.ops import preprocessing as P
from linearcorex_tpu.parallel.restarts import (fit_restarts, init_restarts,
                                               seed_base)

__all__ = ["pick_n_hidden"]


def _padded_inits(max_n: int, repeat: int, p: int, seed: Optional[int],
                  dtype):
    """(max_n*repeat, max_n, p) init stack: candidate k (n_hidden=k+1),
    restart r is RandomState(base+r).normal(size=(max_n, p)) with rows
    >= k+1 zeroed. NumPy fills row-major, so the active rows are bit-equal
    to the dedicated init_restarts(repeat, k+1, p, seed) draw."""
    import jax.numpy as jnp

    base = seed_base(seed)
    full = np.stack([
        np.random.RandomState(base + r).normal(
            loc=0.0, scale=1.0 / np.sqrt(p), size=(max_n, p))
        for r in range(repeat)
    ])                                                  # (repeat, max_n, p)
    mask = (np.arange(max_n)[None, :] <= np.arange(max_n)[:, None])
    # (max_n, repeat, max_n, p): candidate-major so tc reshapes cleanly
    w0 = full[None, :, :, :] * mask[:, None, :, None]
    return jnp.asarray(w0.reshape(max_n * repeat, max_n, p), dtype=dtype)


def _best_n_from_scores(scores, tc_gain_tol: float) -> int:
    """The reference's saturation rule over the score curve, INCLUDING its
    early stop: scanning in order, a candidate that improves best-so-far TC
    by more than tc_gain_tol becomes best; two consecutive non-improving
    candidates end the scan. Applying the identical rule here keeps the
    padded sweep's best_n equal to the sequential loop's on any score
    curve (a later rebound past the stop point is ignored by BOTH paths)."""
    best_n, best_tc = 1, -np.inf
    for k, tc in enumerate(scores, start=1):
        if tc > best_tc + tc_gain_tol:
            best_tc, best_n = tc, k
        elif k > best_n + 1:
            break
    return best_n


def pick_n_hidden(data, repeat: int = 1, max_n_hidden: Optional[int] = None,
                  verbose: bool = False, tc_gain_tol: float = 1e-3,
                  dtype: str = "float32", seed: Optional[int] = None,
                  padded_sweep: bool = True, **corex_kwargs):
    """Scan n_hidden until TC saturates; returns (best_n, scores).

    scores[k] is the best TC over `repeat` restarts at n_hidden = k+1.
    Extra kwargs flow into `CorexConfig` (max_iter, tol, anneal, ...).
    padded_sweep=True (default) runs the whole (candidate, restart) grid as
    ONE compiled batched program; False runs the sequential per-candidate
    loop with early stopping.
    """
    import jax.numpy as jnp

    if repeat < 1:
        raise ValueError(f"repeat must be >= 1, got {repeat}")
    if max_n_hidden is not None and max_n_hidden < 1:
        raise ValueError(f"max_n_hidden must be >= 1, got {max_n_hidden}")
    x = jnp.asarray(np.asarray(data), dtype=jnp.dtype(dtype))
    n, p = x.shape
    if max_n_hidden is None:
        max_n_hidden = min(p, 16)
    # Preprocess once; every candidate fit shares the standardized data
    # (and the Gram matrix, if the fast path applies).
    xp, _ = P.fit_preprocess(x, corex_kwargs.pop("gaussianize", "standard"),
                             corex_kwargs.pop("missing_values", None))
    probe = CorexConfig(n_hidden=1, dtype=dtype, record_history=False,
                        **corex_kwargs)
    strategy = probe.pick_strategy(n, p)
    shared = M.compute_gram(xp) if strategy == "gram" else xp
    if probe.matmul_dtype == "int8":
        shared = M.quantize_samples(shared)   # X or Σ, per-tensor scale

    if padded_sweep:
        cfg = CorexConfig(n_hidden=max_n_hidden, dtype=dtype,
                          record_history=False, **corex_kwargs)
        w0 = _padded_inits(max_n_hidden, repeat, p, seed, jnp.dtype(dtype))
        _, mom_b, _ = fit_restarts(shared, w0, cfg, strategy,
                                   n_samples=n)
        tc = np.asarray(mom_b.tc).reshape(max_n_hidden, repeat)
        scores = tc.max(axis=1)
        if verbose:
            for nh, s in enumerate(scores, start=1):
                print(f"n_hidden={nh}: best TC over {repeat} restarts = "
                      f"{s:.5f}")
        return _best_n_from_scores(scores, tc_gain_tol), np.array(scores)

    scores = []
    best_n, best_tc_overall = 1, -np.inf
    for nh in range(1, max_n_hidden + 1):
        cfg = CorexConfig(n_hidden=nh, dtype=dtype, record_history=False,
                          **corex_kwargs)
        w0 = init_restarts(repeat, nh, p, seed, jnp.dtype(dtype))
        _, mom_b, _ = fit_restarts(shared, w0, cfg, strategy,
                                   n_samples=n)
        tc_best = float(np.max(np.asarray(mom_b.tc)))
        scores.append(tc_best)
        if verbose:
            print(f"n_hidden={nh}: best TC over {repeat} restarts = "
                  f"{tc_best:.5f}")
        if tc_best > best_tc_overall + tc_gain_tol:
            best_tc_overall, best_n = tc_best, nh
        elif nh > best_n + 1:
            break  # two consecutive values added nothing: saturated
    return best_n, np.array(scores)
