"""Model selection: `pick_n_hidden` (SURVEY.md §2.7, layer L6).

Parity anchor: `[U] linearcorex/linearcorex.py :: pick_n_hidden` — fit Corex
for increasing n_hidden with `repeat` random restarts each (keep the best
TC), stop when additional factors stop increasing TC; return the chosen n.

TPU-native difference: the restart axis is a single vmapped program per
n_hidden value (SURVEY.md §3.5 "embarrassingly parallel"), so `repeat=32`
costs one compile + one batched solve instead of 32 sequential fits. The
scan over n_hidden values stays a Python loop (each n is a different compiled
shape; the loop is short and decisions are host-side by design).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from linearcorex_tpu.config import CorexConfig
from linearcorex_tpu.models.corex import Corex
from linearcorex_tpu.ops import moments as M
from linearcorex_tpu.ops import preprocessing as P
from linearcorex_tpu.parallel.restarts import fit_restarts, init_restarts

__all__ = ["pick_n_hidden"]


def pick_n_hidden(data, repeat: int = 1, max_n_hidden: Optional[int] = None,
                  verbose: bool = False, tc_gain_tol: float = 1e-3,
                  dtype: str = "float32", seed: Optional[int] = None,
                  **corex_kwargs):
    """Scan n_hidden until TC saturates; returns (best_n, scores).

    scores[k] is the best TC over `repeat` restarts at n_hidden = k+1.
    Extra kwargs flow into `CorexConfig` (max_iter, tol, anneal, ...).
    """
    import jax.numpy as jnp

    if repeat < 1:
        raise ValueError(f"repeat must be >= 1, got {repeat}")
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
    if strategy == "gram_pallas":
        # the fused product kernel needs lane-aligned m; this scan fits
        # small n_hidden values, so fall back to the XLA gram path
        strategy = "gram"
    shared = M.compute_gram(xp) if strategy.startswith("gram") else xp

    scores = []
    best_n, best_tc_overall = 1, -np.inf
    for nh in range(1, max_n_hidden + 1):
        cfg = CorexConfig(n_hidden=nh, dtype=dtype, record_history=False,
                          **corex_kwargs)
        w0 = init_restarts(repeat, nh, p, seed, jnp.dtype(dtype))
        _, mom_b, _ = fit_restarts(shared, w0, cfg, strategy)
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
