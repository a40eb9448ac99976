"""Basic Linear CorEx workflow — mirrors the reference README usage.

Run: python examples/basic_usage.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import linearcorex_tpu as lc


def make_block_data(n=2000, p=64, m=8, strength=0.9, seed=0):
    rng = np.random.RandomState(seed)
    z = rng.normal(size=(n, m))
    x = np.empty((n, p))
    k = p // m
    for j in range(m):
        for i in range(k):
            x[:, j * k + i] = strength * z[:, j] + np.sqrt(
                1 - strength ** 2) * rng.normal(size=n)
    return x


def main():
    x = make_block_data()

    # Fit: the whole annealed optimization is one compiled device program.
    model = lc.Corex(n_hidden=8, seed=0, verbose=True).fit(x)

    print(f"\ntotal correlation explained: {model.tc:.3f}")
    print(f"per-factor TC (sorted):      {np.asarray(model.tcs).round(2)}")
    print(f"variable clusters:           {np.asarray(model.clusters)}")

    # Factors and reconstruction
    y = model.transform(x)
    x_hat = model.predict(y)
    resid = np.linalg.norm(np.asarray(x_hat) - x) / np.linalg.norm(x)
    print(f"reconstruction rel. error:   {resid:.3f}")

    # Regularized covariance estimate (the paper's headline use-case)
    sigma = model.get_covariance()
    print(f"covariance estimate shape:   {sigma.shape}")

    # Held-out model evaluation (sklearn scoring convention)
    print(f"mean log-likelihood:         {float(model.score(x)):.3f}")

    # Model selection: how many factors does the data support?
    best_n, scores = lc.pick_n_hidden(x, repeat=2, max_n_hidden=12, seed=0)
    print(f"pick_n_hidden chose:         {best_n}")
    best_cv, _ = lc.pick_n_hidden(x, repeat=2, max_n_hidden=12, seed=0,
                                  criterion="heldout")
    print(f"held-out criterion chose:    {best_cv}")

    # Throughput recipes (measured at p=100k scale — benchmarks/RESULTS.md):
    # preset='throughput' bundles the init-study winner (int8 + spectral
    # init + anneal=False + tol=1e-4) for strong-structure data;
    # n_restarts=4 runs four spectral lanes (one random projection each)
    # as ONE program and keeps the best TC — at p=100k the best-of-4
    # recovers basins that 3 of 4 single seeds miss by 6-9%, at HALF the
    # wall of sequential refits. stage_tol_factor=10 keeps full
    # annealing but runs the non-final stages at a looser tol (1.9-2.4x
    # fewer iterations on weak structure at equal TC — the regime where
    # annealing is essential).
    fast = lc.Corex(n_hidden=8, seed=0, preset="throughput",
                    n_restarts=4).fit(x)
    annealed = lc.Corex(n_hidden=8, seed=0, stage_tol_factor=10.0).fit(x)
    print(f"preset='throughput' TC:      {float(fast.tc):.3f}  "
          "(int8 + no anneal: built for large strong-structure data — "
          "at toy scale the annealed path above wins)")
    print(f"stage_tol_factor=10 TC:      {float(annealed.tc):.3f}")

    # Persistence
    lc.save_corex(model, "/tmp/corex_model.npz")
    restored = lc.load_corex("/tmp/corex_model.npz")
    assert abs(restored.tc - model.tc) < 1e-9
    print("checkpoint round-trip:       ok")


if __name__ == "__main__":
    main()
