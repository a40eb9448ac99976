"""Stacked (multi-layer) Linear CorEx (SURVEY.md §2.8 "PP" row, §7.2.5).

The reference supports hierarchical factor discovery by fitting a second
Corex on the first layer's latent factors (BASELINE.json config 4: "S&P 500
daily returns, 2-layer stacked Corex — layer-2 fits on layer-1 latent
factors Y"). Layers are sequential fits, not pipelined activations
(SURVEY.md §2.8), so this is API-level composition: `fit` trains layer k on
layer k-1's `transform` output; `transform` composes projections; `predict`
runs the posterior-mean reconstructions back down the stack.
"""

from __future__ import annotations

from typing import List, Sequence


from linearcorex_tpu.models.corex import Corex

__all__ = ["StackedCorex"]


class StackedCorex:
    """A stack of Corex layers; layer k fits the factors of layer k-1.

    Layer 1 takes the user's preprocessing options; deeper layers always
    standardize their (already continuous, roughly Gaussian) factor inputs.
    """

    def __init__(self, n_hiddens: Sequence[int], **corex_kwargs):
        if not n_hiddens:
            raise ValueError("n_hiddens must be non-empty")
        self.layers: List[Corex] = []
        deep_kwargs = dict(corex_kwargs)
        deep_kwargs["gaussianize"] = "standard"
        deep_kwargs.pop("missing_values", None)
        for k, m in enumerate(n_hiddens):
            self.layers.append(
                Corex(n_hidden=m, **(corex_kwargs if k == 0
                                     else deep_kwargs)))

    def fit(self, x, y=None, mesh=None, sharding_plan=None):
        """Fit layer by layer; `y` is accepted-and-ignored (unsupervised —
        the sklearn slot, mirroring `Corex.fit`); `mesh`/`sharding_plan`
        pass through to `Corex.fit(mesh=...)`. Only layer 1 sees the full
        p-wide data, so
        the var/factor axes of the plan apply to layer 1 ONLY — deeper
        layers fit on narrow (n, m_k) factor matrices that rarely divide
        those mesh extents (and don't need them); they keep just the
        sample-axis sharding (data/slice), which divides by construction
        (n is unchanged down the stack)."""
        del y
        data = x
        plan = sharding_plan
        for k, layer in enumerate(self.layers):
            if k == 1 and plan is not None and (plan.shard_vars
                                                or plan.shard_factors):
                import dataclasses
                plan = dataclasses.replace(plan, shard_vars=False,
                                           shard_factors=False)
            layer.fit(data, mesh=mesh, sharding_plan=plan)
            data = layer.transform(data)
        return self

    def transform(self, x, level: int = -1):
        """Factors at `level` (default: deepest layer)."""
        levels = range(len(self.layers)) if level == -1 \
            else range(level + 1)
        data = x
        for k in levels:
            data = self.layers[k].transform(data)
        return data

    def fit_transform(self, x, y=None):
        """sklearn convention: fit the stack, return the deepest factors
        (`y` ignored)."""
        del y
        self.fit(x)
        return self.transform(x)

    def transform_all(self, x):
        """List of factor matrices, one per layer (shallow → deep)."""
        out, data = [], x
        for layer in self.layers:
            data = layer.transform(data)
            out.append(data)
        return out

    def predict(self, y):
        """Reconstruct the input from the deepest factors."""
        data = y
        for layer in reversed(self.layers):
            data = layer.predict(data)
        return data

    def inverse_transform(self, y):
        """sklearn spelling of `predict`: deepest factors → input space."""
        return self.predict(y)

    @property
    def tcs(self):
        """Per-layer arrays of per-factor TC."""
        return [layer.tcs for layer in self.layers]

    @property
    def tc(self):
        """Total TC explained, summed over layers (the stacked objective's
        additive decomposition)."""
        return float(sum(layer.tc for layer in self.layers))

    @property
    def clusters(self):
        """Per-layer hard cluster assignments; clusters[0] assigns input
        variables to layer-1 factors, clusters[k] assigns layer-k factors
        to layer-(k+1) factors."""
        return [layer.clusters for layer in self.layers]
