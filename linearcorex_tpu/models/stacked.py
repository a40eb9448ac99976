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

    @staticmethod
    def _layer_plan(plan, k):
        """Plan for layer k: the plan's var/factor axes describe the
        p-wide LAYER-1 operand only — deeper layers see narrow (n, m_k)
        factor matrices that rarely divide those mesh extents (and don't
        need them), so they keep just the sample-axis sharding
        (data/slice), which divides by construction (n is unchanged down
        the stack)."""
        if k == 0 or plan is None or not (plan.shard_vars
                                          or plan.shard_factors):
            return plan
        import dataclasses
        return dataclasses.replace(plan, shard_vars=False,
                                   shard_factors=False)

    def fit(self, x, y=None, mesh=None, sharding_plan=None):
        """Fit layer by layer; `y` is accepted-and-ignored (unsupervised —
        the sklearn slot, mirroring `Corex.fit`); `mesh`/`sharding_plan`
        pass through to `Corex.fit(mesh=...)` AND to the inter-layer
        transform, so a shard_vars stack never stages the p-wide X on one
        device (the `_layer_plan` demotion rule applies below layer 1)."""
        del y
        data = x
        for k, layer in enumerate(self.layers):
            lp = self._layer_plan(sharding_plan, k)
            layer.fit(data, mesh=mesh, sharding_plan=lp)
            if mesh is not None and sharding_plan is None \
                    and layer._serving_plan is None:
                # restart-only sweep layout (the mesh carries no serving
                # axes): the inter-layer transform runs single-device,
                # mirroring Corex.fit_transform's fallback — an EXPLICIT
                # sharding_plan keeps the loud validation instead
                data = layer.transform(data)
            else:
                data = layer.transform(data, mesh=mesh, sharding_plan=lp)
        return self

    def transform(self, x, level: int = -1, mesh=None, sharding_plan=None):
        """Factors at `level` (default: deepest layer). `mesh` serves the
        composed projection sharded (see `Corex.transform`)."""
        levels = range(len(self.layers)) if level == -1 \
            else range(level + 1)
        data = x
        for k in levels:
            data = self.layers[k].transform(
                data, mesh=mesh,
                sharding_plan=self._layer_plan(sharding_plan, k))
        return data

    def fit_transform(self, x, y=None, mesh=None, sharding_plan=None):
        """sklearn convention: fit the stack, return the deepest factors
        (`y` ignored); `mesh`/`sharding_plan` thread through fit AND the
        final transform (see `fit`)."""
        del y
        self.fit(x, mesh=mesh, sharding_plan=sharding_plan)
        if mesh is not None and sharding_plan is None and all(
                layer._serving_plan is None for layer in self.layers):
            # restart-only sweep layout: no serving axes on the mesh
            # (see fit above) — the just-fitted stack transforms
            # single-device
            return self.transform(x)
        return self.transform(x, mesh=mesh, sharding_plan=sharding_plan)

    def transform_all(self, x, mesh=None, sharding_plan=None):
        """List of factor matrices, one per layer (shallow → deep)."""
        out, data = [], x
        for k, layer in enumerate(self.layers):
            data = layer.transform(
                data, mesh=mesh,
                sharding_plan=self._layer_plan(sharding_plan, k))
            out.append(data)
        return out

    def predict(self, y, mesh=None, sharding_plan=None):
        """Reconstruct the input from the deepest factors. Under `mesh`
        the final (n, p) reconstruction comes back sharded per the plan
        (`Corex.predict`)."""
        data = y
        last = len(self.layers) - 1
        for i, layer in enumerate(reversed(self.layers)):
            data = layer.predict(
                data, mesh=mesh,
                sharding_plan=self._layer_plan(sharding_plan, last - i))
        return data

    def inverse_transform(self, y, mesh=None, sharding_plan=None):
        """sklearn spelling of `predict`: deepest factors → input space."""
        return self.predict(y, mesh=mesh, sharding_plan=sharding_plan)

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
