"""Checkpoint / resume for fitted Corex state (SURVEY.md §5).

The reference offers warm restarts through the `pretrained_weights`
constructor arg and otherwise relies on pickling the estimator object
(`[U] linearcorex/linearcorex.py :: Corex.__init__(pretrained_weights=...)`).
Here checkpointing is first-class: the learned state (ws, theta, moments,
config) is one flat dict of arrays saved as a portable .npz, so a fit can be
resumed (`Corex.fit(init_ws=...)` keeps warm-start semantics), inference can
run without refitting, and long anneal schedules can be snapshotted at stage
boundaries. No pickle: the format is inspectable arrays + a JSON config
string.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from linearcorex_tpu.config import CorexConfig, PreprocessConfig
from linearcorex_tpu.models.corex import Corex
from linearcorex_tpu.ops.moments import Moments
from linearcorex_tpu.ops.preprocessing import Theta

__all__ = ["save_corex", "load_corex"]

_FORMAT_VERSION = 1


def save_corex(model: Corex, path: str) -> None:
    """Save a fitted Corex to `path` (.npz). One device→host pull, by
    explicit user request (device→host is the slow path on this attachment,
    BASELINE.md §2)."""
    if model.ws is None or model.moments is None:
        raise ValueError("model is not fitted")
    meta = {
        "format_version": _FORMAT_VERSION,
        "config": dataclasses.asdict(model.config),
        "pre_config": dataclasses.asdict(model.pre_config),
        "seed": model.seed,
        "nv": model.nv,
        "n_samples": model.n_samples,
    }
    arrays = {
        "ws": np.asarray(model.ws),
        "theta_mean": np.asarray(model.theta.mean),
        "theta_std": np.asarray(model.theta.std),
        "meta_json": np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8),
    }
    for name, val in model.moments._asdict().items():
        arrays[f"mom_{name}"] = np.asarray(val)
    np.savez(path, **arrays)


def load_corex(path: str) -> Corex:
    """Reconstruct a fitted Corex (inference-ready; fit() warm-starts from
    the stored weights)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta_json"]).decode())
        if meta["format_version"] > _FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {meta['format_version']} is newer than "
                f"this library ({_FORMAT_VERSION})")
        cfg = CorexConfig(**meta["config"])
        pre = PreprocessConfig(**meta["pre_config"])
        model = Corex(
            n_hidden=cfg.n_hidden, max_iter=cfg.max_iter, tol=cfg.tol,
            anneal=cfg.anneal, missing_values=pre.missing_values,
            discourage_overlap=cfg.discourage_overlap,
            gaussianize=pre.gaussianize, y_scale=cfg.y_scale,
            seed=meta["seed"], dtype=cfg.dtype,
            moment_strategy=cfg.moment_strategy,
            record_history=cfg.record_history)
        dt = jnp.dtype(cfg.dtype)
        model.ws = jnp.asarray(z["ws"], dt)
        model.theta = Theta(mean=jnp.asarray(z["theta_mean"], dt),
                            std=jnp.asarray(z["theta_std"], dt))
        mom_fields = {name: jnp.asarray(z[f"mom_{name}"])
                      for name in Moments._fields}
        model.moments = Moments(**mom_fields)
        model.nv = meta["nv"]
        model.n_samples = meta["n_samples"]
    return model
