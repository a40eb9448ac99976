"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per standard JAX practice
(SURVEY.md §4.2 item 3) the sharded code paths are exercised on 8 virtual CPU
devices. `bench.py` is what runs on the real TPU chip.

These env vars must be set before JAX initializes its backends, hence this
conftest (imported by pytest before any test module imports jax).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


def block_data(n=1000, p=64, m=8, seed=0, strength=0.9):
    """Synthetic block-diagonal Gaussian data: p variables in m equal blocks,
    each driven by one latent factor with loading `strength` (the north-star
    synthetic recovery setup, BASELINE.json configs 1-2)."""
    rng = np.random.RandomState(seed)
    z = rng.normal(size=(n, m))
    k = p // m
    x = np.empty((n, p))
    for j in range(m):
        for i in range(k):
            x[:, j * k + i] = strength * z[:, j] + np.sqrt(
                1.0 - strength ** 2) * rng.normal(size=n)
    return x


@pytest.fixture
def small_block_data():
    return block_data(n=500, p=32, m=4, seed=3)


@pytest.fixture
def med_block_data():
    return block_data(n=1000, p=64, m=8, seed=0)
