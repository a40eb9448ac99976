"""Fused Pallas kernel correctness (interpret mode on CPU; the compiled TPU
path is exercised by bench.py / benchmarks on hardware)."""

import jax.numpy as jnp
import numpy as np
import pytest

import linearcorex_tpu.ops.pallas_moments as PM
from linearcorex_tpu.ops import moments as M


def test_chain_supported_shapes():
    assert PM.chain_supported(10000, 512)
    assert PM.chain_supported(256, 128)
    # arbitrary shapes are handled via exact zero-padding
    assert PM.chain_supported(256, 100)
    assert PM.chain_supported(999, 7)
    # the (m, m) ry block must fit VMEM: m > 1024 post-padding is out
    assert not PM.chain_supported(256, 1025)


@pytest.mark.parametrize("p,m", [(400, 100), (999, 7), (257, 130)])
def test_ns_chain_padded_shapes_match_reference(p, m):
    """Unaligned (p, m) run through the zero-padding wrapper and must
    equal the unpadded XLA reference exactly (the padding is exact, not
    approximate)."""
    rng = np.random.RandomState(1)
    w = rng.normal(scale=0.1, size=(m, p))
    x = rng.normal(size=(600, p))
    x = (x - x.mean(0)) / x.std(0)
    cxy = jnp.asarray(x.T @ (x @ w.T) / 600, jnp.float32)
    cy = w @ np.asarray(cxy) + np.eye(m)
    z2 = np.diag(cy)
    sqz = jnp.asarray(np.sqrt(z2), jnp.float32)
    ry = jnp.asarray(cy / np.sqrt(np.outer(z2, z2)), jnp.float32)
    got = PM.ns_chain(cxy, ry, sqz, 1 - 1e-6, interpret=True)
    want = PM.ns_chain_reference(cxy, ry, sqz, 1 - 1e-6)
    for g, w_ in zip(got, want):
        assert g.shape == jnp.asarray(w_).shape
        denom = float(jnp.max(jnp.abs(jnp.asarray(w_)))) + 1e-12
        assert float(jnp.max(jnp.abs(jnp.asarray(g) - jnp.asarray(w_)))) \
            / denom < 1e-5


def test_ns_chain_matches_reference():
    rng = np.random.RandomState(0)
    p, m = 400, 128
    from tests.conftest import block_data
    x = block_data(n=2000, p=p, m=8, seed=1)
    x = (x - x.mean(0)) / x.std(0)
    w = rng.normal(scale=0.1, size=(m, p))
    cxy = jnp.asarray(x.T @ (x @ w.T) / 2000, jnp.float32)
    cy = w @ np.asarray(cxy) + np.eye(m)
    z2 = np.diag(cy)
    sqz = jnp.asarray(np.sqrt(z2), jnp.float32)
    ry = jnp.asarray(cy / np.sqrt(np.outer(z2, z2)), jnp.float32)
    got = PM.ns_chain(cxy, ry, sqz, 1 - 1e-6, interpret=True)
    want = PM.ns_chain_reference(cxy, ry, sqz, 1 - 1e-6)
    for g, w_ in zip(got, want):
        denom = float(jnp.max(jnp.abs(jnp.asarray(w_)))) + 1e-12
        assert float(jnp.max(jnp.abs(jnp.asarray(g) - jnp.asarray(w_)))) \
            / denom < 1e-5


def test_chain_obj_grad_integrated(pallas_interpret):
    """ns_obj_grad with chain_kernel=True equals the XLA path (gram and
    samples backends, with and without annealing)."""
    from tests.conftest import block_data
    p, m = 256, 128
    x = block_data(n=2000, p=p, m=8, seed=1)
    x = (x - x.mean(0)) / x.std(0)
    xj = jnp.asarray(x, jnp.float32)
    gram = jnp.asarray(x.T @ x / x.shape[0], jnp.float32)
    ws = jnp.asarray(np.random.RandomState(2).normal(
        scale=0.05, size=(m, p)), jnp.float32)
    for eps in (0.0, 0.36):
        f1, g1, t1 = M.ns_obj_grad_gram(ws, gram, eps, 1.0, 1 - 1e-6)
        f2, g2, t2 = M.ns_obj_grad_gram(ws, gram, eps, 1.0, 1 - 1e-6,
                                        chain_kernel=True)
        assert abs(float(f1 - f2)) / abs(float(f1)) < 1e-5
        assert abs(float(t1 - t2)) / max(abs(float(t1)), 1e-6) < 1e-4
        assert np.abs(np.asarray(g1 - g2)).max() < 2e-3
        f3, g3, t3 = M.ns_obj_grad_samples(ws, xj, eps, 1.0, 1 - 1e-6,
                                           chain_kernel=True)
        f4, g4, t4 = M.ns_obj_grad_samples(ws, xj, eps, 1.0, 1 - 1e-6)
        assert abs(float(f3 - f4)) / abs(float(f4)) < 1e-5
        assert np.abs(np.asarray(g3 - g4)).max() < 2e-3


def test_ns_chain_rejects_float64():
    """float64 operands must raise (the kernel computes in f32; silent
    downcast would break the 1e-5 oracle-parity contract)."""
    p, m = 256, 128
    cxy = jnp.zeros((p, m), jnp.float64)
    ry = jnp.eye(m, dtype=jnp.float64)
    sqz = jnp.ones((m,), jnp.float64)
    with pytest.raises(ValueError, match="float64"):
        PM.ns_chain(cxy, ry, sqz, 1 - 1e-6, interpret=True)


def test_use_pallas_interpret_mode():
    """use_pallas='interpret' runs the chain kernel through the Pallas
    interpreter end-to-end (fit + shard_map fit) WITHOUT touching
    pallas_moments.INTERPRET_DEFAULT — the config-level replacement for
    the module-global flip CLAUDE.md's invariants forbid."""
    import linearcorex_tpu as lc
    from linearcorex_tpu.config import CorexConfig
    from linearcorex_tpu.parallel.sharding import fit_shard_map, make_mesh
    from tests.conftest import block_data

    assert PM.INTERPRET_DEFAULT is False  # nothing in the library flips it
    p, m = 256, 128
    x = block_data(n=600, p=p, m=8, seed=5)
    a = lc.Corex(n_hidden=m, max_iter=40, anneal=False, seed=0,
                 use_pallas="interpret").fit(x)
    b = lc.Corex(n_hidden=m, max_iter=40, anneal=False, seed=0,
                 use_pallas="never").fit(x)
    assert abs(a.tc - b.tc) / max(abs(b.tc), 1e-6) < 1e-3
    assert PM.INTERPRET_DEFAULT is False

    mesh = make_mesh()
    cfg = CorexConfig(n_hidden=m, max_iter=5, anneal=False,
                      record_history=False, use_pallas="interpret")
    xj = jnp.asarray((x - x.mean(0)) / x.std(0), jnp.float32)
    w0 = jnp.asarray(np.random.RandomState(0).normal(
        scale=1.0 / np.sqrt(p), size=(m, p)), jnp.float32)
    _, mom, _ = fit_shard_map(xj, w0, cfg, mesh)
    assert np.isfinite(float(mom.tc))
    assert PM.INTERPRET_DEFAULT is False
