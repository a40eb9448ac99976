"""Pallas TPU kernels for the hot moment step (SURVEY.md §2.1, §7.2.4).

The reference's only "native" compute is library GEMMs (NumPy→BLAS /
cudamat, SURVEY.md §2.1); the TPU-native equivalent owed here is a fused
MXU-resident moment kernel. This module implements the Gram-path iteration
core as one Pallas kernel:

    C   = Σ·Wᵀ          (the p x m cross-moment — the big GEMM)
    WC  = W·C           (m x m, for cov(y))
    WWᵀ = W·Wᵀ          (m x m, for the annealed blend when eps > 0)

fused into a single pass over Σ: the m x m products ride in VMEM-resident
accumulators and are produced in the epilogue of each row-block, so C is
consumed for cov(y) while still on-chip instead of being written to HBM and
re-read by a second GEMM. Accumulation is float32 on the MXU
(`preferred_element_type`); inputs may be bfloat16 (half the HBM traffic,
2x the MXU rate) while every output stays float32.

Grid layout: (i over p row-tiles of C, k over the p-contraction), k fastest —
the canonical Pallas matmul schedule (double-buffered HBM→VMEM streaming is
inserted by the pipeline automatically). TPU Pallas grids execute
sequentially on the core, which is what makes the constant-index m x m
accumulator outputs legal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gram_products", "gram_products_reference", "supported"]

_F32 = jnp.float32

# Tests flip this to run the kernel through the Pallas interpreter on CPU
# (read at trace time; production TPU path leaves it False).
INTERPRET_DEFAULT = False


def _kernel(gram_ref, wt_k_ref, wt_i_ref, c_ref, wc_ref, wwt_ref):
    i = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        c_ref[:] = jnp.zeros_like(c_ref)

    # C[i] += Σ[i, k] · Wᵀ[k]
    c_ref[:] += jnp.dot(gram_ref[:], wt_k_ref[:],
                        preferred_element_type=_F32)

    @pl.when(k == nk - 1)
    def _():
        # epilogue: C[i] is complete — fold this row-block into the m x m
        # accumulators while it is still in VMEM.
        wc_part = jnp.dot(wt_i_ref[:].astype(_F32).T, c_ref[:],
                          preferred_element_type=_F32)
        wwt_part = jnp.dot(wt_i_ref[:].astype(_F32).T,
                           wt_i_ref[:].astype(_F32),
                           preferred_element_type=_F32)

        @pl.when(i == 0)
        def _():
            wc_ref[:] = wc_part
            wwt_ref[:] = wwt_part

        @pl.when(i > 0)
        def _():
            wc_ref[:] += wc_part
            wwt_ref[:] += wwt_part


def supported(p: int, m: int) -> bool:
    """Shapes the fused kernel handles without padding: lane-aligned m and a
    row-tile that divides p."""
    return p % 128 == 0 and m % 128 == 0 and m <= 1024


def _pick_tiles(p: int, m: int):
    tp = 256 if p % 256 == 0 else 128
    tk = 512 if p % 512 == 0 else (256 if p % 256 == 0 else 128)
    return tp, tk


def gram_products(gram: jax.Array, ws: jax.Array,
                  interpret: bool | None = None):
    """(C=Σ·Wᵀ, W·C, W·Wᵀ) in one fused pass over Σ.

    gram: (p, p) f32 or bf16; ws: (m, p) f32 or bf16. Outputs all f32.
    Requires `supported(p, m)`. Traceable (callers jit it).
    """
    if interpret is None:
        interpret = INTERPRET_DEFAULT
    p = gram.shape[0]
    m = ws.shape[0]
    tp, tk = _pick_tiles(p, m)
    wt = ws.T  # (p, m): contraction and epilogue views below

    grid = (p // tp, p // tk)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tk), lambda i, k: (i, k)),    # Σ tile
            pl.BlockSpec((tk, m), lambda i, k: (k, 0)),     # Wᵀ (contraction)
            pl.BlockSpec((tp, m), lambda i, k: (i, 0)),     # Wᵀ (epilogue)
        ],
        out_specs=[
            pl.BlockSpec((tp, m), lambda i, k: (i, 0)),     # C row-block
            pl.BlockSpec((m, m), lambda i, k: (0, 0)),      # W·C accumulator
            pl.BlockSpec((m, m), lambda i, k: (0, 0)),      # W·Wᵀ accumulator
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, m), _F32),
            jax.ShapeDtypeStruct((m, m), _F32),
            jax.ShapeDtypeStruct((m, m), _F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * p * p * m + 4 * p * m * m,
            bytes_accessed=gram.size * gram.dtype.itemsize
            + 2 * wt.size * wt.dtype.itemsize + 4 * p * m,
            transcendentals=0,
        ),
        # Both m x m outputs accumulate across grid steps, so the grid MUST
        # execute sequentially — without this the runtime may reorder /
        # parallelize iterations and the accumulators race (observed as
        # nondeterministic results on v5e).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(gram, wt, wt)


def gram_products_reference(gram, ws):
    """Unfused XLA reference for the kernel (tests + fallback path)."""
    c = jnp.matmul(gram, ws.T.astype(_F32),
                   preferred_element_type=_F32)
    wc = jnp.matmul(ws.astype(_F32), c, preferred_element_type=_F32)
    wwt = jnp.matmul(ws.astype(_F32), ws.T.astype(_F32),
                     preferred_element_type=_F32)
    return c, wc, wwt
