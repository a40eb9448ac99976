"""Pallas TPU kernel for the hot moment step (SURVEY.md §2.1, §7.2.4).

The reference's only "native" compute is library GEMMs (NumPy→BLAS /
cudamat, SURVEY.md §2.1); the TPU-native equivalent owed here is a fused
MXU-resident moment kernel. This module implements the CHAIN kernel
(`ns_chain`): the whole non-overlap elementwise moment chain + gradient
algebra (rho → invrho → rhoinvrho → Qij → S_i/Q_i → AA, plus the H matrix
and every reduction the solver needs) fused per p-tile with the m x m `ry`
VMEM-resident. XLA cannot fuse across the qij = ry·rhoinvrho GEMM in the
middle of the chain and materializes ~6 (m x p) intermediates to HBM per
evaluation; the kernel's HBM traffic is one read of C_xy and one write of
AA. Measured on v5e at m=512 (production fit_core harness): +9% at
p=10k/m=512 (601 vs 553 it/s), +11-13% at p=100k samples (26.6 vs
30.0 ms/iter); a wash below m=128, where resolve_config's 'auto' leaves
it off.

A second kernel (`gram_products`: C=Σ·Wᵀ with the m x m W·C / W·Wᵀ products
in a VMEM epilogue) lived here through round 1; measured INTEGRATED on v5e
it ran 447 it/s vs the chain path's 621 at the north-star shape (it
displaces the chain fusion), so it was deleted in round 2 — see
benchmarks/RESULTS.md and DESIGN.md.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ns_chain", "ns_chain_reference", "chain_supported"]

_F32 = jnp.float32

# Tests flip this (via the pallas_interpret fixture) to run the kernel
# through the Pallas interpreter on CPU (read at trace time; production TPU
# path leaves it False).
INTERPRET_DEFAULT = False


def _chain_kernel(rho_clip_ref, cxy_ref, ry_ref, inv_sqz_ref,
                  aa_ref, hmat_ref, red_ref):
    """Per-p-tile fused moment chain + gradient pieces (see `ns_chain`)."""
    i = pl.program_id(0)
    rho = cxy_ref[:] * inv_sqz_ref[:]                   # (TP, m)
    clip = rho_clip_ref[0, 0]
    rho = jnp.clip(rho, -clip, clip)
    invrho = 1.0 / (1.0 - rho * rho)
    rr = rho * invrho
    qij = jnp.dot(rr, ry_ref[:], preferred_element_type=_F32)   # ry symm
    si = jnp.sum(rho * rr, axis=1, keepdims=True)       # (TP, 1)
    qi = jnp.sum(rr * qij, axis=1, keepdims=True)
    ni = 1.0 + qi - si * si
    alpha = 1.0 / ni
    beta = 1.0 / (1.0 + si)
    inv2 = invrho * invrho
    aa = alpha * (1.0 + rho * rho) * inv2 * qij \
        - 2.0 * (alpha * si + beta) * rho * inv2
    aa_ref[:] = aa
    hmat_part = jnp.dot((rr * alpha).T, rr, preferred_element_type=_F32)
    # packed per-tile reduction outputs (8 rows for sublane alignment):
    #   0: kappa (Σ_i aa·rho), 1: mu (Σ_i α·rr·qij), 2: Σ_i MI_ji,
    #   3: [Σ_i log v_i broadcast]; rows 4-7 zero padding
    m = rho.shape[1]
    kappa = jnp.sum(aa * rho, axis=0)
    mu = jnp.sum(alpha * rr * qij, axis=0)
    mi_sum = jnp.sum(-0.5 * jnp.log1p(-rho * rho), axis=0)
    log_vi_sum = jnp.sum(jnp.log(jnp.maximum(ni * beta * beta, 1e-30)))
    row_id = jax.lax.broadcasted_iota(jnp.int32, (8, m), 0)
    red = jnp.where(row_id == 0, kappa[None, :],
          jnp.where(row_id == 1, mu[None, :],
          jnp.where(row_id == 2, mi_sum[None, :],
          jnp.where(row_id == 3, log_vi_sum, 0.0))))    # (8, m)

    @pl.when(i == 0)
    def _():
        hmat_ref[:] = hmat_part
        red_ref[:] = red

    @pl.when(i > 0)
    def _():
        hmat_ref[:] += hmat_part
        red_ref[:] += red


def _pick_tp(p: int, m: int) -> int:
    """Largest p-tile <= 512 that divides p, is sublane-aligned (x8), and
    keeps the block VMEM footprint modest."""
    for tp in (512, 400, 256, 200, 128, 104, 80, 64, 48, 40, 32, 24, 16, 8):
        if p % tp == 0:
            return tp
    return 0


def _pad_shapes(p: int, m: int):
    """(p_pad, m_pad) making the kernel applicable: m lane-aligned (x128),
    p padded to the next multiple of 512 if no sublane-aligned tile divides
    it. Zero-padding is EXACT for the chain math: a zero rho row or column
    contributes 0 to every reduction (si/qi/kappa/mu/mi/log vi), a zero AA
    row/column, and zero H entries — validated by tests against the
    unpadded reference."""
    m_pad = -(-m // 128) * 128
    p_pad = p if _pick_tp(p, m_pad) > 0 else -(-p // 512) * 512
    return p_pad, m_pad


def chain_supported(p: int, m: int) -> bool:
    """The padding wrapper makes every m <= 1024 (post-padding) and any p
    supported; the only hard limit is the VMEM-resident (m, m) ry block."""
    return _pad_shapes(p, m)[1] <= 1024


def ns_chain(c_xy: jax.Array, ry: jax.Array, sqz: jax.Array,
             rho_clip: float, interpret: bool | None = None):
    """The whole non-overlap moment chain + gradient algebra, fused.

    XLA cannot fuse across the qij = ry·rhoinvrho GEMM in the middle of the
    chain, so it materializes ~6 (m x p) intermediates to HBM per
    evaluation (~120 MB at p=10k/m=512, ~1.2 GB at p=100k). This kernel
    keeps the m x m `ry` VMEM-resident and computes rho → invrho → rr → qij
    → S_i/Q_i → AA per p-tile in one pass: HBM traffic is one read of C_xy
    and one write of AA, plus tiny accumulators.

    Inputs: c_xy (p, m) annealed cross-moment; ry (m, m); sqz (m,) =
    sqrt(z2). Returns (aa (p, m) [note: variable-major layout], hmat (m, m),
    kappa (m,), mu (m,), mi_sums (m,), sum_log_vi ()).
    """
    if interpret is None:
        interpret = INTERPRET_DEFAULT
    p, m = c_xy.shape
    if c_xy.dtype == jnp.float64:
        # the kernel computes in float32; silently downcasting would break
        # the <=1e-5 oracle-parity contract for float64 runs
        raise ValueError(
            "the fused chain kernel computes in float32 and cannot honor "
            "dtype='float64'; set use_pallas='never' (or 'auto') for "
            "float64 parity runs")
    if not chain_supported(p, m):
        raise ValueError(
            f"the fused chain kernel supports m up to 1024 after lane "
            f"padding (the (m, m) ry block must fit VMEM); got p={p}, "
            f"m={m} — set use_pallas='never' (or 'auto') for the XLA chain")
    p_pad, m_pad = _pad_shapes(p, m)
    if (p_pad, m_pad) != (p, m):
        # exact zero-padding (see _pad_shapes); sqz pads with 1 so the
        # inverse stays finite — padded rho entries are then exactly 0
        c_xy = jnp.pad(c_xy, ((0, p_pad - p), (0, m_pad - m)))
        ry = jnp.pad(ry, ((0, m_pad - m), (0, m_pad - m)))
        sqz = jnp.pad(sqz, (0, m_pad - m), constant_values=1.0)
    tp = _pick_tp(p_pad, m_pad)
    grid = (p_pad // tp,)
    aa, hmat, red = pl.pallas_call(
        _chain_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),          # rho_clip
            pl.BlockSpec((tp, m_pad), lambda i: (i, 0)),    # c_xy tile
            pl.BlockSpec((m_pad, m_pad), lambda i: (0, 0)),  # ry (resident)
            pl.BlockSpec((1, m_pad), lambda i: (0, 0)),     # 1/sqz row
        ],
        out_specs=[
            pl.BlockSpec((tp, m_pad), lambda i: (i, 0)),    # aa tile
            pl.BlockSpec((m_pad, m_pad), lambda i: (0, 0)),  # hmat accum
            pl.BlockSpec((8, m_pad), lambda i: (0, 0)),     # reductions
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, m_pad), _F32),
            jax.ShapeDtypeStruct((m_pad, m_pad), _F32),
            jax.ShapeDtypeStruct((8, m_pad), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * p_pad * m_pad * m_pad + 20 * p_pad * m_pad,
            bytes_accessed=8 * p_pad * m_pad + 8 * m_pad * m_pad,
            transcendentals=2 * p_pad * m_pad,
        ),
        interpret=interpret,
    )(jnp.asarray([[rho_clip]], _F32), c_xy.astype(_F32),
      ry.astype(_F32), (1.0 / sqz).astype(_F32).reshape(1, m_pad))
    kappa, mu, mi_sums = red[0, :m], red[1, :m], red[2, :m]
    return (aa[:p, :m], hmat[:m, :m], kappa, mu, mi_sums, red[3, 0])


def ns_chain_reference(c_xy, ry, sqz, rho_clip):
    """Unfused XLA reference of `ns_chain` (tests)."""
    rho = jnp.clip((c_xy / sqz[None, :]), -rho_clip, rho_clip)  # (p, m)
    invrho = 1.0 / (1.0 - rho ** 2)
    rr = rho * invrho
    qij = rr @ ry
    si = jnp.sum(rho * rr, axis=1, keepdims=True)
    qi = jnp.sum(rr * qij, axis=1, keepdims=True)
    ni = 1.0 + qi - si ** 2
    alpha, beta = 1.0 / ni, 1.0 / (1.0 + si)
    aa = alpha * (1 + rho ** 2) * invrho ** 2 * qij \
        - 2.0 * (alpha * si + beta) * rho * invrho ** 2
    hmat = (rr * alpha).T @ rr
    kappa = jnp.sum(aa * rho, axis=0)
    mu = jnp.sum(alpha * rr * qij, axis=0)
    mi_sums = jnp.sum(-0.5 * jnp.log1p(-rho ** 2), axis=0)
    sum_log_vi = jnp.sum(jnp.log(jnp.maximum(ni * beta ** 2, 1e-30)))
    return aa, hmat, kappa, mu, mi_sums, sum_log_vi
