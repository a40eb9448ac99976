"""Multi-chip execution: sharded moment computation over a device mesh.

The reference is strictly single-device (SURVEY.md §2.8: no parallelism of
any kind); its scalability analog table maps here as first-class components:

- **Sample (data) sharding** — the primary strategy (SURVEY.md §2.8 DP row):
  X is sharded along n across chips; each chip computes its partial Xᵀ·Y;
  the p x m cross-moment reduces over ICI. This is BASELINE.json config 5
  (p=100k, m=512, sample-sharded v5e-8, "psum moments").
- **Variable sharding** — the long-axis analog (SURVEY.md §2.8 SP row): X
  column-blocks and W column-blocks live on different chips; per-variable
  quantities (S_i, v_i, MI sums) are local, the m x m C_y reduces over the
  variable shards. Required once p ≫ single-chip HBM.
- **Factor sharding** — TP over the m axis (rows of W); rho/MI/tcs are
  row-parallel, the cross-factor coupling Q = ry·rhoinvrho all-gathers the
  m x m ry.

Following the scaling-book recipe, sharding is expressed with
`jax.sharding.NamedSharding` annotations on the jitted fit program and XLA's
GSPMD partitioner inserts the collectives (psum over ICI for the moment
reductions, all-gathers for the small m x m blocks). There is no hand-rolled
comm layer — the reference has none to mirror (no NCCL/MPI, SURVEY.md §5),
and the entire communication surface of the algorithm is those two
reductions. Reductions in a fixed compiled program have a fixed order, which
gives run-to-run determinism on a fixed mesh (SURVEY.md §4.2 item 3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from linearcorex_tpu.config import CorexConfig
from linearcorex_tpu.core.solver import fit_core, sort_by_tcs
from linearcorex_tpu.models.corex import _make_obj_grad
from linearcorex_tpu.ops import moments as M

__all__ = ["ShardingPlan", "make_mesh", "fit_sharded"]

DATA_AXIS = "data"     # shards the sample axis n
VAR_AXIS = "var"       # shards the variable axis p
FACTOR_AXIS = "model"  # shards the factor axis m


@dataclasses.dataclass(frozen=True)
class ShardingPlan:
    """How one fit maps onto a mesh. Hashable → jit-static.

    shard_samples: split X rows (n) over DATA_AXIS          [DP, primary]
    shard_vars:    split X cols + W cols (p) over VAR_AXIS  [SP analog]
    shard_factors: split W rows (m) over FACTOR_AXIS        [TP]
    Any combination over a multi-axis mesh is valid as long as the mesh has
    the named axes.
    """

    shard_samples: bool = True
    shard_vars: bool = False
    shard_factors: bool = False

    def x_spec(self) -> P:
        return P(DATA_AXIS if self.shard_samples else None,
                 VAR_AXIS if self.shard_vars else None)

    def w_spec(self) -> P:
        return P(FACTOR_AXIS if self.shard_factors else None,
                 VAR_AXIS if self.shard_vars else None)


def make_mesh(axes: Optional[Tuple[Tuple[str, int], ...]] = None,
              devices=None) -> Mesh:
    """Build a named mesh. Default: 1-D data-parallel mesh over all devices.

    axes: tuple of (axis_name, size); sizes must multiply to len(devices).
    """
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = ((DATA_AXIS, len(devices)),)
    names = tuple(a for a, _ in axes)
    sizes = tuple(s for _, s in axes)
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _fit_program_sharded(data, w0, cfg: CorexConfig, plan: ShardingPlan,
                         strategy: str):
    """Identical math to models.corex._fit_program; the sharding of the
    operands makes GSPMD partition every GEMM and insert the ICI
    collectives. Keeping one code path for 1-chip and N-chip execution is
    the point: sharded-vs-single equivalence is a test invariant."""
    obj_grad = _make_obj_grad(data, cfg, strategy)
    ws, diag = fit_core(obj_grad, w0, cfg)
    zero = jnp.asarray(0.0, w0.dtype)
    c_xy = (M.cxy_gram(data, ws, zero) if strategy == "gram"
            else M.cxy_samples(data, ws, zero))
    mom = M.moments_from_cxy(ws, c_xy, cfg.y_scale, cfg.rho_clip)
    ws_sorted, order = sort_by_tcs(ws, mom.tcs)
    return ws_sorted, M.permute_moments(mom, order), diag


def fit_sharded(data, w0, cfg: CorexConfig, mesh: Mesh,
                plan: ShardingPlan = ShardingPlan(),
                strategy: str = "samples"):
    """Run the annealed fit with the data laid out per `plan` on `mesh`.

    strategy='samples': `data` is X (n x p); shardable along samples and/or
    variables per the plan. strategy='gram': `data` is Σ = XᵀX/n (p x p);
    its rows shard along the variable axis (the multi-chip layout for
    medium-p, high-iteration fits — Σ row-blocks live on different chips,
    ΣWᵀ row-blocks are chip-local, and the small m x m products reduce over
    ICI). Returns (ws, Moments, FitDiagnostics) with ws replicated (m x p —
    small, needed by every chip each iteration)."""
    if strategy == "gram":
        data_spec = P(VAR_AXIS if plan.shard_vars else None, None)
    else:
        data_spec = plan.x_spec()
    data = jax.device_put(data, NamedSharding(mesh, data_spec))
    w0 = jax.device_put(w0, NamedSharding(mesh, plan.w_spec()
                                          if strategy != "gram"
                                          else P(
        FACTOR_AXIS if plan.shard_factors else None, None)))
    with jax.set_mesh(mesh):
        return _fit_program_sharded(data, w0, cfg, plan, strategy)
