"""Collective-traffic audit of compiled sharded programs.

SURVEY.md §2.8 claims the algorithm's entire communication surface is two
reductions (a psum of the p x m cross-moment over the data axis; an
all-gather of small m-sized blocks under factor sharding). Multi-chip
hardware is not available in CI, but the claim is checkable WITHOUT
hardware: compile the sharded program for a virtual mesh and read the
collectives XLA actually emitted out of the optimized HLO. `audit_fit`
returns every collective op with its payload shape/bytes so tests (and
capacity planning) can assert the comm surface instead of trusting the
docstring.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List

__all__ = ["CollectiveOp", "hlo_collectives", "audit_fit"]

# optimized-HLO instruction names that move data between devices.
# `-start` is matched (the async form's initiating op carries the payload
# shape); the paired `-done` is deliberately NOT matched — counting both
# halves of one async collective would double every payload.
_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*"
    r"(\([^)]*\)|[\w\[\],{}]+)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)(?:-start)?\(",
    re.MULTILINE)

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s32|u32|pred)\[([\d,]*)\]")

_ITEMSIZE = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "pred": 1}


@dataclass(frozen=True)
class CollectiveOp:
    kind: str          # all-reduce | all-gather | ...
    shapes: tuple      # payload shapes as strings, e.g. ('f32[64,8]',)
    bytes: int         # total payload bytes (one device's share)


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _ITEMSIZE[dtype]
    return total


def hlo_collectives(hlo_text: str) -> List[CollectiveOp]:
    """Parse collectives out of optimized HLO text (`-start` and plain
    forms; the paired `-done` ops are excluded so each async collective
    is counted once)."""
    ops = []
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        shape_text, kind = m.group(1), m.group(2)
        shapes = tuple(f"{d}[{s}]" for d, s in _SHAPE_RE.findall(shape_text))
        ops.append(CollectiveOp(kind=kind, shapes=shapes,
                                bytes=_shape_bytes(shape_text)))
    return ops


def audit_fit(data, w0, cfg, mesh, plan=None, strategy="samples",
              n_samples=None):
    """Compile (without executing) the sharded fit for `mesh` and return
    its collectives. Uses the same program `fit_sharded` runs — including
    its config resolution, so pass the same `n_samples` you would pass to
    `fit_sharded` for a Gram operand with optimizer='auto' (otherwise the
    audit would report the momentum program's collectives while the fit
    runs the fixed-point one)."""
    import jax
    from jax.sharding import NamedSharding

    from linearcorex_tpu.models.corex import resolve_config
    from linearcorex_tpu.parallel import sharding as S

    from linearcorex_tpu.ops.moments import QuantizedData

    if isinstance(data, QuantizedData):
        raise ValueError(
            "audit_fit takes a plain array operand (or a ShapeDtypeStruct) "
            "— audit the f32/bf16 layout; the int8 program's collective "
            "SURFACE is identical (same reduces over the same axes)")
    plan = plan or S.ShardingPlan()
    if plan.shard_vars or plan.shard_factors:
        import dataclasses
        if cfg.use_pallas == "auto":
            cfg = dataclasses.replace(cfg, use_pallas="never")
    if n_samples is None and strategy == "samples":
        n_samples = data.shape[0]
    cfg = resolve_config(cfg, data.shape[-1],
                         platform=mesh.devices.flat[0].platform,
                         n_samples=n_samples)
    if strategy == "gram":
        data_spec = S.P(S.VAR_AXIS if plan.shard_vars else None, None)
        w_spec = S.P(S.FACTOR_AXIS if plan.shard_factors else None, None)
    else:
        data_spec, w_spec = plan.x_spec(), plan.w_spec()
    lowered = S._fit_program_sharded.lower(
        jax.ShapeDtypeStruct(data.shape, data.dtype,
                             sharding=NamedSharding(mesh, data_spec)),
        jax.ShapeDtypeStruct(w0.shape, w0.dtype,
                             sharding=NamedSharding(mesh, w_spec)),
        cfg, plan, strategy)
    hlo = lowered.compile().as_text()
    return hlo_collectives(hlo)
