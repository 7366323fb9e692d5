"""Aggregate function API: accumulator layouts + update/merge/extract phases.

Reference: velox/exec/Aggregate.h:43,125-165 (accumulator state + addRawInput /
addIntermediateResults / extractValues contract) and the registry at
Aggregate.h:421.

TPU re-design: accumulators are *columnar* — a tuple of [num_groups] jnp arrays
(struct-of-arrays), not row-wise RowContainer state.  Grouped updates are segment
reductions over trace-time-static ``num_groups``; ungrouped aggregation is the
G=1 case.  Each accumulator array declares its combine op (sum/min/max), from
which raw-input updates, partial merges, and merge-from-intermediate-columns all
derive — the three Velox paths (addRawInput / addIntermediateResults / merge)
collapse into one mechanism.

Exactness: decimal/integer sums accumulate in int64 (fixed-point), so tiling and
merge order cannot change results; floating inputs accumulate in float64.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..dtypes import BIGINT, DOUBLE, DataType, TypeKind, decimal

_SEG_OPS = {
    "sum": lambda v, g, n: jax.ops.segment_sum(v, g, num_segments=n),
    "min": lambda v, g, n: jax.ops.segment_min(v, g, num_segments=n),
    "max": lambda v, g, n: jax.ops.segment_max(v, g, num_segments=n),
}
_COMBINE = {"sum": jnp.add, "min": jnp.minimum, "max": jnp.maximum}


def _identity(op: str, dtype):
    if op == "sum":
        return 0
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.inf if op == "min" else -jnp.inf
    info = jnp.iinfo(dtype)
    return info.max if op == "min" else info.min


@dataclasses.dataclass
class BoundAggregate:
    """One aggregate call bound to its input column and result type.

    ``raw_inputs(values)`` maps the (single) argument column to one array per
    accumulator; combined with per-accumulator segment ops this yields all three
    update paths uniformly.
    """

    name: str
    result_type: DataType
    acc_dtypes: Tuple
    acc_ops: Tuple[str, ...]
    raw_inputs: Callable  # (values|None, mask) -> tuple of arrays, one per acc
    extract_fn: Callable  # accs -> (values, validity|None)
    input_index: Optional[int]  # index into the agg's argument columns; None=count(*)

    def acc_init(self, num_groups: int) -> Tuple[jax.Array, ...]:
        return tuple(
            jnp.full((num_groups,), _identity(op, dt), dtype=dt)
            for dt, op in zip(self.acc_dtypes, self.acc_ops)
        )

    def _masked(self, arrays, mask):
        out = []
        for arr, dt, op in zip(arrays, self.acc_dtypes, self.acc_ops):
            ident = _identity(op, dt)
            out.append(jnp.where(mask, arr.astype(dt), jnp.asarray(ident, dtype=dt)))
        return out

    def update(self, accs, values, mask, group_ids, num_groups):
        """Add raw input rows (reference: Aggregate::addRawInput)."""
        arrays = self._masked(self.raw_inputs(values, mask), mask)
        return tuple(
            _COMBINE[op](acc, _SEG_OPS[op](arr, group_ids, num_groups))
            for acc, arr, op in zip(accs, arrays, self.acc_ops)
        )

    def merge_update(self, accs, interm_arrays, mask, group_ids, num_groups):
        """Merge intermediate (accumulator-typed) columns into groups
        (reference: Aggregate::addIntermediateResults)."""
        arrays = self._masked(interm_arrays, mask)
        return tuple(
            _COMBINE[op](acc, _SEG_OPS[op](arr, group_ids, num_groups))
            for acc, arr, op in zip(accs, arrays, self.acc_ops)
        )

    def merge(self, a, b):
        """Combine two aligned partial states (reference: spill/bridge merges)."""
        return tuple(_COMBINE[op](x, y) for x, y, op in zip(a, b, self.acc_ops))

    def extract(self, accs):
        return self.extract_fn(accs)

    @property
    def intermediate_types(self) -> Tuple[DataType, ...]:
        """Logical types of intermediate columns (for partial-agg output batches)."""
        out = []
        for dt in self.acc_dtypes:
            out.append(DOUBLE if jnp.issubdtype(dt, jnp.floating) else BIGINT)
        return tuple(out)


def _sum_result_type(t: DataType) -> DataType:
    if t.kind == TypeKind.DECIMAL:
        return decimal(18, t.scale)
    if t.is_floating:
        return DOUBLE
    return BIGINT


def _acc_dtype(t: DataType):
    return jnp.float64 if t.is_floating else jnp.int64


def bind_aggregate(
    name: str, input_type: Optional[DataType], input_index
) -> BoundAggregate:
    """Bind an aggregate by name (reference: exec::Aggregate::create)."""
    name = name.lower()
    if name == "count":
        return BoundAggregate(
            "count", BIGINT, (jnp.int64,), ("sum",),
            lambda values, mask: (jnp.ones_like(mask, dtype=jnp.int64),),
            lambda accs: (accs[0], None),
            input_index,
        )

    assert input_type is not None, f"{name} requires an argument"
    at = _acc_dtype(input_type)

    if name == "sum":
        return BoundAggregate(
            "sum", _sum_result_type(input_type), (at, jnp.int64), ("sum", "sum"),
            lambda values, mask: (values, jnp.ones_like(values, dtype=jnp.int64)),
            lambda accs: (accs[0], accs[1] > 0),  # sum of zero rows is NULL
            input_index,
        )

    if name in ("min", "max"):
        return BoundAggregate(
            name, input_type, (at, jnp.int64), (name, "sum"),
            lambda values, mask: (values, jnp.ones_like(values, dtype=jnp.int64)),
            lambda accs: (accs[0], accs[1] > 0),
            input_index,
        )

    if name == "avg":
        scale = input_type.scale if input_type.kind == TypeKind.DECIMAL else 0

        def extract(accs):
            total, count = accs
            value = total.astype(jnp.float64) / jnp.maximum(count, 1) / (10.0**scale)
            return value, count > 0

        return BoundAggregate(
            "avg", DOUBLE, (at, jnp.int64), ("sum", "sum"),
            lambda values, mask: (values, jnp.ones_like(values, dtype=jnp.int64)),
            extract, input_index,
        )

    raise KeyError(f"no aggregate function named {name!r}")


AGGREGATE_NAMES = ("count", "sum", "min", "max", "avg")
