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

from ..ops.segmented import (
    SortedRuns,
    direct_group_reduce,
    identity_for as _identity,
    masked_reduce,
)

_COMBINE = {"sum": jnp.add, "min": jnp.minimum, "max": jnp.maximum}


def _grouped_reduce(arr, mask, group_ids, num_groups, op):
    """Scatter-free grouped reduction (see ops/segmented.py for the rationale)."""
    if num_groups == 1:
        return masked_reduce(arr, mask, op).reshape(1)
    return direct_group_reduce(arr, mask, group_ids, num_groups, op)


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
    extract_fn: Callable  # accs (host numpy) -> (values, validity|None)
    input_index: Optional[int]  # index into the agg's argument columns; None=count(*)
    # Optional renormalization applied after every combine (e.g. carry the
    # low-limb overflow of wide sums into the high limb).
    post_combine: Optional[Callable] = None

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
        out = tuple(
            _COMBINE[op](acc, _grouped_reduce(arr, mask, group_ids, num_groups, op))
            for acc, arr, op in zip(accs, arrays, self.acc_ops)
        )
        return self.post_combine(out) if self.post_combine else out

    def merge_update(self, accs, interm_arrays, mask, group_ids, num_groups):
        """Merge intermediate (accumulator-typed) columns into groups
        (reference: Aggregate::addIntermediateResults)."""
        arrays = self._masked(interm_arrays, mask)
        out = tuple(
            _COMBINE[op](acc, _grouped_reduce(arr, mask, group_ids, num_groups, op))
            for acc, arr, op in zip(accs, arrays, self.acc_ops)
        )
        return self.post_combine(out) if self.post_combine else out

    def run_reduce(self, values, mask, runs: SortedRuns):
        """Per-run reductions for sort-mode grouping: tuple of [capacity] arrays
        where slot r is run r's partial accumulator."""
        arrays = self._masked(self.raw_inputs(values, mask), mask)
        return tuple(
            runs.reduce(arr.astype(dt), mask, op)
            for arr, dt, op in zip(arrays, self.acc_dtypes, self.acc_ops)
        )

    def merge(self, a, b):
        """Combine two aligned partial states (reference: spill/bridge merges)."""
        out = tuple(_COMBINE[op](x, y) for x, y, op in zip(a, b, self.acc_ops))
        return self.post_combine(out) if self.post_combine else out

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


# ---- exact wide (96-bit) integer sums --------------------------------------
#
# A scale-6 decimal sum over 1.5e9 rows exceeds int64; the reference uses
# software int128 (velox/type/DecimalUtil.h).  Here the accumulator is split
# into 32-bit limbs: lo accumulates v & 0xffffffff, hi accumulates v >> 32
# (arithmetic shift — exact for negatives too since v == (v>>32)*2^32 + lo).
# After every combine the lo overflow is carried into hi, keeping lo < 2^32 +
# tile_rows * 2^32 — far from wrapping.  Extraction reconstructs with python
# ints (exact arbitrary precision) on the host.


def _wide_raw_inputs(values, mask):
    v = values.astype(jnp.int64)
    return (
        v >> 32,
        v & jnp.int64(0xFFFFFFFF),
        jnp.ones_like(v, dtype=jnp.int64),
    )


def _wide_normalize(accs):
    hi, lo, count = accs
    return (hi + (lo >> 32), lo & jnp.int64(0xFFFFFFFF), count)


def _wide_exact(hi, lo):
    import numpy as np

    return np.asarray(hi).astype(object) * (1 << 32) + np.asarray(lo).astype(object)


def _wide_sum_extract(accs):
    import numpy as np

    exact = _wide_exact(accs[0], accs[1])
    count = np.asarray(accs[2])
    int64_max = (1 << 63) - 1
    if len(exact) and max((abs(int(x)) for x in exact), default=0) > int64_max:
        values = exact.astype(np.float64)  # beyond 64 bits: lossless order, lossy tail
    else:
        values = exact.astype(np.int64)
    return values, count > 0


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
        if at == jnp.float64:
            return BoundAggregate(
                "sum", _sum_result_type(input_type), (at, jnp.int64), ("sum", "sum"),
                lambda values, mask: (values, jnp.ones_like(values, dtype=jnp.int64)),
                lambda accs: (accs[0], accs[1] > 0),  # sum of zero rows is NULL
                input_index,
            )
        return BoundAggregate(
            "sum", _sum_result_type(input_type),
            (jnp.int64, jnp.int64, jnp.int64), ("sum", "sum", "sum"),
            _wide_raw_inputs,
            _wide_sum_extract,
            input_index,
            post_combine=_wide_normalize,
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

        if at == jnp.float64:
            def extract(accs):
                total, count = accs
                value = total.astype(jnp.float64) / jnp.maximum(count, 1)
                return value, count > 0

            return BoundAggregate(
                "avg", DOUBLE, (at, jnp.int64), ("sum", "sum"),
                lambda values, mask: (values, jnp.ones_like(values, dtype=jnp.int64)),
                extract, input_index,
            )

        def extract_int(accs):
            import numpy as np

            exact = _wide_exact(accs[0], accs[1])
            count = np.asarray(accs[2])
            safe = np.maximum(count, 1)
            value = (exact / safe).astype(np.float64) / (10.0**scale)
            return value, count > 0

        return BoundAggregate(
            "avg", DOUBLE, (jnp.int64, jnp.int64, jnp.int64), ("sum", "sum", "sum"),
            _wide_raw_inputs,
            extract_int, input_index,
            post_combine=_wide_normalize,
        )

    raise KeyError(f"no aggregate function named {name!r}")


AGGREGATE_NAMES = ("count", "sum", "min", "max", "avg")
