"""Group-id computation strategies: the VectorHasher / HashTable-mode analog.

Reference: velox/exec/VectorHasher.h:118,206 (per-key value ids; range/dictionary
modes for normalized keys) and velox/exec/HashTable.h:74 (adaptive kArray /
kNormalizedKey / kHash modes, decideHashMode at HashTable.cpp:1376).

TPU re-design — the mode decision moves from runtime-adaptive to *plan-compile
time*, driven by static metadata (dictionary sizes, type ranges), because the
traced program must be shape-stable:

* ArrayGrouping (kArray): every key has a small static value-id range
  (dictionary-encoded strings, booleans); the composite id is a mixed-radix code
  and aggregation is a direct segment reduction into ``num_groups`` slots.
* SortGrouping (replaces kHash): no static range — sort rows by key within the
  tile and reduce contiguous runs.  Sorting beats hash probing on a machine with
  no efficient random scatter; the reference itself prefers normalized-key sorts
  in similar regimes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import DataType, RowType, TypeKind
from ..vector.column import Batch, Column
from ..vector.string_table import StringTable

# Array mode emits one fused masked reduction per group (ops/segmented.py), so
# the composite range must stay small; larger key spaces go to sort mode, where
# sorting is cheap on TPU.
MAX_ARRAY_GROUPS = 256


@dataclasses.dataclass
class KeyInfo:
    name: str
    dtype: DataType
    strings: Optional[StringTable]
    radix: Optional[int]  # static value-id range, None if unbounded
    # inclusive (lo, hi) value bounds in the device representation, when the
    # planner can resolve them (runner.resolve_column_bounds) — feeds the
    # normalized-key packed sort (ops/sortkey.py); None = multi-operand sort
    bounds: Optional[Tuple[int, int]] = None


def key_info(
    name: str,
    dtype: DataType,
    strings: Optional[StringTable],
    bounds: Optional[Tuple[int, int]] = None,
) -> KeyInfo:
    if dtype.kind == TypeKind.BOOLEAN:
        return KeyInfo(name, dtype, None, 2, (0, 1))
    if dtype.is_string and strings is not None:
        return KeyInfo(
            name, dtype, strings, len(strings), (0, max(len(strings) - 1, 0))
        )
    return KeyInfo(name, dtype, strings, None, bounds)


class ArrayGrouping:
    """Direct-indexed grouping over a static composite key range."""

    def __init__(self, keys: Sequence[KeyInfo]):
        assert all(k.radix is not None for k in keys)
        self.keys = list(keys)
        self.num_groups = 1
        self.strides: List[int] = []
        for k in reversed(self.keys):
            self.strides.append(self.num_groups)
            self.num_groups *= k.radix
        self.strides.reverse()

    def group_ids(self, batch: Batch) -> jax.Array:
        gid = jnp.zeros((batch.capacity,), dtype=jnp.int32)
        for k, stride in zip(self.keys, self.strides):
            values, _ = batch.column(k.name).decode(batch.capacity)
            gid = gid + values.astype(jnp.int32) * stride
        return gid

    def key_arrays(self) -> List[np.ndarray]:
        """Host-side per-key value-id column for each of the num_groups slots."""
        out = []
        ids = np.arange(self.num_groups)
        for k, stride in zip(self.keys, self.strides):
            out.append(((ids // stride) % k.radix).astype(np.int32))
        return out


class SortGrouping:
    """Per-tile sort + run-boundary grouping; group count is data-dependent but
    bounded by the tile capacity (static).

    ``presorted=True`` skips the sort: the input is already ordered by (at
    least) the first key — e.g. downstream of a sort-merge join — so equal key
    tuples are grouped by adjacent comparison alone.  Runs may then split a
    logical group (secondary keys interleave within a primary-key run); the
    carry merge collapses such duplicates, so the executor must always run the
    merge step in this mode (reference: exec/StreamingAggregation.h, which
    likewise relies on sorted inputs)."""

    def __init__(self, keys: Sequence[KeyInfo], presorted: bool = False):
        self.keys = list(keys)
        self.presorted = presorted

    def pack_plan(self, capacity: int):
        """PackPlan for (keys..., row-id) if every key has resolvable bounds
        and the total fits 63 bits; None -> multi-operand sort fallback
        (the kNormalizedKey -> kHash degradation, HashTable.cpp:1376)."""
        from ..ops.sortkey import PackPlan, index_bits

        bounds = []
        for k in self.keys:
            if k.bounds is None:
                return None
            bounds.append(k.bounds)
        return PackPlan.fit(
            bounds, extra_bits=index_bits(capacity), sentinel_fields=(0,)
        )

    def sort_and_group(
        self, batch: Batch, payload: Sequence[jax.Array], mask: jax.Array
    ):
        """Returns (sorted key arrays, sorted payload arrays, sorted mask, runs).

        Rows are sorted with liveness as the primary key so dead rows sink to
        the end and cannot split runs of equal keys.  ``runs`` (ops/segmented
        SortedRuns) carries the run structure for scatter-free reductions.
        """
        from ..ops.segmented import SortedRuns

        cap = batch.capacity
        key_vals = [batch.column(k.name).decode(cap)[0] for k in self.keys]
        if self.presorted:
            # already key-ordered (dead rows keep their key values, so runs
            # spanning dead rows stay intact); no sort at all
            sorted_keys, sorted_payload, sorted_mask = key_vals, list(payload), mask
            idx = jnp.arange(cap, dtype=jnp.int32)
            diff = jnp.zeros((cap,), dtype=jnp.bool_)
            for kv in sorted_keys:
                diff = diff | (kv != jnp.roll(kv, 1))
            boundary = sorted_mask & ((idx == 0) | diff)
            runs = SortedRuns(boundary, sorted_mask)
            return sorted_keys, sorted_payload, sorted_mask, runs
        plan = self.pack_plan(cap)
        if plan is not None:
            # One-operand packed sort (ops/sortkey.py): liveness sentinel +
            # every key + the payload row-id ride in a single int64.
            from ..ops.sortkey import packed_sort_with_index

            s, codes, perm = packed_sort_with_index(plan, key_vals, ~mask, cap)
            sorted_keys = [
                plan.unpack(s, i).astype(kv.dtype)
                for i, kv in enumerate(key_vals)
            ]
            sorted_payload = [jnp.take(p, perm, mode="clip") for p in payload]
            sorted_mask = jnp.take(mask, perm, mode="clip")
            idx = jnp.arange(cap, dtype=jnp.int32)
            diff = codes != jnp.roll(codes, 1)
            boundary = sorted_mask & ((idx == 0) | diff)
            runs = SortedRuns(boundary, sorted_mask)
            return sorted_keys, sorted_payload, sorted_mask, runs
        # Multi-operand fallback: sort only (liveness, keys, row-id) and gather
        # payloads through the permutation — TPU sort compile time grows
        # ~linearly with operand count (measured ~10 s/operand at 4M rows),
        # gathers are cheap.
        perm_src = jnp.arange(cap, dtype=jnp.int32)
        sorted_ops = jax.lax.sort(
            [~mask] + key_vals + [perm_src], num_keys=1 + len(key_vals)
        )
        sorted_keys = sorted_ops[1 : 1 + len(key_vals)]
        perm = sorted_ops[-1]
        sorted_payload = [jnp.take(p, perm, mode="clip") for p in payload]
        sorted_mask = jnp.take(mask, perm, mode="clip")
        idx = jnp.arange(cap, dtype=jnp.int32)
        diff = jnp.zeros((cap,), dtype=jnp.bool_)
        for kv in sorted_keys:
            prev = jnp.roll(kv, 1)
            diff = diff | (kv != prev)
        boundary = sorted_mask & ((idx == 0) | diff)
        runs = SortedRuns(boundary, sorted_mask)
        return sorted_keys, sorted_payload, sorted_mask, runs

    @staticmethod
    def group_keys(sorted_keys, runs):
        """Representative key value per run slot (keys are equal within a run)."""
        return [runs.first(kv) for kv in sorted_keys]
