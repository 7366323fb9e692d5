"""Session / query configuration.

Reference: velox/core/QueryConfig.h:44 — ~90 string-keyed session options over a
generic Config map (core/Config.h:29).  The TPU engine's knob set is smaller
(XLA owns what many reference knobs tune by hand), typed, and documented here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class QueryConfig:
    """Per-query session options (reference: core::QueryConfig).

    Defaults match the benchmark configuration; every field maps to a
    reference-config concept noted inline.
    """

    # kPreferredOutputBatchRows analog: rows per device tile.
    tile_rows: int = 1 << 20
    # kMaxOutputBatchRows analog for the benchmark path.
    bench_tile_rows: int = 1 << 22
    # HashTable kArray-mode ceiling (reference: HashTable::decideHashMode).
    max_array_groups: int = 256
    # kAbandonPartialAggregation* analog: stop per-tile partial grouping when a
    # tile produces more than this fraction of distinct groups (future use).
    abandon_partial_min_pct: float = 0.8
    # Spill: host-offload accumulated partial batches beyond this many bytes.
    spill_bytes_threshold: int = 4 << 30
    spill_enabled: bool = True
    # HBM budget for one query's device-resident state (scan tiles, join
    # builds, aggregation carries); None = untracked.  On pressure the
    # arbitrator reclaims (data cache first), and the grouped-aggregation
    # carry degrades to the spilling host-merge path.  Reference:
    # QueryConfig kQueryMaxMemoryPerNode + MemoryArbitrator.h:43.
    query_memory_limit_bytes: Optional[int] = None
    # Grouped aggregation: merge per-tile partial groups on device (sorted-
    # carry state, no per-tile host fetches).  False = legacy host merge,
    # which supports spilling when partials exceed spill_bytes_threshold.
    device_agg_merge: bool = True
    # Expression eval: raise on row errors (False = silently null, non-Presto).
    strict_errors: bool = True
    # Exchange: per-destination bucket capacity override (None = tile size).
    exchange_bucket_rows: Optional[int] = None
    # Distributed joins: build sides up to this many rows replicate to every
    # device (kBroadcast); larger builds hash-partition and probe rows shuffle
    # (kPartitioned).  Reference: core/PlanNode.h:1107 PartitionedOutput modes.
    broadcast_join_max_rows: int = 1 << 16
    # Distributed grouped aggregation: initial per-device carry slots (doubles
    # on overflow and the query retries — the backpressure analog of
    # OutputBuffer limits, velox/exec/OutputBuffer.h:131).  None = per-device
    # tile rows.
    distributed_carry_rows: Optional[int] = None
    # Timezone for timestamp functions (reference: kSessionTimezone).
    session_timezone: str = "UTC"

    def copy(self, **overrides) -> "QueryConfig":
        return dataclasses.replace(self, **overrides)


DEFAULT_CONFIG = QueryConfig()
