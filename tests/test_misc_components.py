"""Smaller reference components: BloomFilter, StatsReporter, ArrowStream,
TableWriteMerge, MergeExchange.

Reference: velox/common/base/BloomFilter.h, StatsReporter.h:64,
core::ArrowStreamNode, core::TableWriteMergeNode, core::MergeExchangeNode
(PlanNode.h:890).
"""

import numpy as np

from velox_tpu.dtypes import BIGINT, RowType
from velox_tpu.exec import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.utils import reporter
from velox_tpu.utils.bloom import BloomFilter


def test_bloom_filter_host_and_device():
    import jax.numpy as jnp

    bf = BloomFilter(capacity=1000)
    keys = np.arange(0, 2000, 2, dtype=np.int64)  # evens
    bf.add(keys)
    probe = np.arange(100, dtype=np.int64)
    host = bf.might_contain_host(probe)
    assert host[::2].all()  # no false negatives
    assert (~host[1::2]).sum() > 40  # most odds rejected
    dev = np.asarray(bf.might_contain_device(jnp.asarray(probe)))
    np.testing.assert_array_equal(host, dev)


def test_stats_reporter_counts_queries():
    before = reporter.reporter().counter(reporter.METRIC_QUERY_COUNT)
    t = Table(RowType(["x"], [BIGINT]), {"x": np.arange(10, dtype=np.int64)})
    run_plan(PlanBuilder().table_scan(t).filter("x > 3").build())
    after = reporter.reporter().counter(reporter.METRIC_QUERY_COUNT)
    assert after == before + 1
    assert reporter.reporter().counter(reporter.METRIC_ROWS_SCANNED) >= 10

    # pluggable sink
    class Capture(reporter.BaseStatsReporter):
        pass

    prev = reporter.set_reporter(Capture())
    try:
        reporter.increment_counter("custom.metric", 5)
        assert reporter.reporter().counter("custom.metric") == 5
    finally:
        reporter.set_reporter(prev)


def test_arrow_stream_source():
    import pyarrow as pa

    batches = [
        pa.record_batch({"k": pa.array([1, 2], pa.int64()),
                         "s": pa.array(["a", "b"])}),
        pa.record_batch({"k": pa.array([3], pa.int64()),
                         "s": pa.array(["a"])}),
    ]
    out = run_plan(
        PlanBuilder()
        .arrow_stream(iter(batches))
        .filter("k >= 2")
        .project(["k", "s"])
        .build()
    ).to_pandas()
    assert out["k"].tolist() == [2, 3]
    assert out["s"].tolist() == ["b", "a"]


def test_table_write_merge(tmp_path):
    from velox_tpu.connectors.hive import HiveDataSink
    from velox_tpu.plan.nodes import TableWriteMergeNode, TableWriteNode

    t = Table(RowType(["x"], [BIGINT]), {"x": np.arange(7, dtype=np.int64)})
    root = str(tmp_path / "out")
    node = TableWriteNode(
        PlanBuilder().table_scan(t).build(),
        sink_factory=lambda: HiveDataSink(root),
    )
    out = run_plan(TableWriteMergeNode(node)).to_pandas()
    assert out["rows"].tolist() == [7]


def test_merge_exchange():
    a = Table(RowType(["k", "v"], [BIGINT, BIGINT]),
              {"k": np.array([1, 3, 5], np.int64), "v": np.array([10, 30, 50], np.int64)})
    b = Table(RowType(["k", "v"], [BIGINT, BIGINT]),
              {"k": np.array([2, 3, 6], np.int64), "v": np.array([20, 31, 60], np.int64)})
    out = run_plan(
        PlanBuilder()
        .merge_exchange(
            [
                PlanBuilder().table_scan(a),
                PlanBuilder().table_scan(b),
            ],
            ["k"],
        )
        .project(["k", "v"])
        .build()
    ).to_pandas()
    assert out["k"].tolist() == [1, 2, 3, 3, 5, 6]
    assert out["v"].tolist() == [10, 20, 30, 31, 50, 60]


class TestQueryConfigProperties:
    """String-keyed session property bridge (reference: core/Config.h:29)."""

    def test_from_properties(self):
        from velox_tpu.config import QueryConfig

        cfg = QueryConfig.from_properties(
            {
                "spill_enabled": "false",
                "tile_rows": "4096",
                "query_memory_limit_bytes": "1000000",
                "session_timezone": "America/New_York",
                "abandon_partial_min_pct": "0.5",
            }
        )
        assert cfg.spill_enabled is False
        assert cfg.tile_rows == 4096
        assert cfg.query_memory_limit_bytes == 1_000_000
        assert cfg.session_timezone == "America/New_York"
        assert cfg.abandon_partial_min_pct == 0.5

    def test_unknown_property_raises(self):
        import pytest

        from velox_tpu.config import QueryConfig

        with pytest.raises(KeyError, match="unknown session property"):
            QueryConfig.from_properties({"no_such_knob": "1"})

    def test_roundtrip_and_connector_tier(self):
        from velox_tpu.config import DEFAULT_CONFIG, QueryConfig

        props = DEFAULT_CONFIG.to_properties()
        cfg = QueryConfig.from_properties(props)
        assert cfg == DEFAULT_CONFIG
        hive = cfg.connector("hive")
        assert hive.split_preload_threads > 0
        import pytest

        with pytest.raises(KeyError):
            cfg.connector("iceberg")


def test_testing_utilities():
    """velox_tpu.testing assertion helpers (QueryAssertions analog)."""
    import numpy as np
    import pandas as pd

    import velox_tpu as vt
    from velox_tpu.dtypes import RowType
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.testing import assert_plan_result, run_at_tile_sizes

    rng = np.random.default_rng(3)
    t = Table(
        RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
        {"k": rng.integers(0, 5, 5000), "v": rng.integers(0, 100, 5000)},
    )
    plan = (
        PlanBuilder()
        .table_scan(t, filter="v >= 50")
        .aggregation(["k"], ["sum(v) as s"])
        .build()
    )
    df = pd.DataFrame({"k": t.columns["k"], "v": t.columns["v"]})
    oracle = (
        df[df.v >= 50].groupby("k").v.sum().reset_index().rename(columns={"v": "s"})
    )
    assert_plan_result(plan, oracle, sort_by=["k"])
    run_at_tile_sizes(plan, (512, 1 << 12, 1 << 16))
