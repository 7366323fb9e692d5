"""Data-dependent string construction (exec/strcast.py plan rewrite).

Reference analog: velox/expression/tests/CastExprTest.cpp (numeric->varchar
casts), velox/functions/prestosql/tests/ArrayJoinTest.cpp,
StringFunctionsTest (chr), sparksql BinTest.
"""

import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import (
    BIGINT,
    BOOLEAN,
    DATE,
    DOUBLE,
    RowType,
    TIMESTAMP,
    VARCHAR,
    array,
    decimal,
)
from velox_tpu.exec.runner import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.vector.complex import HostSegments


def scan(cols, types, validities=None, **arrays):
    t = Table(RowType(cols, types), arrays, validities=validities or {})
    return PlanBuilder().table_scan(t)


class TestScalarRender:
    def test_cast_integers(self):
        out = run_plan(
            scan(["i"], [BIGINT], i=np.array([5, -17, 1234567890123]))
            .project(["cast(i as varchar) as s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist() == ["5", "-17", "1234567890123"]

    def test_cast_double_specials(self):
        out = run_plan(
            scan(
                ["d"],
                [DOUBLE],
                d=np.array([1.5, -0.25, float("nan"), float("inf"), float("-inf")]),
            )
            .project(["cast(d as varchar) as s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist() == ["1.5", "-0.25", "NaN", "Infinity", "-Infinity"]

    def test_cast_boolean_date_timestamp_decimal(self):
        out = run_plan(
            scan(
                ["b", "dt", "ts", "dc"],
                [BOOLEAN, DATE, TIMESTAMP, decimal(10, 2)],
                b=np.array([True, False]),
                dt=np.array([0, 19000], np.int32),
                ts=np.array([0, 1_600_000_000_123_456], np.int64),
                dc=np.array([-12345, 700], np.int64),
            )
            .project(
                [
                    "cast(b as varchar) as sb",
                    "cast(dt as varchar) as sd",
                    "cast(ts as varchar) as st",
                    "cast(dc as varchar) as sc",
                ]
            )
            .build()
        ).to_pandas()
        assert out["sb"].tolist() == ["true", "false"]
        assert out["sd"].tolist() == ["1970-01-01", "2022-01-08"]
        assert out["st"].tolist() == [
            "1970-01-01 00:00:00.000",
            "2020-09-13 12:26:40.123",
        ]
        assert out["sc"].tolist() == ["-123.45", "7.00"]

    def test_bin_chr(self):
        out = run_plan(
            scan(["i"], [BIGINT], i=np.array([5, -1, 65]))
            .project(["bin(i) as b", "chr(i % 64 + 60) as c"])
            .build()
        ).to_pandas()
        assert out["b"].tolist() == ["101", "1" * 64, "1000001"]
        assert out["c"].tolist() == [chr(65), chr(59), chr(61)]

    def test_null_propagates(self):
        out = run_plan(
            scan(
                ["i"],
                [BIGINT],
                i=np.array([5, 0, 7]),
                validities={"i": np.array([True, False, True])},
            )
            .project(["cast(i as varchar) as s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist()[0] == "5"
        assert out["s"].isna().tolist() == [False, True, False]

    def test_try_wrapping_is_transparent(self):
        out = run_plan(
            scan(["i"], [BIGINT], i=np.array([3]))
            .project(["try(cast(i as varchar)) as s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist() == ["3"]

    def test_try_protects_erroring_argument(self):
        # round-4 advisor (medium): try(cast(a/b as varchar)) must NULL the
        # division-by-zero row, not raise (the construction itself cannot
        # error, but its argument can — the TRY stays on the argument)
        out = run_plan(
            scan(["a", "b"], [BIGINT, BIGINT],
                 a=np.array([6, 7]), b=np.array([2, 0]))
            .project(["try(cast(a / b as varchar)) as s"])
            .build()
        ).to_pandas()
        assert out["s"][0] == "3"
        assert out["s"].isna()[1]


class TestArrayJoin:
    def _table(self):
        st = array(VARCHAR)
        seg, val = HostSegments.from_pylist(
            [["x", "y"], [], ["a", None, "b"], None], st
        )
        return Table(RowType(["a"], [st]), {"a": seg}, validities={"a": val})

    def test_join_skips_nulls(self):
        out = run_plan(
            PlanBuilder()
            .table_scan(self._table())
            .project(["array_join(a, ',') as j"])
            .build()
        ).to_pandas()
        assert out["j"].tolist()[:3] == ["x,y", "", "a,b"]
        assert out["j"].isna().tolist() == [False, False, False, True]

    def test_join_null_replacement(self):
        out = run_plan(
            PlanBuilder()
            .table_scan(self._table())
            .project(["array_join(a, ',', 'N') as j"])
            .build()
        ).to_pandas()
        assert out["j"].tolist()[2] == "a,N,b"

    def test_join_numeric_elements(self):
        seg, _ = HostSegments.from_pylist([[1, 2, 3], [], [7]], array(BIGINT))
        t = Table(RowType(["a"], [array(BIGINT)]), {"a": seg})
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .project(["array_join(a, '-') as j"])
            .build()
        ).to_pandas()
        assert out["j"].tolist() == ["1-2-3", "", "7"]


class TestKeyUses:
    def test_group_by_constructed_key(self):
        out = (
            run_plan(
                scan(
                    ["x", "v"],
                    [BIGINT, DOUBLE],
                    x=np.array([1, 2, 1, 3, 2, 1]),
                    v=np.arange(6.0),
                )
                .project(["cast(x as varchar) as sx", "v"])
                .aggregation(["sx"], ["sum(v) as s", "count(*) as c"])
                .build()
            )
            .to_pandas()
            .sort_values("sx")
        )
        assert out["sx"].tolist() == ["1", "2", "3"]
        assert out["s"].tolist() == [7.0, 5.0, 3.0]
        assert out["c"].tolist() == [3, 2, 1]

    def test_distinct_on_constructed(self):
        out = run_plan(
            scan(["x"], [BIGINT], x=np.array([2, 2, 9, 2, 9]))
            .project(["cast(x as varchar) as sx"])
            .aggregation(["sx"], [])
            .build()
        ).to_pandas()
        assert sorted(out["sx"].tolist()) == ["2", "9"]

    def test_passthrough_join_output(self):
        left = (
            scan(
                ["k", "x"],
                [BIGINT, BIGINT],
                k=np.array([1, 2, 3]),
                x=np.array([10, 20, 30]),
            )
            .project(["k", "cast(x as varchar) as sx"])
            .build()
        )
        right = scan(
            ["k", "y"],
            [BIGINT, DOUBLE],
            k=np.array([2, 3, 4]),
            y=np.array([0.5, 1.5, 2.5]),
        ).build()
        plan = (
            PlanBuilder(left)
            .hash_join(right, ["k"], ["k"], output=["k", "sx", "y"])
            .build()
        )
        out = run_plan(plan).to_pandas().sort_values("k")
        assert out["sx"].tolist() == ["20", "30"]


class TestGates:
    def test_order_by_raises(self):
        with pytest.raises(NotImplementedError, match="sort key"):
            run_plan(
                scan(["i"], [BIGINT], i=np.array([5, 10, 9]))
                .project(["cast(i as varchar) as s"])
                .orderby(["s"])
                .build()
            )

    def test_filter_raises(self):
        # the string-function binding gates this even earlier than the
        # rewrite: a constructed column has no dictionary to bind against
        with pytest.raises((NotImplementedError, ValueError)):
            run_plan(
                scan(["i"], [BIGINT], i=np.array([5]))
                .project(["cast(i as varchar) as s"])
                .filter("length(s) > 1")
                .build()
            )

    def test_nested_use_raises(self):
        with pytest.raises((NotImplementedError, ValueError)):
            run_plan(
                scan(["i"], [BIGINT], i=np.array([5]))
                .project(["concat('v=', cast(i as varchar)) as s"])
                .build()
            )

    def test_min_aggregate_raises(self):
        with pytest.raises((NotImplementedError, ValueError, TypeError)):
            run_plan(
                scan(["i"], [BIGINT], i=np.array([5, 7]))
                .project(["cast(i as varchar) as s"])
                .aggregation([], ["min(s) as m"])
                .build()
            )

    def test_array_join_group_key_raises(self):
        st = array(VARCHAR)
        seg, val = HostSegments.from_pylist([["x"], ["y"]], st)
        t = Table(RowType(["a"], [st]), {"a": seg})
        with pytest.raises(NotImplementedError, match="injective|grouping"):
            run_plan(
                PlanBuilder()
                .table_scan(t)
                .project(["array_join(a, ',') as j"])
                .aggregation(["j"], [])
                .build()
            )


class TestSql:
    def test_sql_cast_group(self):
        from velox_tpu.sql.planner import plan_sql

        t = Table(
            RowType(["x", "v"], [BIGINT, DOUBLE]),
            {"x": np.array([1, 2, 1]), "v": np.array([1.0, 2.0, 4.0])},
        )
        plan = plan_sql(
            "select cast(x as varchar) as sx, sum(v) as s from t "
            "group by 1",
            {"t": t},
        )
        out = run_plan(plan).to_pandas().sort_values("sx")
        assert out["sx"].tolist() == ["1", "2"]
        assert out["s"].tolist() == [5.0, 2.0]


def test_distributed_matches_local():
    import jax

    from velox_tpu.parallel.runner import DistributedExecutor, make_mesh

    t = Table(
        RowType(["x", "v"], [BIGINT, DOUBLE]),
        {"x": np.arange(1000) % 7, "v": np.arange(1000.0)},
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .project(["cast(x as varchar) as sx", "v"])
        .aggregation(["sx"], ["sum(v) as s"])
        .build()
    )
    local = run_plan(plan).to_pandas().sort_values("sx").reset_index(drop=True)
    mesh = make_mesh(len(jax.devices()))
    dist = (
        DistributedExecutor(plan, mesh, per_device_rows=64)
        .run()
        .to_pandas()
        .sort_values("sx")
        .reset_index(drop=True)
    )
    assert local["sx"].tolist() == dist["sx"].tolist()
    assert local["s"].tolist() == dist["s"].tolist()
