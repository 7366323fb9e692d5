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
    def test_order_by_int_cast_now_supported(self):
        # was a gate until round 5: integer casts sort on device via packed
        # lexicographic byte words (TestOrderByConstructedString)
        out = run_plan(
            scan(["i"], [BIGINT], i=np.array([5, 10, 9]))
            .project(["cast(i as varchar) as s"])
            .orderby(["s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist() == ["10", "5", "9"]

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

    def test_concat_over_construction_now_supported(self):
        # was a gate until round 5: chained string functions over a
        # construction lower via the post-render chain (RenderSpec.post)
        out = run_plan(
            scan(["i"], [BIGINT], i=np.array([5]))
            .project(["concat('v=', cast(i as varchar)) as s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist() == ["v=5"]

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


class TestChainedStringFunctions:
    """String functions CHAINED over a constructed string (round-4 verdict
    item 10): the physical plan carries the underlying value and the chain
    applies host-side after the base render."""

    def test_reverse_substr_over_cast(self):
        out = run_plan(
            scan(["i"], [BIGINT], i=np.array([123, -45, 6]))
            .project([
                "reverse(cast(i as varchar)) as r",
                "substr(cast(i as varchar), 1, 2) as s",
            ])
            .build()
        ).to_pandas()
        assert out["r"].tolist() == ["321", "54-", "6"]
        assert out["s"].tolist() == ["12", "-4", "6"]

    def test_upper_over_bool_cast_and_concat(self):
        out = run_plan(
            scan(["b", "i"], [BOOLEAN, BIGINT],
                 b=np.array([True, False]), i=np.array([7, 8]))
            .project([
                "upper(cast(b as varchar)) as u",
                "concat('id-', cast(i as varchar)) as c",
                "concat('[', cast(i as varchar), ']') as c2",
            ])
            .build()
        ).to_pandas()
        assert out["u"].tolist() == ["TRUE", "FALSE"]
        assert out["c"].tolist() == ["id-7", "id-8"]
        assert out["c2"].tolist() == ["[7]", "[8]"]

    def test_nested_chain(self):
        out = run_plan(
            scan(["i"], [BIGINT], i=np.array([9876]))
            .project(["substr(reverse(cast(i as varchar)), 2) as s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist() == ["789"]

    def test_chain_matches_plain_string_fn(self):
        """Semantic parity: chaining over a construction must match running
        the same function over an equivalent scanned VARCHAR column."""
        vals = np.array([120, -3, 4567, 0])
        rendered = [str(int(v)) for v in vals]
        from velox_tpu.vector.string_table import StringTable

        st = StringTable()
        codes = st.intern_all(rendered)
        t = Table(
            RowType(["i", "s"], [BIGINT, vt.VARCHAR]),
            {"i": vals, "s": codes},
            {"s": st},
        )
        for exprs in (
            ["lpad(cast(i as varchar), 6, '*') as x", "lpad(s, 6, '*') as y"],
            ["replace(cast(i as varchar), '0', 'O') as x",
             "replace(s, '0', 'O') as y"],
            ["rpad(cast(i as varchar), 5, '.') as x", "rpad(s, 5, '.') as y"],
        ):
            out = run_plan(
                PlanBuilder().table_scan(t).project(exprs).build()
            ).to_pandas()
            assert out["x"].tolist() == out["y"].tolist(), exprs

    def test_chain_null_propagates(self):
        out = run_plan(
            scan(
                ["i"], [BIGINT],
                validities={"i": np.array([True, False])},
                i=np.array([3, 99]),
            )
            .project(["upper(cast(i as varchar)) as s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist()[0] == "3"
        assert out["s"].isna().tolist() == [False, True]

    def test_chained_grouping_key_raises(self):
        with pytest.raises(NotImplementedError):
            run_plan(
                scan(["i"], [BIGINT], i=np.array([1, 2, 1]))
                .project(["substr(cast(i as varchar), 1, 1) as s"])
                .aggregation(["s"], ["count(*) as c"])
                .build()
            )


class TestOrderByConstructedString:
    """ORDER BY a constructed string (round-4 verdict item 10): the sort
    runs on device over packed lexicographic byte words (__strlex_w*)."""

    def test_order_by_cast_int_lexicographic(self):
        vals = np.array([5, 100, 21, 3, 1000000, 9, -7, -100, 0, 19])
        out = run_plan(
            scan(["i"], [BIGINT], i=vals)
            .project(["cast(i as varchar) as s", "i as i"])
            .orderby(["s"])
            .build()
        ).to_pandas()
        expect = sorted((str(int(v)) for v in vals))
        assert out["s"].tolist() == expect

    def test_order_by_desc_and_topn(self):
        vals = np.array([12, 2, 120, 1200, 13, 3])
        out = run_plan(
            scan(["i"], [BIGINT], i=vals)
            .project(["cast(i as varchar) as s"])
            .topn(["s desc"], 3)
            .build()
        ).to_pandas()
        expect = sorted((str(int(v)) for v in vals), reverse=True)[:3]
        assert out["s"].tolist() == expect

    def test_order_by_chr_and_bool(self):
        out = run_plan(
            scan(
                ["c", "b"], [BIGINT, BOOLEAN],
                c=np.array([122, 97, 65]), b=np.array([True, False, True]),
            )
            .project(["chr(c) as s", "cast(b as varchar) as t"])
            .orderby(["s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist() == ["A", "a", "z"]

    def test_order_by_int64_extremes(self):
        vals = np.array(
            [np.iinfo(np.int64).min, np.iinfo(np.int64).max, -1, 1, 0]
        )
        out = run_plan(
            scan(["i"], [BIGINT], i=vals)
            .project(["cast(i as varchar) as s"])
            .orderby(["s"])
            .build()
        ).to_pandas()
        assert out["s"].tolist() == sorted(str(int(v)) for v in vals)

    def test_order_by_double_cast_still_gates(self):
        with pytest.raises(NotImplementedError):
            run_plan(
                scan(["d"], [DOUBLE], d=np.array([1.5, 2.5]))
                .project(["cast(d as varchar) as s"])
                .orderby(["s"])
                .build()
            )
