"""Collect aggregates: array_agg / set_agg / map_agg / histogram / map_union.

Reference: velox/functions/prestosql/aggregates/{ArrayAgg,SetAgg,MapAgg,
Histogram,MapUnion}Aggregate.cpp + their tests — here checked against
hand-computed groups, including mixes with classic aggregates and multi-tile
inputs.
"""

import numpy as np

from velox_tpu.dtypes import BIGINT, DOUBLE, RowType, VARCHAR, map_
from velox_tpu.exec import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.vector.complex import HostSegments
from velox_tpu.vector.string_table import StringTable


def make_table():
    st = StringTable()
    st2 = StringTable()
    return Table(
        RowType(["g", "x", "k"], [VARCHAR, BIGINT, VARCHAR]),
        {
            "g": st.intern_all(["a", "b", "a", "b", "a"]),
            "x": np.array([3, 1, 2, 4, 2], np.int64),
            "k": st2.intern_all(["p", "q", "r", "q", "p"]),
        },
        {"g": st, "k": st2},
    )


def test_collect_aggregates_grouped():
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(make_table())
            .aggregation(
                ["g"],
                [
                    "array_agg(x) as ax",
                    "set_agg(x) as sx",
                    "map_agg(k, x) as mk",
                    "histogram(x) as h",
                    "count(x) as c",
                    "sum(x) as s",
                    "min(k) as mnk",
                    "max(x) as mx",
                    "avg(x) as av",
                ],
            )
            .build()
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["g"].tolist() == ["a", "b"]
    assert out["ax"].tolist() == [[3, 2, 2], [1, 4]]
    assert out["sx"].tolist() == [[2, 3], [1, 4]]
    assert out["mk"].tolist() == [{"p": 3, "r": 2}, {"q": 1}]
    assert out["h"].tolist() == [{2: 2, 3: 1}, {1: 1, 4: 1}]
    assert out["c"].tolist() == [3, 2]
    assert out["s"].tolist() == [7, 5]
    assert out["mnk"].tolist() == ["p", "q"]
    assert out["mx"].tolist() == [3, 4]
    assert out["av"].tolist() == [7 / 3, 2.5]


def test_collect_aggregates_global_and_nulls():
    t = Table(
        RowType(["x"], [BIGINT]),
        {"x": np.array([5, 7, 5], np.int64)},
        validities={"x": np.array([True, True, False])},
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .aggregation([], ["array_agg(x) as ax", "set_agg(x) as sx"])
        .build()
    ).to_pandas()
    # Presto array_agg keeps nulls; set_agg keeps one null
    assert out["ax"].tolist() == [[5, 7, None]]
    assert out["sx"].tolist() == [[5, 7, None]]


def test_map_union():
    mt = map_(VARCHAR, BIGINT)
    seg, _ = HostSegments.from_pylist(
        [{"a": 1}, {"b": 2}, {"a": 9, "c": 3}], mt
    )
    t = Table(
        RowType(["g", "m"], [BIGINT, mt]),
        {"g": np.array([1, 1, 2], np.int64), "m": seg},
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(["g"], ["map_union(m) as mu"])
            .build()
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["mu"].tolist() == [{"a": 1, "b": 2}, {"a": 9, "c": 3}]


def test_collect_agg_multi_tile():
    n = 5000
    rng = np.random.default_rng(0)
    g = rng.integers(0, 7, n)
    x = rng.integers(0, 100, n)
    t = Table(RowType(["g", "x"], [BIGINT, BIGINT]), {"g": g, "x": x})
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(["g"], ["array_agg(x) as ax", "sum(x) as s"])
            .build(),
            tile_rows=1024,  # forces 5 tiles
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["g"].tolist() == sorted(set(g.tolist()))
    for _, row in out.iterrows():
        expect = x[g == row["g"]]
        assert sorted(row["ax"]) == sorted(expect.tolist())
        assert row["s"] == expect.sum()


def test_approx_percentile_and_most_frequent():
    st = StringTable()
    t = Table(
        RowType(["g", "x", "s"], [BIGINT, BIGINT, VARCHAR]),
        {
            "g": np.array([1, 1, 1, 1, 2, 2], np.int64),
            "x": np.array([10, 20, 30, 40, 5, 7], np.int64),
            "s": st.intern_all(["a", "a", "b", "a", "c", "c"]),
        },
        {"s": st},
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(
                ["g"],
                [
                    "approx_percentile(x, 0.5) as p50",
                    "approx_percentile(x, 0.99) as p99",
                    "approx_most_frequent(1, s, 10) as top1",
                    "approx_most_frequent(2, x, 10) as top2",
                ],
            )
            .build()
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # exact quantiles (documented deviation: the reference's KLL sketch is
    # approximate; sorting is free here, so results are exact)
    assert out["p50"].tolist() == [30, 7]
    assert out["p99"].tolist() == [40, 7]
    assert out["top1"].tolist() == [{"a": 3}, {"c": 2}]
    assert out["top2"].tolist() == [{10: 1, 20: 1}, {5: 1, 7: 1}]


def test_right_join_rewrite():
    left = Table(
        RowType(["k", "lx"], [BIGINT, BIGINT]),
        {"k": np.array([1, 2], np.int64), "lx": np.array([10, 20], np.int64)},
    )
    right = Table(
        RowType(["rk", "ry"], [BIGINT, BIGINT]),
        {"rk": np.array([2, 3], np.int64), "ry": np.array([200, 300], np.int64)},
    )
    import pandas as pd

    out = (
        run_plan(
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["k"],
                ["rk"],
                output=["lx", "rk", "ry"],
                join_type="right",
            )
            .build()
        )
        .to_pandas()
        .sort_values("ry")
        .reset_index(drop=True)
    )
    assert out["ry"].tolist() == [200, 300]
    assert [None if pd.isna(v) else v for v in out["lx"]] == [20, None]


def test_array_agg_after_filter():
    t = make_table()
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .filter("x >= 2")
            .aggregation(["g"], ["array_agg(x) as ax"])
            .build()
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["ax"].tolist() == [[3, 2, 2], [4]]


def test_entropy():
    t = Table(
        RowType(["g", "x"], [BIGINT, BIGINT]),
        {
            "g": np.array([1, 1, 1, 1, 2, 2], np.int64),
            "x": np.array([1, 1, 2, 2, 5, 5], np.int64),
        },
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(["g"], ["entropy(x) as e"])
            .build()
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # group 1: two values 50/50 -> 1 bit; group 2: single value -> 0 bits
    assert out["e"].tolist() == [1.0, 0.0]


def test_reduce_agg():
    t = Table(
        RowType(["g", "x"], [BIGINT, BIGINT]),
        {
            "g": np.array([1, 1, 2, 2, 2], np.int64),
            "x": np.array([3, 4, 5, 6, 7], np.int64),
        },
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(
                ["g"],
                [
                    "reduce_agg(x, 1, (s, e) -> s * e, (a, b) -> a * b) as prod",
                    "sum(x) as s",
                ],
            )
            .build()
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["prod"].tolist() == [12, 210]
    assert out["s"].tolist() == [7, 18]


def test_multimap_agg():
    st = StringTable()
    t = Table(
        RowType(["g", "k", "v"], [BIGINT, VARCHAR, BIGINT]),
        {
            "g": np.array([1, 1, 1, 2], np.int64),
            "k": st.intern_all(["a", "a", "b", "c"]),
            "v": np.array([10, 11, 20, 30], np.int64),
        },
        {"k": st},
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(["g"], ["multimap_agg(k, v) as mm"])
            .build()
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["mm"].tolist() == [
        {"a": [10, 11], "b": [20]},
        {"c": [30]},
    ]


def test_approx_most_frequent_bounded_lowering():
    """The lone approx_most_frequent lowers onto count -> windowed top-k ->
    map_agg (PlanBuilder), so host state is groups x buckets rows instead of
    all distinct values (reference: ApproxMostFrequentStreamSummary.h; here
    the cut is exact)."""
    import numpy as np

    from velox_tpu.dtypes import RowType
    from velox_tpu.exec.runner import run_plan
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.plan.nodes import AggregationNode

    rng = np.random.default_rng(5)
    n = 60_000
    # zipf-ish: heavy hitters + a long tail of ~20k distinct values
    v = np.where(
        rng.random(n) < 0.5,
        rng.integers(0, 5, n),
        rng.integers(5, 20_000, n),
    ).astype(np.int64)
    g = rng.integers(0, 4, n)
    from velox_tpu.dtypes import BIGINT as _B
    t = Table(RowType(["g", "v"], [_B, _B]), {"g": g, "v": v})
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(["g"], ["approx_most_frequent(3, v, 100) as m"])
        .build()
    )
    # lowered shape: the root aggregation is map_agg, not the collect path
    assert isinstance(plan, AggregationNode)
    assert plan.aggregates[0].name == "map_agg"
    out = run_plan(plan).to_pandas().sort_values("g").reset_index(drop=True)
    import pandas as pd

    df = pd.DataFrame({"g": g, "v": v})
    for gid in range(4):
        counts = df[df.g == gid].v.value_counts()
        got = out[out.g == gid]["m"].iloc[0]
        assert len(got) == 3
        # exact top-3 by (count desc, value asc)
        top = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:3]
        assert got == {k: c for k, c in top}, (gid, got, top)
