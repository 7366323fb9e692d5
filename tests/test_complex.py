"""ARRAY/MAP types: vector layer, scalar + lambda functions, Unnest/GroupId.

Reference coverage model: velox/vector/tests (ComplexVector), functions/
prestosql/tests/{ArrayFunctions,MapFunctions,Transform,Filter,Reduce,ZipWith}
Test.cpp and exec/tests/UnnestTest.cpp — each function checked against
hand-computed Presto semantics over a small table.
"""

import numpy as np
import pytest

from velox_tpu.dtypes import BIGINT, DOUBLE, RowType, VARCHAR, array, map_
from velox_tpu.exec import run_plan
from velox_tpu.exec.runner import QueryError
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.vector.complex import HostSegments

AT = array(BIGINT)
MT = map_(VARCHAR, BIGINT)


def make_table():
    seg, _ = HostSegments.from_pylist([[1, 2, 3], [], [5, None, 7], [9]], AT)
    mseg, _ = HostSegments.from_pylist(
        [{"a": 1, "b": 2}, {"c": 3}, {}, {"a": 9}], MT
    )
    return Table(
        RowType(["a", "m", "x"], [AT, MT, BIGINT]),
        {
            "a": seg,
            "m": mseg,
            "x": np.array([10, 20, 30, 40], np.int64),
        },
    )


def project(exprs):
    return run_plan(
        PlanBuilder().table_scan(make_table()).project(exprs).build()
    ).to_pandas()


def test_host_segments_roundtrip():
    rows = [[1, 2], None, [3, None], []]
    seg, validity = HostSegments.from_pylist(rows, AT)
    assert seg.to_pylist(validity) == rows
    sl = seg.slice_rows(1, 3)
    assert sl.to_pylist() == [[], [3, None]]
    took = seg.take_rows(np.array([3, 0, 0]))
    assert took.to_pylist() == [[], [1, 2], [1, 2]]
    cat = HostSegments.concat([seg, sl])
    assert len(cat) == 6 and cat.to_pylist()[4] == []


def test_array_scalar_functions():
    out = project(
        [
            "cardinality(a) as n",
            "try(a[1]) as first",
            "element_at(a, -1) as last",
            "element_at(a, 99) as oob",
            "contains(a, 2) as has2",
            "array_position(a, 7) as p7",
            "array_max(a) as mx",
            "array_min(a) as mn",
            "array_sum(a) as sm",
        ]
    )
    assert out["n"].tolist() == [3, 0, 3, 1]
    assert out["first"].tolist() == [1, None, 5, 9]
    assert out["last"].tolist() == [3, None, 7, 9]
    assert out["oob"].tolist() == [None] * 4
    assert out["has2"].tolist() == [True, False, None, False]
    assert out["p7"].tolist() == [0, 0, 3, 0]
    assert out["mx"].tolist() == [3, None, None, 9]
    assert out["mn"].tolist() == [1, None, None, 9]
    assert out["sm"].tolist() == [6, 0, 12, 9]


def test_subscript_error_and_restructuring():
    with pytest.raises(QueryError):
        project(["a[1] as v"])  # row 1 is empty -> out of range
    out = project(
        [
            "reverse(a) as rev",
            "array_sort(a) as srt",
            "array_distinct(array[1,2,1,3]) as dst",
            "slice(a, 2, 2) as sl",
            "concat(a, array[100]) as cc",
            "flatten(array[a, a]) as fl",
        ]
    )
    assert out["rev"].tolist() == [[3, 2, 1], [], [7, None, 5], [9]]
    assert out["srt"].tolist() == [[1, 2, 3], [], [5, 7, None], [9]]
    assert out["dst"].tolist() == [[1, 2, 3]] * 4
    assert out["sl"].tolist() == [[2, 3], [], [None, 7], []]
    assert out["cc"].tolist() == [[1, 2, 3, 100], [100], [5, None, 7, 100], [9, 100]]
    assert out["fl"].tolist() == [
        [1, 2, 3, 1, 2, 3],
        [],
        [5, None, 7, 5, None, 7],
        [9, 9],
    ]


def test_lambdas():
    out = project(
        [
            "transform(a, e -> e * 2 + x) as tr",
            "filter(a, e -> e > 2) as fl",
            "reduce(a, 0, (s, e) -> s + e, s -> s) as red",
            "reduce(a, 0, (s, e) -> s + coalesce(e, 0), s -> s * 10) as red2",
            "any_match(a, e -> e > 6) as anym",
            "all_match(a, e -> e > 0) as allm",
            "none_match(a, e -> e > 100) as nonem",
            "zip_with(a, array[1,1,1], (p, q) -> p + q) as zw",
        ]
    )
    assert out["tr"].tolist() == [[12, 14, 16], [], [40, None, 44], [58]]
    assert out["fl"].tolist() == [[3], [], [5, 7], [9]]
    assert out["red"].tolist() == [6, 0, None, 9]
    assert out["red2"].tolist() == [60, 0, 120, 90]
    assert out["anym"].tolist() == [False, False, True, True]
    # [5, None, 7]: no definite FALSE but a null result -> NULL
    assert out["allm"].tolist() == [True, True, None, True]
    assert out["nonem"].tolist() == [True, True, None, True]
    assert out["zw"].tolist() == [
        [2, 3, 4],
        [None, None, None],
        [6, None, 8],
        [10, None, None],
    ]


def test_map_functions():
    out = project(
        [
            "cardinality(m) as n",
            "map_keys(m) as mk",
            "map_values(m) as mv",
            "element_at(m, 'a') as ma",
            "try(m['zzz']) as miss",
            "map_values(map_filter(m, (k, v) -> v > 1)) as mf",
            "transform_values(m, (k, v) -> v * 10) as tv",
            "element_at(map(array[x, 1], array[7, 8]), x) as mx",
        ]
    )
    assert out["n"].tolist() == [2, 1, 0, 1]
    assert out["mk"].tolist() == [["a", "b"], ["c"], [], ["a"]]
    assert out["mv"].tolist() == [[1, 2], [3], [], [9]]
    assert out["ma"].tolist() == [1, None, None, 9]
    assert out["miss"].tolist() == [None] * 4
    assert out["mf"].tolist() == [[2], [3], [], [9]]
    assert out["tv"].tolist() == [
        {"a": 10, "b": 20},
        {"c": 30},
        {},
        {"a": 90},
    ]
    assert out["mx"].tolist() == [7, 7, 7, 7]


def test_filter_pipeline_with_complex_payload():
    """Row filters permute spans; pools re-normalize transparently."""
    out = run_plan(
        PlanBuilder()
        .table_scan(make_table())
        .filter("x >= 20")
        .project(["x", "array_sum(a) as s", "cardinality(m) as n"])
        .build()
    ).to_pandas()
    assert out["x"].tolist() == [20, 30, 40]
    assert out["s"].tolist() == [0, 12, 9]
    assert out["n"].tolist() == [1, 0, 1]


def test_unnest():
    out = run_plan(
        PlanBuilder()
        .table_scan(make_table())
        .unnest(["x"], ["a"], ordinality="ord")
        .build()
    ).to_pandas()
    assert out["x"].tolist() == [10, 10, 10, 30, 30, 30, 40]
    assert out["a"].tolist() == [1, 2, 3, 5, None, 7, 9]
    assert out["ord"].tolist() == [1, 2, 3, 1, 2, 3, 1]

    out2 = run_plan(
        PlanBuilder().table_scan(make_table()).unnest(["x"], ["m"]).build()
    ).to_pandas()
    assert out2["m_k"].tolist() == ["a", "b", "c", "a"]
    assert out2["m_v"].tolist() == [1, 2, 3, 9]

    # unnest feeding an aggregation (cardinality-changing step mid-pipeline)
    out3 = run_plan(
        PlanBuilder()
        .table_scan(make_table())
        .unnest(["x"], ["a"])
        .aggregation([], ["sum(a) as s", "count(a) as c"])
        .build()
    ).to_pandas()
    assert out3["s"].tolist() == [27]
    assert out3["c"].tolist() == [6]


def test_group_id_and_unique_id():
    t = make_table().select(["x"])
    out = run_plan(
        PlanBuilder().table_scan(t).group_id([["x"], []], [], "gid").build()
    ).to_pandas()
    assert out["gid"].tolist() == [0, 0, 0, 0, 1, 1, 1, 1]
    assert out["x"].tolist()[4:] == [None] * 4

    out2 = run_plan(
        PlanBuilder().table_scan(t).assign_unique_id("uid", 3).build()
    ).to_pandas()
    assert out2["uid"].tolist() == [(3 << 40) | i for i in range(4)]


def test_nested_arrays():
    nt = array(AT)
    seg, _ = HostSegments.from_pylist([[[1, 2], [3]], [], [[4]]], nt)
    t = Table(RowType(["n"], [nt]), {"n": seg})
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(
            [
                "cardinality(n) as c",
                "element_at(n, 1) as first",
                "flatten(n) as flat",
            ]
        )
        .build()
    ).to_pandas()
    assert out["c"].tolist() == [2, 0, 1]
    assert out["first"].tolist() == [[1, 2], None, [4]]
    assert out["flat"].tolist() == [[1, 2, 3], [], [4]]


def test_string_array_elements():
    st = array(VARCHAR)
    seg, _ = HostSegments.from_pylist([["x", "y"], ["y"], []], st)
    t = Table(RowType(["s"], [st]), {"s": seg})
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(["element_at(s, 1) as e1", "cardinality(s) as n"])
        .build()
    ).to_pandas()
    import pandas as pd

    assert [None if pd.isna(v) else v for v in out["e1"]] == ["x", "y", None]
    assert out["n"].tolist() == [2, 1, 0]


def test_array_set_operations_and_map_concat():
    mt = map_(VARCHAR, BIGINT)
    a, _ = HostSegments.from_pylist([[1, 2, 2, 3], [4], []], AT)
    b, _ = HostSegments.from_pylist([[2, 3, 9], [5], [1]], AT)
    m1, _ = HostSegments.from_pylist([{"a": 1, "b": 2}, {"x": 7}, {}], mt)
    m2, _ = HostSegments.from_pylist([{"b": 20, "c": 3}, {}, {"z": 9}], mt)
    t = Table(
        RowType(["a", "b", "m1", "m2"], [AT, AT, mt, mt]),
        {"a": a, "b": b, "m1": m1, "m2": m2},
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(
            [
                "array_intersect(a, b) as ai",
                "array_except(a, b) as ae",
                "arrays_overlap(a, b) as ao",
                "map_concat(m1, m2) as mc",
            ]
        )
        .build()
    ).to_pandas()
    assert out["ai"].tolist() == [[2, 3], [], []]
    assert out["ae"].tolist() == [[1], [4], []]
    assert out["ao"].tolist() == [True, False, False]
    # later map wins key clashes; different key dictionaries align at trace
    assert out["mc"].tolist() == [
        {"a": 1, "b": 20, "c": 3},
        {"x": 7},
        {"z": 9},
    ]


def test_cross_join():
    left = Table(RowType(["a"], [BIGINT]), {"a": np.array([1, 2, 3], np.int64)})
    right = Table(RowType(["b"], [BIGINT]), {"b": np.array([10, 20], np.int64)})
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(left)
            .cross_join(PlanBuilder().table_scan(right).build(), output=["a", "b"])
            .build()
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [
        [1, 10], [1, 20], [2, 10], [2, 20], [3, 10], [3, 20]
    ]
    out2 = (
        run_plan(
            PlanBuilder()
            .table_scan(left)
            .cross_join(
                PlanBuilder().table_scan(right).build(),
                output=["a", "b"],
                filter="a * 10 >= b",
            )
            .build()
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert out2.values.tolist() == [
        [1, 10], [2, 10], [2, 20], [3, 10], [3, 20]
    ]


def test_row_struct_columns():
    from velox_tpu.dtypes import row
    from velox_tpu.vector.complex import HostStruct

    rt = row(["a", "b"], [BIGINT, VARCHAR])
    st, validity = HostStruct.from_pylist(
        [{"a": 1, "b": "x"}, None, {"a": 3, "b": "y"}], rt
    )
    assert st.to_pylist(validity) == [{"a": 1, "b": "x"}, None, {"a": 3, "b": "y"}]
    t = Table(
        RowType(["r", "k"], [rt, BIGINT]),
        {"r": st, "k": np.array([10, 20, 30], np.int64)},
        validities={"r": validity},
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(["r.a as ra", "r.b as rb", "r", "row(k, r.a) as nr"])
        .build()
    ).to_pandas()
    assert out["ra"].tolist() == [1, None, 3]
    assert out["r"].tolist() == [{"a": 1, "b": "x"}, None, {"a": 3, "b": "y"}]
    assert out["nr"].tolist() == [
        {"f0": 10, "f1": 1},
        {"f0": 20, "f1": None},
        {"f0": 30, "f1": 3},
    ]

    # struct passthrough across filter compaction (children gather with rows)
    out2 = run_plan(
        PlanBuilder()
        .table_scan(t)
        .filter("k >= 20")
        .project(["r.a as ra", "r"])
        .build()
    ).to_pandas()
    assert out2["r"].tolist() == [None, {"a": 3, "b": "y"}]


def test_split_and_sequence():
    from velox_tpu.vector.string_table import StringTable

    st = StringTable()
    t = Table(
        RowType(["s"], [VARCHAR]),
        {"s": st.intern_all(["a,b,c", "", "x"])},
        {"s": st},
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(
            [
                "split(s, ',') as p",
                "element_at(split(s, ','), 2) as e2",
                "sequence(1, 4) as sq",
                "sequence(3, 1) as sqd",
            ]
        )
        .build()
    ).to_pandas()
    assert out["p"].tolist() == [["a", "b", "c"], [], ["x"]]
    import pandas as pd

    assert [None if pd.isna(v) else v for v in out["e2"]] == ["b", None, None]
    assert out["sq"].tolist() == [[1, 2, 3, 4]] * 3
    assert out["sqd"].tolist() == [[3, 2, 1]] * 3

    # split feeding unnest (the classic tokenize-and-count shape)
    out2 = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(["split(s, ',') as p"])
        .unnest([], ["p"])
        .aggregation(["p"], ["count(*) as c"])
        .build()
    ).to_pandas()
    got = dict(zip(out2["p"], out2["c"]))
    assert got == {"a": 1, "b": 1, "c": 1, "x": 1}


def test_map_zip_with():
    m1, _ = HostSegments.from_pylist([{"a": 1, "b": 2}, {"x": 7}, {}], MT)
    m2, _ = HostSegments.from_pylist([{"b": 20, "c": 3}, {}, {"z": 9}], MT)
    t = Table(RowType(["m1", "m2"], [MT, MT]), {"m1": m1, "m2": m2})
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(
            [
                "map_zip_with(m1, m2, (k, v1, v2) -> "
                "coalesce(v1, 0) + coalesce(v2, 0)) as z",
                "map_zip_with(m1, m2, (k, v1, v2) -> v1) as l",
            ]
        )
        .build()
    ).to_pandas()
    assert out["z"].tolist() == [
        {"a": 1, "b": 22, "c": 3},
        {"x": 7},
        {"z": 9},
    ]
    assert out["l"].tolist() == [
        {"a": 1, "b": 2, "c": None},
        {"x": 7},
        {"z": None},
    ]


def test_pool_overflow_raises_not_corrupts():
    """Join-duplicated rows can exceed an array column's static element pool;
    normalization must surface a query error, never truncate silently —
    span-only functions (cardinality) keep working on the shared pool."""
    seg, _ = HostSegments.from_pylist([[1, 2, 3], [4, 5, 6]], AT)
    left = Table(
        RowType(["k", "a"], [BIGINT, AT]),
        {"k": np.array([1, 2], np.int64), "a": seg},
    )
    right = Table(
        RowType(["rk"], [BIGINT]),
        {"rk": np.array([1, 1, 1, 1, 2, 2, 2, 2], np.int64)},
    )

    def plan(exprs):
        return (
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["k"],
                ["rk"],
                output=["k", "a"],
            )
            .project(exprs)
            .build()
        )

    with pytest.raises(QueryError):
        run_plan(plan(["k", "transform(a, e -> e * 2) as t"]))
    out = run_plan(plan(["k", "cardinality(a) as n"])).to_pandas()
    assert out["n"].tolist() == [3] * 8


def test_unique_build_join_keeps_probe_arrays():
    """Regression: the unique-key classification probe decoded ARRAY/MAP
    probe columns as flat values, dropping spans/element pools.  Probe-side
    complex columns must ride the row permutation with their pools intact
    (same contract as the expansion probe).  Reference: complex-typed
    output of HashProbe, velox/exec/HashProbe.cpp listJoinResults."""
    seg, _ = HostSegments.from_pylist([[1], [2, 2], [3, None, 3]], AT)
    left = Table(
        RowType(["k", "a"], [BIGINT, AT]),
        {"k": np.array([1, 2, 3], np.int64), "a": seg},
    )
    right = Table(
        RowType(["rk", "w"], [BIGINT, BIGINT]),
        {
            "rk": np.array([2, 3, 4], np.int64),
            "w": np.array([20, 30, 40], np.int64),
        },
    )

    def plan(join_type):
        return (
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["k"],
                ["rk"],
                output=["k", "a", "w"],
                join_type=join_type,
            )
            .project(["k", "a", "w"])
            .build()
        )

    out = run_plan(plan("inner")).to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, 3]
    assert [list(v) for v in out["a"]] == [[2, 2], [3, None, 3]]
    assert out["w"].tolist() == [20, 30]

    out = run_plan(plan("left")).to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 2, 3]
    assert [list(v) for v in out["a"]] == [[1], [2, 2], [3, None, 3]]
