"""N:M (expansion) hash joins.

Reference: velox/exec/HashProbe.cpp — the reference's probe emits one output
row per (probe row, matching build row) pair.  Here duplicate-key build sides
keep per-key runs and the probe expands spans through the Unnest machinery
(exec/joins.py probe_spans/expand), sized per tile by one scalar fetch.
"""

import numpy as np
import pandas as pd

from velox_tpu.dtypes import BIGINT, RowType, VARCHAR
from velox_tpu.exec import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.vector.string_table import StringTable


def tables():
    left = Table(
        RowType(["k", "lx"], [BIGINT, BIGINT]),
        {
            "k": np.array([1, 2, 3, 4], np.int64),
            "lx": np.array([10, 20, 30, 40], np.int64),
        },
    )
    st = StringTable()
    right = Table(
        RowType(["rk", "ry", "rs"], [BIGINT, BIGINT, VARCHAR]),
        {
            "rk": np.array([1, 1, 1, 3, 5, 5], np.int64),
            "ry": np.array([100, 101, 102, 300, 500, 501], np.int64),
            "rs": st.intern_all(["a", "b", "c", "d", "e", "f"]),
        },
        {"rs": st},
    )
    return left, right


def test_inner_expansion():
    left, right = tables()
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["k"],
                ["rk"],
                output=["k", "lx", "ry", "rs"],
            )
            .build()
        )
        .to_pandas()
        .sort_values(["k", "ry"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 1, 1, 3]
    assert out["lx"].tolist() == [10, 10, 10, 30]
    assert out["ry"].tolist() == [100, 101, 102, 300]
    assert out["rs"].tolist() == ["a", "b", "c", "d"]


def test_left_expansion():
    left, right = tables()
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["k"],
                ["rk"],
                output=["k", "ry"],
                join_type="left",
            )
            .build()
        )
        .to_pandas()
        .sort_values(["k", "ry"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 1, 1, 2, 3, 4]
    assert [None if pd.isna(v) else v for v in out["ry"]] == [
        100,
        101,
        102,
        None,
        300,
        None,
    ]


def test_expansion_into_aggregation():
    left, right = tables()
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["k"],
                ["rk"],
                output=["k", "ry"],
            )
            .aggregation(["k"], ["count(ry) as c", "sum(ry) as s"])
            .build()
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["c"].tolist() == [3, 1]
    assert out["s"].tolist() == [303, 300]


def test_expansion_multi_tile_matches_pandas():
    rng = np.random.default_rng(7)
    n, m = 3000, 500
    left = Table(
        RowType(["k", "lx"], [BIGINT, BIGINT]),
        {
            "k": rng.integers(0, 200, n),
            "lx": rng.integers(0, 1000, n),
        },
    )
    right = Table(
        RowType(["rk", "ry"], [BIGINT, BIGINT]),
        {
            "rk": rng.integers(0, 200, m),
            "ry": rng.integers(0, 1000, m),
        },
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["k"],
                ["rk"],
                output=["k", "lx", "ry"],
            )
            .build(),
            tile_rows=1024,
        )
        .to_pandas()
        .sort_values(["k", "lx", "ry"])
        .reset_index(drop=True)
    )
    expect = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk")[["k", "lx", "ry"]]
        .sort_values(["k", "lx", "ry"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, expect)


def test_expansion_multi_key():
    left = Table(
        RowType(["a", "b", "lx"], [BIGINT, BIGINT, BIGINT]),
        {
            "a": np.array([1, 1, 2], np.int64),
            "b": np.array([5, 6, 5], np.int64),
            "lx": np.array([10, 20, 30], np.int64),
        },
    )
    right = Table(
        RowType(["ra", "rb", "ry"], [BIGINT, BIGINT, BIGINT]),
        {
            "ra": np.array([1, 1, 1, 2], np.int64),
            "rb": np.array([5, 5, 6, 7], np.int64),
            "ry": np.array([100, 101, 102, 103], np.int64),
        },
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["a", "b"],
                ["ra", "rb"],
                output=["a", "b", "lx", "ry"],
            )
            .build()
        )
        .to_pandas()
        .sort_values(["a", "b", "ry"])
        .reset_index(drop=True)
    )
    assert out["ry"].tolist() == [100, 101, 102]
    assert out["lx"].tolist() == [10, 10, 20]


def test_full_outer_join():
    left = Table(
        RowType(["k", "lx"], [BIGINT, BIGINT]),
        {"k": np.array([1, 2, 5], np.int64), "lx": np.array([10, 20, 50], np.int64)},
    )
    right = Table(
        RowType(["rk", "ry"], [BIGINT, BIGINT]),
        {
            "rk": np.array([2, 2, 3], np.int64),
            "ry": np.array([200, 201, 300], np.int64),
        },
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["k"],
                ["rk"],
                output=["k", "lx", "rk", "ry"],
                join_type="full",
            )
            .build()
        )
        .to_pandas()
        .sort_values(["k", "ry"], na_position="last")
        .reset_index(drop=True)
    )
    norm = lambda col: [None if pd.isna(v) else v for v in col]  # noqa: E731
    assert norm(out["k"]) == [1, 2, 2, 5, None]
    assert norm(out["ry"]) == [None, 200, 201, None, 300]
    assert norm(out["rk"]) == [None, 2, 2, None, 3]

    # the unmatched-build epilogue must flow through downstream operators
    out2 = run_plan(
        PlanBuilder()
        .table_scan(left)
        .hash_join(
            PlanBuilder().table_scan(right).build(),
            ["k"],
            ["rk"],
            output=["lx", "ry"],
            join_type="full",
        )
        .aggregation([], ["count(lx) as cl", "count(ry) as cr", "sum(ry) as s"])
        .build()
    ).to_pandas()
    assert out2["cl"].tolist() == [4]
    assert out2["cr"].tolist() == [3]
    assert out2["s"].tolist() == [701]
