"""Join fuzzer: random inputs x join types vs a pandas oracle.

Reference: velox/exec/tests/JoinFuzzer.cpp — random build/probe relations
(duplicate keys, null keys, empty sides) checked against an independent
implementation for every join type.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.dtypes import BIGINT, RowType
from velox_tpu.exec import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder


def random_side(rng, n, key_range, null_ratio):
    keys = rng.integers(0, key_range, n)
    payload = rng.integers(0, 1000, n)
    validity = rng.random(n) >= null_ratio
    return keys, payload, validity


def make_tables(rng, n_left, n_right, key_range, null_ratio):
    lk, lx, lv = random_side(rng, n_left, key_range, null_ratio)
    rk, ry, rv = random_side(rng, n_right, key_range, null_ratio)
    left = Table(
        RowType(["k", "lx"], [BIGINT, BIGINT]),
        {"k": lk, "lx": lx},
        validities={"k": lv},
    )
    right = Table(
        RowType(["rk", "ry"], [BIGINT, BIGINT]),
        {"rk": rk, "ry": ry},
        validities={"rk": rv},
    )
    # SQL: null keys never match — pandas merges NaN==NaN, so the oracle
    # replaces nulls with per-row unique sentinels that cannot collide
    ldf = pd.DataFrame(
        {
            "k": [
                int(v) if ok else -(i + 1)
                for i, (v, ok) in enumerate(zip(lk, lv))
            ],
            "k_null": ~lv,
            "lx": lx,
        }
    )
    rdf = pd.DataFrame(
        {
            "rk": [
                int(v) if ok else -(1_000_000 + i)
                for i, (v, ok) in enumerate(zip(rk, rv))
            ],
            "rk_null": ~rv,
            "ry": ry,
        }
    )
    return left, right, ldf, rdf


def engine_join(left, right, join_type, output, tile_rows=256):
    return run_plan(
        PlanBuilder()
        .table_scan(left)
        .hash_join(
            PlanBuilder().table_scan(right).build(),
            ["k"],
            ["rk"],
            output=output,
            join_type=join_type,
        )
        .build(),
        tile_rows=tile_rows,
    ).to_pandas()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_join_fuzz_inner_left_full(seed):
    rng = np.random.default_rng(seed)
    left, right, ldf, rdf = make_tables(rng, 500, 300, 40, 0.1)
    for jt, how in (("inner", "inner"), ("left", "left"), ("full", "outer")):
        got = (
            engine_join(left, right, jt, ["k", "lx", "ry"])
            .sort_values(["k", "lx", "ry"], na_position="last")
            .reset_index(drop=True)
        )
        expect = ldf.merge(rdf, left_on="k", right_on="rk", how=how)[
            ["k", "lx", "ry"]
        ]
        assert len(got) == len(expect), (jt, len(got), len(expect))
        for col in ("lx", "ry"):
            a = [None if pd.isna(v) else int(v) for v in got[col]]
            b = [None if pd.isna(v) else int(v) for v in expect[col]]
            assert sorted(x for x in a if x is not None) == sorted(
                x for x in b if x is not None
            ), (jt, col)
            assert a.count(None) == b.count(None), (jt, col)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_join_fuzz_semi_anti(seed):
    rng = np.random.default_rng(100 + seed)
    left, right, ldf, rdf = make_tables(rng, 400, 250, 30, 0.15)
    rkeys = set(rdf[~rdf["rk_null"]]["rk"])
    in_right = [
        (not null) and k in rkeys for k, null in zip(ldf["k"], ldf["k_null"])
    ]
    got_semi = engine_join(left, right, "left_semi", ["k", "lx"])
    assert sorted(got_semi["lx"]) == sorted(ldf[in_right]["lx"])
    got_anti = engine_join(left, right, "anti", ["k", "lx"])
    # standard (non-null-aware) anti: null probe keys never match -> kept
    assert sorted(got_anti["lx"]) == sorted(
        ldf[[not b for b in in_right]]["lx"]
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_join_fuzz_empty_sides(seed):
    rng = np.random.default_rng(200 + seed)
    left, right, ldf, rdf = make_tables(rng, 50, 40, 10, 0.1)
    empty = Table(
        RowType(["rk", "ry"], [BIGINT, BIGINT]),
        {"rk": np.zeros(0, np.int64), "ry": np.zeros(0, np.int64)},
    )
    assert len(engine_join(left, empty, "inner", ["k", "ry"])) == 0
    got_left = engine_join(left, empty, "left", ["k", "ry"])
    assert len(got_left) == len(ldf)
    assert all(pd.isna(v) for v in got_left["ry"])
    got_anti = engine_join(left, empty, "anti", ["k", "lx"])
    assert len(got_anti) == len(ldf)
