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


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_join_fuzz_wide_composite_keys(seed):
    """Composite keys whose ranges exceed 62 bits pack into TWO int64 limbs
    (joins.py _NormalizedKey.split) instead of erroring — the analog of the
    reference's kNormalizedKey -> kHash degradation (HashTable.h:74)."""
    rng = np.random.default_rng(300 + seed)
    n_build, n_probe = 200, 600
    # two 40-bit key parts -> 80 bits total; offsets keep ranges wide even
    # after min-subtraction
    base1 = np.int64(3) << 38
    base2 = np.int64(5) << 37
    k1 = base1 + rng.integers(0, 1 << 40, n_build)
    k2 = base2 + rng.integers(0, 1 << 40, n_build)
    # ensure unique build composites (two-limb N:M expansion is unsupported)
    _, uniq = np.unique(k1 << np.int64(2) ^ k2, return_index=True)
    k1, k2 = k1[uniq], k2[uniq]
    nb = len(k1)
    ry = rng.integers(0, 1000, nb)
    # probe: half hits, half misses (both dup-heavy)
    hit = rng.integers(0, nb, n_probe // 2)
    pk1 = np.concatenate([k1[hit], base1 + rng.integers(0, 1 << 40, n_probe // 2)])
    pk2 = np.concatenate([k2[hit], base2 + rng.integers(0, 1 << 40, n_probe // 2)])
    lx = rng.integers(0, 1000, len(pk1))
    left = Table(
        RowType(["k1", "k2", "lx"], [BIGINT] * 3),
        {"k1": pk1, "k2": pk2, "lx": lx},
    )
    right = Table(
        RowType(["rk1", "rk2", "ry"], [BIGINT] * 3),
        {"rk1": k1, "rk2": k2, "ry": ry},
    )
    ldf = pd.DataFrame({"k1": pk1, "k2": pk2, "lx": lx})
    rdf = pd.DataFrame({"rk1": k1, "rk2": k2, "ry": ry})
    for jt, how in (("inner", "inner"), ("left", "left")):
        got = run_plan(
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(right).build(),
                ["k1", "k2"],
                ["rk1", "rk2"],
                output=["lx", "ry"],
                join_type=jt,
            )
            .build(),
            tile_rows=256,
        ).to_pandas()
        expect = ldf.merge(
            rdf, left_on=["k1", "k2"], right_on=["rk1", "rk2"], how=how
        )
        assert len(got) == len(expect), (jt, len(got), len(expect))
        a = sorted(
            (int(x), -1 if pd.isna(y) else int(y))
            for x, y in zip(got["lx"], got["ry"])
        )
        b = sorted(
            (int(x), -1 if pd.isna(y) else int(y))
            for x, y in zip(expect["lx"], expect["ry"])
        )
        assert a == b, jt
    # semi/anti dedupe the build side, so two-limb duplicates are fine
    dup_right = Table(
        RowType(["rk1", "rk2", "ry"], [BIGINT] * 3),
        {
            "rk1": np.concatenate([k1, k1[: nb // 2]]),
            "rk2": np.concatenate([k2, k2[: nb // 2]]),
            "ry": np.concatenate([ry, ry[: nb // 2]]),
        },
    )
    match = ldf.merge(
        rdf, left_on=["k1", "k2"], right_on=["rk1", "rk2"], how="inner"
    )
    matched_lx = set(zip(match["k1"], match["k2"]))
    in_right = [
        (a, b) in matched_lx for a, b in zip(ldf["k1"], ldf["k2"])
    ]
    for jt, mask in (("left_semi", in_right), ("anti", [not m for m in in_right])):
        got = run_plan(
            PlanBuilder()
            .table_scan(left)
            .hash_join(
                PlanBuilder().table_scan(dup_right).build(),
                ["k1", "k2"],
                ["rk1", "rk2"],
                output=["lx"],
                join_type=jt,
            )
            .build(),
            tile_rows=256,
        ).to_pandas()
        assert sorted(got["lx"]) == sorted(ldf[mask]["lx"]), jt


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


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_left_join_non_equi_filter(seed):
    """LEFT join filters null the build side of failing matches instead of
    dropping rows (reference: HashProbe::applyFilter LEFT semantics)."""
    rng = np.random.default_rng(400 + seed)
    n_l, n_r = 600, 300
    lk = rng.integers(0, 200, n_l)
    lx = rng.integers(0, 100, n_l)
    # unique build keys (N:M LEFT filters are unsupported by design)
    rk = rng.permutation(400)[:n_r].astype(np.int64)
    ry = rng.integers(0, 100, n_r)
    left = Table(RowType(["k", "lx"], [BIGINT, BIGINT]), {"k": lk, "lx": lx})
    right = Table(RowType(["rk", "ry"], [BIGINT, BIGINT]), {"rk": rk, "ry": ry})
    got = run_plan(
        PlanBuilder()
        .table_scan(left)
        .hash_join(
            PlanBuilder().table_scan(right).build(),
            ["k"],
            ["rk"],
            output=["k", "lx", "ry"],
            join_type="left",
            filter="ry > lx",
        )
        .build(),
        tile_rows=256,
    ).to_pandas()
    ldf = pd.DataFrame({"k": lk, "lx": lx})
    rdf = pd.DataFrame({"rk": rk, "ry": ry})
    m = ldf.merge(rdf, left_on="k", right_on="rk", how="left")
    m.loc[~(m.ry > m.lx), "ry"] = np.nan  # failing matches null out
    assert len(got) == len(m) == n_l
    a = sorted(
        (int(k), int(x), None if pd.isna(y) else int(y))
        for k, x, y in zip(got.k, got.lx, got.ry)
    )
    b = sorted(
        (int(k), int(x), None if pd.isna(y) else int(y))
        for k, x, y in zip(m.k, m.lx, m.ry)
    )
    assert a == b


def test_left_join_filter_nm():
    # N:M LEFT joins with non-equi filters: a probe row whose matches all
    # fail the filter still emits one row with NULL right columns.
    rng = np.random.default_rng(7)
    lk = rng.integers(0, 10, 100)
    lx = rng.integers(0, 10, 100)
    left = Table(
        RowType(["k", "lx"], [BIGINT, BIGINT]),
        {"k": lk, "lx": lx},
    )
    dup = np.concatenate([np.arange(10), np.arange(10)]).astype(np.int64)
    ry = np.arange(20, dtype=np.int64)
    right = Table(
        RowType(["rk", "ry"], [BIGINT, BIGINT]),
        {"rk": dup, "ry": ry},
    )
    got = run_plan(
        PlanBuilder()
        .table_scan(left)
        .hash_join(
            PlanBuilder().table_scan(right).build(),
            ["k"], ["rk"],
            output=["k", "lx", "ry"],
            join_type="left",
            filter="ry > lx",
        )
        .build()
    ).to_pandas()

    ldf = pd.DataFrame({"k": lk, "lx": lx})
    rdf = pd.DataFrame({"rk": dup, "ry": ry})
    m = ldf.merge(rdf, left_on="k", right_on="rk", how="left")
    keep = m["ry"] > m["lx"]
    matched = m[keep]
    matched_keys = set(zip(matched.k, matched.lx))
    unmatched = ldf[
        ~ldf.apply(lambda r: (r.k, r.lx) in matched_keys, axis=1)
    ]
    a = sorted(
        (int(k), int(x), None if pd.isna(y) else int(y))
        for k, x, y in zip(got.k, got.lx, got.ry)
    )
    b = sorted(
        [(int(k), int(x), int(y)) for k, x, y in zip(matched.k, matched.lx, matched.ry)]
        + [(int(k), int(x), None) for k, x in zip(unmatched.k, unmatched.lx)]
    )
    assert a == b
