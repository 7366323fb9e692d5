"""Execution-engine unit tests: runner, joins, error surfacing, finishers."""

import numpy as np
import pandas as pd
import pytest

import velox_tpu as vt
from velox_tpu.exec import QueryError, run_plan
from velox_tpu.dtypes import RowType
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder


def make_table(**cols):
    names, types, arrays = [], [], {}
    tables = {}
    for name, (arr, dtype) in cols.items():
        names.append(name)
        types.append(dtype)
        a = np.asarray(arr)
        if dtype.is_string:
            from velox_tpu.vector.string_table import StringTable

            t = StringTable()
            arrays[name] = t.intern_all([str(v) for v in a])
            tables[name] = t
        else:
            arrays[name] = a
    return Table(RowType(names, types), arrays, tables)


def test_filter_project_collect():
    t = make_table(a=([1, 2, 3, 4, 5], vt.BIGINT), b=([10, 20, 30, 40, 50], vt.BIGINT))
    plan = PlanBuilder().table_scan(t).filter("a % 2 = 1").project(["a + b as s"]).build()
    out = run_plan(plan, tile_rows=4).to_pandas()
    np.testing.assert_array_equal(out["s"], [11, 33, 55])


def test_values_ordering_and_limit():
    t = make_table(x=([5, 3, 1, 4, 2], vt.BIGINT))
    plan = PlanBuilder().table_scan(t).orderby(["x desc"]).limit(3).build()
    out = run_plan(plan).to_pandas()
    np.testing.assert_array_equal(out["x"], [5, 4, 3])


def test_error_raises_and_try_masks():
    t = make_table(a=([1, 0, 2], vt.BIGINT))
    bad = PlanBuilder().table_scan(t).project(["10 / a as q"]).build()
    with pytest.raises(QueryError):
        run_plan(bad)
    ok = PlanBuilder().table_scan(t).project(["try(10 / a) as q"]).build()
    out = run_plan(ok).to_pandas()
    assert out["q"][1] is None or np.isnan(out["q"][1]) or out["q"][1] != out["q"][1] or out["q"].isna()[1]


def test_error_on_filtered_row_does_not_raise():
    # errors on rows already filtered out must not fail the query
    t = make_table(a=([1, 0, 2], vt.BIGINT))
    plan = (
        PlanBuilder().table_scan(t).filter("a > 0").project(["10 / a as q"]).build()
    )
    out = run_plan(plan).to_pandas()
    np.testing.assert_array_equal(out["q"], [10, 5])


def test_inner_join_basic():
    left = make_table(k=([1, 2, 3, 5], vt.BIGINT), v=([10, 20, 30, 50], vt.BIGINT))
    right = make_table(k2=([2, 3, 4], vt.BIGINT), w=([200, 300, 400], vt.BIGINT))
    plan = (
        PlanBuilder()
        .table_scan(left)
        .hash_join(
            PlanBuilder().table_scan(right), ["k"], ["k2"], output=["k", "v", "w"]
        )
        .build()
    )
    out = run_plan(plan).to_pandas().sort_values("k").reset_index(drop=True)
    np.testing.assert_array_equal(out["k"], [2, 3])
    np.testing.assert_array_equal(out["w"], [200, 300])


def test_left_join_nulls_and_coalesce():
    left = make_table(k=([1, 2, 3], vt.BIGINT))
    right = make_table(k2=([2], vt.BIGINT), w=([99], vt.BIGINT))
    plan = (
        PlanBuilder()
        .table_scan(left)
        .hash_join(
            PlanBuilder().table_scan(right),
            ["k"], ["k2"], output=["k", "w"], join_type="left",
        )
        .project(["k", "coalesce(w, -1) as w2"])
        .build()
    )
    out = run_plan(plan).to_pandas().sort_values("k").reset_index(drop=True)
    np.testing.assert_array_equal(out["w2"], [-1, 99, -1])


def test_semi_and_anti_join():
    left = make_table(k=([1, 2, 3, 4], vt.BIGINT))
    right = make_table(k2=([2, 4], vt.BIGINT))
    semi = (
        PlanBuilder().table_scan(left)
        .hash_join(PlanBuilder().table_scan(right), ["k"], ["k2"],
                   output=["k"], join_type="left_semi").build()
    )
    np.testing.assert_array_equal(
        run_plan(semi).to_pandas()["k"].sort_values().to_numpy(), [2, 4]
    )
    anti = (
        PlanBuilder().table_scan(left)
        .hash_join(PlanBuilder().table_scan(right), ["k"], ["k2"],
                   output=["k"], join_type="anti").build()
    )
    np.testing.assert_array_equal(
        run_plan(anti).to_pandas()["k"].sort_values().to_numpy(), [1, 3]
    )


def test_null_aware_anti_join():
    """NOT IN three-valued semantics (reference: HashJoinNode nullAware).

    - build contains a NULL -> empty result
    - NULL probe keys never pass a non-empty build set
    - empty build set -> every probe row passes, NULL keys included
    """
    from velox_tpu.dtypes import RowType
    from velox_tpu.io.table import Table

    probe = Table(
        RowType(["k"], [vt.BIGINT]),
        {"k": np.array([1, 2, 3, 4], np.int64)},
        validities={"k": np.array([True, True, False, True])},
    )

    def anti(build_vals, build_valid=None):
        build = Table(
            RowType(["k2"], [vt.BIGINT]),
            {"k2": np.asarray(build_vals, np.int64)},
            validities=(
                {"k2": np.asarray(build_valid)} if build_valid is not None else {}
            ),
        )
        plan = (
            PlanBuilder().table_scan(probe)
            .hash_join(PlanBuilder().table_scan(build), ["k"], ["k2"],
                       output=["k"], join_type="anti", null_aware=True)
            .build()
        )
        return sorted(run_plan(plan).to_pandas()["k"].fillna(-99).astype(int))

    # non-empty build, no nulls: k=3 (NULL) is dropped, unlike plain anti
    assert anti([2, 4]) == [1]
    # build contains a NULL key: nothing can pass
    assert anti([2, 9], [True, False]) == []
    # empty build set: NOT IN () is true for every row, NULL included
    assert anti(np.array([], np.int64)) == [-99, 1, 2, 4]
    # plain (NOT EXISTS) anti for contrast: NULL probe keys are kept
    plain = (
        PlanBuilder().table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(
                Table(RowType(["k2"], [vt.BIGINT]),
                      {"k2": np.array([2, 4], np.int64)})
            ),
            ["k"], ["k2"], output=["k"], join_type="anti",
        )
        .build()
    )
    assert sorted(
        run_plan(plain).to_pandas()["k"].fillna(-99).astype(int)
    ) == [-99, 1]


def test_null_aware_anti_join_with_filter():
    """Null-aware ANTI (NOT IN) + non-equi filter
    (rewrite_null_aware_anti_filter): probe row passes iff NO build row with
    (keys equal OR either key NULL) satisfies the filter — checked against a
    brute-force oracle over every (probe, build) pair, including NULL keys on
    both sides."""
    from velox_tpu.dtypes import RowType
    from velox_tpu.io.table import Table

    pk = np.array([1, 2, 3, 0, 5], np.int64)
    pkv = np.array([True, True, True, False, True])
    pv = np.array([10, 20, 30, 40, 50], np.int64)
    bk = np.array([2, 3, 0, 5], np.int64)
    bkv = np.array([True, True, False, True])
    bv = np.array([25, 15, 45, 99], np.int64)
    probe = Table(
        RowType(["k", "pv"], [vt.BIGINT, vt.BIGINT]),
        {"k": pk, "pv": pv}, validities={"k": pkv},
    )
    build = Table(
        RowType(["k2", "bv"], [vt.BIGINT, vt.BIGINT]),
        {"k2": bk, "bv": bv}, validities={"k2": bkv},
    )
    plan = (
        PlanBuilder().table_scan(probe)
        .hash_join(PlanBuilder().table_scan(build), ["k"], ["k2"],
                   output=["k", "pv"], join_type="anti", null_aware=True,
                   filter="pv < bv")
        .build()
    )
    got = sorted(run_plan(plan).to_pandas()["pv"].astype(int))
    expect = []
    for i in range(len(pk)):
        matched = False
        for j in range(len(bk)):
            keys_may_match = (
                (not pkv[i]) or (not bkv[j]) or pk[i] == bk[j]
            )
            if keys_may_match and pv[i] < bv[j]:
                matched = True
        if not matched:
            expect.append(int(pv[i]))
    # oracle by hand: pv=10 matches k=2/bv=25 -> out; pv=20 matches NULL-key
    # bv=45 -> out; pv=30 matches NULL-key bv=45 -> out; pv=40 (NULL probe
    # key) matches bv=45,99 -> out; pv=50 matches k=5/bv=99 -> out
    assert got == sorted(expect) == []

    # drop the NULL-key build row: NULL-probe row survives only if no build
    # row passes the filter; pv=50 < 99 still matches its key
    build2 = Table(
        RowType(["k2", "bv"], [vt.BIGINT, vt.BIGINT]),
        {"k2": bk[bkv], "bv": bv[bkv]},
    )
    plan2 = (
        PlanBuilder().table_scan(probe)
        .hash_join(PlanBuilder().table_scan(build2), ["k"], ["k2"],
                   output=["k", "pv"], join_type="anti", null_aware=True,
                   filter="pv < bv")
        .build()
    )
    got2 = sorted(run_plan(plan2).to_pandas()["pv"].astype(int))
    expect2 = []
    for i in range(len(pk)):
        matched = False
        for j in range(len(bk)):
            if not bkv[j]:
                continue
            if ((not pkv[i]) or pk[i] == bk[j]) and pv[i] < bv[j]:
                matched = True
        if not matched:
            expect2.append(int(pv[i]))
    # pv=10 (k=1, no key match) and pv=30 (30<15 fails) survive; pv=20
    # matches k=2 (20<25), pv=40's NULL key may-match bv=99, pv=50 < 99
    assert got2 == sorted(expect2) == [10, 30]


def test_semi_anti_join_with_filter():
    """Non-equi filters on existence joins (rewrite_filtered_existence_joins):
    a probe row passes SEMI iff >=1 match satisfies the filter, ANTI iff no
    match does — checked against a pandas oracle with duplicate build keys."""
    import pandas as pd

    rng = np.random.default_rng(5)
    n, m = 700, 300
    probe = make_table(
        k=(rng.integers(0, 40, n), vt.BIGINT),
        x=(rng.integers(0, 100, n), vt.BIGINT),
    )
    build = make_table(
        bk=(rng.integers(0, 40, m), vt.BIGINT),
        y=(rng.integers(0, 100, m), vt.BIGINT),
    )
    dfp = pd.DataFrame({c: np.asarray(probe.columns[c]) for c in ("k", "x")})
    dfb = pd.DataFrame({c: np.asarray(build.columns[c]) for c in ("bk", "y")})
    merged = dfp.reset_index().merge(dfb, left_on="k", right_on="bk")
    ok = merged[merged.x < merged.y]["index"].unique()
    expect_semi = dfp.loc[sorted(ok)]
    for jt, expect in (
        ("left_semi", expect_semi),
        ("anti", dfp.drop(index=ok)),
    ):
        plan = (
            PlanBuilder().table_scan(probe)
            .hash_join(
                PlanBuilder().table_scan(build), ["k"], ["bk"],
                output=["k", "x"], join_type=jt, filter="x < y",
            )
            .build()
        )
        got = (
            run_plan(plan, tile_rows=256).to_pandas()
            .sort_values(["k", "x"]).reset_index(drop=True)
        )
        exp = expect.sort_values(["k", "x"]).reset_index(drop=True)
        assert got["k"].tolist() == exp["k"].tolist(), jt
        assert got["x"].tolist() == exp["x"].tolist(), jt


def test_full_join_with_filter():
    """FULL join + non-equi filter (rewrite_full_filter): failing matches
    null-extend BOTH sides — oracle is a pandas outer merge with the filter
    applied to matched pairs."""
    import pandas as pd

    rng = np.random.default_rng(6)
    n, m = 300, 200
    probe = make_table(
        k=(rng.integers(0, 25, n), vt.BIGINT),
        x=(rng.integers(0, 100, n), vt.BIGINT),
    )
    build = make_table(
        bk=(rng.integers(0, 25, m), vt.BIGINT),
        y=(rng.integers(0, 100, m), vt.BIGINT),
    )
    dfp = pd.DataFrame(
        {c: np.asarray(probe.columns[c]) for c in ("k", "x")}
    ).reset_index(names="pi")
    dfb = pd.DataFrame(
        {c: np.asarray(build.columns[c]) for c in ("bk", "y")}
    ).reset_index(names="bi")
    mm = dfp.merge(dfb, left_on="k", right_on="bk")
    mm = mm[mm.x < mm.y]
    probe_un = dfp[~dfp.pi.isin(mm.pi)]
    build_un = dfb[~dfb.bi.isin(mm.bi)]
    expect = sorted(
        [(int(r.x), int(r.y)) for r in mm.itertuples()]
        + [(int(r.x), -1) for r in probe_un.itertuples()]
        + [(-1, int(r.y)) for r in build_un.itertuples()]
    )
    plan = (
        PlanBuilder().table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build), ["k"], ["bk"],
            output=["x", "y"], join_type="full", filter="x < y",
        )
        .build()
    )
    out = run_plan(plan, tile_rows=128).to_pandas()
    got = sorted(
        zip(out["x"].fillna(-1).astype(int), out["y"].fillna(-1).astype(int))
    )
    assert got == expect


def test_duplicate_build_keys_semi_dedupes_inner_expands():
    left = make_table(k=([1, 2], vt.BIGINT))
    right = make_table(k2=([2, 2], vt.BIGINT))
    semi = (
        PlanBuilder().table_scan(left)
        .hash_join(PlanBuilder().table_scan(right), ["k"], ["k2"],
                   output=["k"], join_type="left_semi").build()
    )
    # semi/anti joins deduplicate the build side (existence-only semantics)
    np.testing.assert_array_equal(run_plan(semi).to_pandas()["k"].to_numpy(), [2])
    inner = (
        PlanBuilder().table_scan(left)
        .hash_join(PlanBuilder().table_scan(right), ["k"], ["k2"],
                   output=["k"], join_type="inner").build()
    )
    # duplicate build keys expand: one output row per matching pair
    np.testing.assert_array_equal(
        run_plan(inner).to_pandas()["k"].to_numpy(), [2, 2]
    )


def test_multi_key_join():
    left = make_table(
        a=([1, 1, 2, 2, 3], vt.BIGINT), b=([10, 11, 10, 12, 10], vt.BIGINT)
    )
    right = make_table(
        a2=([1, 2, 3], vt.BIGINT), b2=([10, 12, 99], vt.BIGINT),
        v=([100, 200, 300], vt.BIGINT),
    )
    plan = (
        PlanBuilder().table_scan(left)
        .hash_join(PlanBuilder().table_scan(right), ["a", "b"], ["a2", "b2"],
                   output=["a", "b", "v"]).build()
    )
    out = run_plan(plan).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    np.testing.assert_array_equal(out["a"].to_numpy(), [1, 2])
    np.testing.assert_array_equal(out["b"].to_numpy(), [10, 12])
    np.testing.assert_array_equal(out["v"].to_numpy(), [100, 200])


def test_grouped_agg_sort_mode_min_max():
    t = make_table(
        k=([1, 1, 2, 2, 2, 9], vt.BIGINT), v=([5, 3, 8, 1, 4, 7], vt.BIGINT)
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(["k"], ["min(v) as lo", "max(v) as hi", "count(*) as n"])
        .orderby(["k"])
        .build()
    )
    out = run_plan(plan, tile_rows=4).to_pandas()
    np.testing.assert_array_equal(out["k"], [1, 2, 9])
    np.testing.assert_array_equal(out["lo"], [3, 1, 7])
    np.testing.assert_array_equal(out["hi"], [5, 8, 7])
    np.testing.assert_array_equal(out["n"], [2, 3, 1])


def test_string_key_array_mode_grouping():
    t = make_table(
        s=(["a", "b", "a", "c", "b", "a"], vt.VARCHAR),
        v=([1, 2, 3, 4, 5, 6], vt.BIGINT),
    )
    plan = (
        PlanBuilder().table_scan(t)
        .aggregation(["s"], ["sum(v) as total"]).orderby(["s"]).build()
    )
    out = run_plan(plan, tile_rows=4).to_pandas()
    np.testing.assert_array_equal(out["s"], ["a", "b", "c"])
    np.testing.assert_array_equal(out["total"], [10, 7, 4])


def test_inner_join_with_filter_argument():
    left = make_table(k=([1, 2, 3], vt.BIGINT), lx=([10, 20, 30], vt.BIGINT))
    right = make_table(k2=([1, 2, 3], vt.BIGINT), ry=([5, 25, 10], vt.BIGINT))
    plan = (
        PlanBuilder()
        .table_scan(left)
        .hash_join(
            PlanBuilder().table_scan(right),
            ["k"],
            ["k2"],
            output=["k", "lx", "ry"],
            filter="lx < ry",  # non-equi condition fused above the join
        )
        .build()
    )
    out = run_plan(plan).to_pandas().sort_values("k").reset_index(drop=True)
    np.testing.assert_array_equal(out["k"].to_numpy(), [2])
    np.testing.assert_array_equal(out["ry"].to_numpy(), [25])


@pytest.mark.parametrize("jt", ["inner", "left", "right", "full"])
def test_nested_loop_join_non_equi(jt):
    """General nested-loop join with a pure inequality condition
    (reference: exec/NestedLoopJoinProbe.cpp:23); all four outer-ness
    variants checked against a pandas cross-product oracle."""
    rng = np.random.RandomState(7)
    a = rng.randint(0, 20, 37).astype(np.int64)
    b = rng.randint(0, 20, 11).astype(np.int64)
    L = make_table(a=(a, vt.BIGINT))
    R = make_table(b=(b, vt.BIGINT))
    out = run_plan(
        PlanBuilder()
        .table_scan(L)
        .nested_loop_join(
            PlanBuilder().table_scan(R).build(), ["a", "b"], jt, "a > b"
        )
        .build()
    ).to_pandas()

    la = pd.DataFrame({"a": a, "_k": 1, "_i": np.arange(len(a))})
    rb = pd.DataFrame({"b": b, "_k": 1, "_j": np.arange(len(b))})
    prod = la.merge(rb, on="_k")
    hit = prod[prod.a > prod.b]
    parts = [hit[["a", "b"]]]
    if jt in ("left", "full"):
        unmatched = ~la._i.isin(hit._i)
        parts.append(
            pd.DataFrame({"a": la.a[unmatched], "b": np.nan})
        )
    if jt in ("right", "full"):
        unmatched = ~rb._j.isin(hit._j)
        parts.append(
            pd.DataFrame({"a": np.nan, "b": rb.b[unmatched]})
        )
    oracle = pd.concat(parts, ignore_index=True)

    key = lambda df: sorted(
        (None if pd.isna(r.a) else int(r.a), None if pd.isna(r.b) else int(r.b))
        for r in df.itertuples()
    ) if len(df) else []
    assert sorted(key(out), key=str) == sorted(key(oracle), key=str)
