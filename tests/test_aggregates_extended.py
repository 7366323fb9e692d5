"""Extended aggregate functions vs pandas/numpy oracles.

Reference coverage model: velox/functions/prestosql/aggregates/tests — every
aggregate is exercised grouped and ungrouped, with nulls, across tile splits.
"""

import numpy as np
import pandas as pd
import pytest

import velox_tpu.dtypes as vt
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan
from velox_tpu.vector.string_table import StringTable


def make_table(**cols):
    names, types, data, tables, validities = [], [], {}, {}, {}
    for name, spec in cols.items():
        values, dtype = spec[0], spec[1]
        names.append(name)
        types.append(dtype)
        if dtype.is_string:
            st = StringTable()
            data[name] = st.intern_all([v for v in values])
            tables[name] = st
        else:
            data[name] = np.asarray(values)
        if len(spec) > 2 and spec[2] is not None:
            validities[name] = np.asarray(spec[2], dtype=bool)
    return Table(vt.RowType(names, types), data, tables, validities)


RNG = np.random.default_rng(42)
N = 1000
K = RNG.integers(0, 7, N)
V = RNG.integers(-50, 50, N).astype(np.int64)
W = RNG.normal(size=N)
B = RNG.random(N) > 0.3


def _run(aggs, keys=("k",), tile=256, table=None):
    t = table if table is not None else make_table(
        k=(K, vt.BIGINT), v=(V, vt.BIGINT), w=(W, vt.DOUBLE),
        b=(B, vt.BOOLEAN),
    )
    pb = PlanBuilder().table_scan(t).aggregation(list(keys), aggs)
    if keys:
        pb = pb.orderby(list(keys))
    return run_plan(pb.build(), tile_rows=tile).to_pandas()


def test_count_if_and_bool_aggs():
    out = _run([
        "count_if(b) as ci", "bool_and(b) as ba", "bool_or(b) as bo",
    ])
    df = pd.DataFrame({"k": K, "b": B})
    g = df.groupby("k")
    np.testing.assert_array_equal(out["ci"], g["b"].sum().values)
    np.testing.assert_array_equal(out["ba"], g["b"].all().values)
    np.testing.assert_array_equal(out["bo"], g["b"].any().values)


def test_variance_family():
    out = _run([
        "var_samp(w) as vs", "var_pop(w) as vp",
        "stddev(w) as sd", "stddev_pop(w) as sdp",
    ])
    df = pd.DataFrame({"k": K, "w": W})
    g = df.groupby("k")["w"]
    np.testing.assert_allclose(out["vs"], g.var(ddof=1).values, rtol=1e-9)
    np.testing.assert_allclose(out["vp"], g.var(ddof=0).values, rtol=1e-9)
    np.testing.assert_allclose(out["sd"], g.std(ddof=1).values, rtol=1e-9)
    np.testing.assert_allclose(out["sdp"], g.std(ddof=0).values, rtol=1e-9)


def test_variance_on_decimal():
    t = make_table(k=(K, vt.BIGINT), d=(V * 7, vt.decimal(10, 2)))
    out = (
        run_plan(
            PlanBuilder().table_scan(t)
            .aggregation(["k"], ["var_pop(d) as vp"]).orderby(["k"]).build(),
            tile_rows=128,
        ).to_pandas()
    )
    df = pd.DataFrame({"k": K, "d": (V * 7) / 100.0})
    np.testing.assert_allclose(
        out["vp"], df.groupby("k")["d"].var(ddof=0).values, rtol=1e-9
    )


def test_covar_corr():
    out = _run([
        "covar_pop(v, w) as cp", "covar_samp(v, w) as cs", "corr(v, w) as r",
    ])
    df = pd.DataFrame({"k": K, "v": V.astype(float), "w": W})
    g = df.groupby("k")
    cp = g.apply(lambda x: np.cov(x["v"], x["w"], ddof=0)[0, 1], include_groups=False)
    cs = g.apply(lambda x: np.cov(x["v"], x["w"], ddof=1)[0, 1], include_groups=False)
    r = g.apply(lambda x: np.corrcoef(x["v"], x["w"])[0, 1], include_groups=False)
    np.testing.assert_allclose(out["cp"], cp.values, rtol=1e-8)
    np.testing.assert_allclose(out["cs"], cs.values, rtol=1e-8)
    np.testing.assert_allclose(out["r"], r.values, rtol=1e-8)


def test_min_by_max_by():
    out = _run(["min_by(v, w) as mn", "max_by(v, w) as mx"])
    df = pd.DataFrame({"k": K, "v": V, "w": W})
    g = df.groupby("k")
    mn = g.apply(lambda x: x.loc[x["w"].idxmin(), "v"], include_groups=False)
    mx = g.apply(lambda x: x.loc[x["w"].idxmax(), "v"], include_groups=False)
    np.testing.assert_array_equal(out["mn"], mn.values)
    np.testing.assert_array_equal(out["mx"], mx.values)


def test_min_by_tiling_invariance():
    a = _run(["min_by(v, w) as mn"], tile=64)
    b = _run(["min_by(v, w) as mn"], tile=1024)
    pd.testing.assert_frame_equal(a, b)


def test_min_max_strings():
    words = ["pear", "apple", "fig", "banana", "kiwi", "apple", "zeta"]
    ks = [1, 1, 1, 2, 2, 2, 2]
    t = make_table(k=(ks, vt.BIGINT), s=(words, vt.VARCHAR))
    out = (
        run_plan(
            PlanBuilder().table_scan(t)
            .aggregation(["k"], ["min(s) as mn", "max(s) as mx"])
            .orderby(["k"]).build(),
            tile_rows=4,
        ).to_pandas()
    )
    assert out["mn"].tolist() == ["apple", "apple"]
    assert out["mx"].tolist() == ["pear", "zeta"]


def test_arbitrary_and_geometric_mean():
    pos = np.abs(V) + 1.0
    t = make_table(k=(K, vt.BIGINT), p=(pos, vt.DOUBLE))
    out = (
        run_plan(
            PlanBuilder().table_scan(t)
            .aggregation(["k"], ["geometric_mean(p) as gm", "arbitrary(p) as ar"])
            .orderby(["k"]).build(),
            tile_rows=256,
        ).to_pandas()
    )
    df = pd.DataFrame({"k": K, "p": pos})
    gm = df.groupby("k")["p"].apply(lambda x: np.exp(np.mean(np.log(x))))
    np.testing.assert_allclose(out["gm"], gm.values, rtol=1e-9)
    mn = df.groupby("k")["p"].min()
    np.testing.assert_array_equal(out["ar"], mn.values)  # deterministic 'any'


def test_checksum_order_independent():
    t1 = make_table(k=(K, vt.BIGINT), v=(V, vt.BIGINT))
    perm = RNG.permutation(N)
    t2 = make_table(k=(K[perm], vt.BIGINT), v=(V[perm], vt.BIGINT))
    o1 = _run(["checksum(v) as c"], table=t1)
    o2 = _run(["checksum(v) as c"], table=t2)
    pd.testing.assert_frame_equal(o1, o2)


def test_count_distinct_grouped():
    out = _run(["count(distinct v) as cd", "sum(v) as s"])
    df = pd.DataFrame({"k": K, "v": V})
    g = df.groupby("k")
    np.testing.assert_array_equal(out["cd"], g["v"].nunique().values)
    np.testing.assert_array_equal(out["s"], g["v"].sum().values)


def test_approx_distinct_ungrouped():
    out = _run(["approx_distinct(v) as ad", "count(*) as c"], keys=())
    assert out["ad"].iloc[0] == len(np.unique(V))
    assert out["c"].iloc[0] == N


def test_null_handling():
    valid = RNG.random(N) > 0.2
    t = make_table(k=(K, vt.BIGINT), v=(V, vt.BIGINT, valid))
    out = (
        run_plan(
            PlanBuilder().table_scan(t)
            .aggregation(["k"], ["count(v) as c", "min_by(v, v) as mb"])
            .orderby(["k"]).build(),
            tile_rows=128,
        ).to_pandas()
    )
    df = pd.DataFrame({"k": K, "v": np.where(valid, V, np.nan)})
    np.testing.assert_array_equal(out["c"], df.groupby("k")["v"].count().values)
    np.testing.assert_array_equal(out["mb"], df.groupby("k")["v"].min().values)


def test_bitwise_aggregates():
    import numpy as np

    from velox_tpu.dtypes import BIGINT, RowType
    from velox_tpu.exec import run_plan
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder

    t = Table(
        RowType(["g", "x"], [BIGINT, BIGINT]),
        {
            "g": np.array([1, 1, 1, 2, 2], np.int64),
            "x": np.array([0b1101, 0b1011, 0b1111, 0b0101, 0b0110], np.int64),
        },
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(
                ["g"],
                ["bitwise_and_agg(x) as a", "bitwise_or_agg(x) as o"],
            )
            .build(),
            tile_rows=2,  # multi-tile merge exercises the carry combine
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["a"].tolist() == [0b1001, 0b0100]
    assert out["o"].tolist() == [0b1111, 0b0111]
