"""SQL frontend tests (velox_tpu/sql/planner.py).

Reference analog: velox/duckdb/conversion/tests — SQL planned and executed
against an independent oracle.  Here: pandas oracles for ad-hoc queries, and
the engine's own hand-built TPC-H plans for cross-validation (the SQL text of
Q1/Q3/Q6 must produce bit-identical results to the hand-assembled plans).
"""

import numpy as np
import pandas as pd
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import DOUBLE, RowType
from velox_tpu.exec.runner import run_plan
from velox_tpu.io.table import Table
from velox_tpu.sql import plan_sql, run_sql

RNG = np.random.default_rng(7)


def make_t(n=2000, seed=1):
    rng = np.random.default_rng(seed)
    return Table(
        RowType(["k", "v", "w"], [vt.BIGINT, vt.BIGINT, DOUBLE]),
        {
            "k": rng.integers(0, 20, n),
            "v": rng.integers(-100, 100, n),
            "w": rng.random(n) * 10,
        },
    )


def make_dim(seed=2):
    rng = np.random.default_rng(seed)
    return Table(
        RowType(["k", "label"], [vt.BIGINT, vt.BIGINT]),
        {"k": np.arange(15, dtype=np.int64), "label": rng.integers(0, 5, 15)},
    )


def df_of(t):
    return pd.DataFrame({n: np.asarray(t.columns[n]) for n in t.schema.names})


class TestBasics:
    def test_select_filter_project(self):
        t = make_t()
        out = run_sql(
            "select k, v + 1 as v1 from t where v > 0 and k < 10", {"t": t}
        ).to_pandas()
        df = df_of(t)
        expect = df[(df.v > 0) & (df.k < 10)]
        assert sorted(out["v1"]) == sorted((expect.v + 1).tolist())
        assert len(out.columns) == 2

    def test_star(self):
        t = make_t(100)
        out = run_sql("select * from t", {"t": t}).to_pandas()
        assert list(out.columns) == ["k", "v", "w"]
        assert len(out) == 100

    def test_group_by_having_order_limit(self):
        t = make_t()
        out = run_sql(
            "select k, sum(v) as s, count(*) as c from t "
            "group by k having count(*) > 10 order by s desc limit 5",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        g = df.groupby("k").agg(s=("v", "sum"), c=("v", "size")).reset_index()
        g = g[g.c > 10].sort_values("s", ascending=False).head(5)
        assert out["s"].tolist() == g["s"].tolist()
        assert out["c"].tolist() == g["c"].tolist()

    def test_ungrouped_aggregate_expression(self):
        t = make_t()
        out = run_sql(
            "select sum(v) + count(*) as x, min(v) as lo from t", {"t": t}
        ).to_pandas()
        df = df_of(t)
        assert int(out["x"].iloc[0]) == int(df.v.sum() + len(df))
        assert int(out["lo"].iloc[0]) == int(df.v.min())

    def test_group_by_expression_and_position(self):
        t = make_t()
        out = run_sql(
            "select k % 3, sum(v) as s from t group by 1 order by 1",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        g = (df.v.groupby(df.k % 3).sum()).sort_index()
        assert out.iloc[:, 0].tolist() == g.index.tolist()
        assert out["s"].tolist() == g.tolist()

    def test_group_by_select_list_alias(self):
        """GROUP BY an alias defined in the select list (standard scoping)."""
        t = make_t()
        out = run_sql(
            "select k % 3 as bucket, sum(v) as s from t "
            "group by bucket order by bucket",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        g = (df.v.groupby(df.k % 3).sum()).sort_index()
        assert out["bucket"].tolist() == g.index.tolist()
        assert out["s"].tolist() == g.tolist()
        # alias over a bare column works too
        out2 = run_sql(
            "select k as kk, count(*) as c from t group by kk order by kk",
            {"t": t},
        ).to_pandas()
        g2 = df.groupby("k").size()
        assert out2["kk"].tolist() == g2.index.tolist()
        assert out2["c"].tolist() == g2.tolist()

    def test_distinct(self):
        t = make_t()
        out = run_sql("select distinct k from t order by k", {"t": t}).to_pandas()
        assert out["k"].tolist() == sorted(set(df_of(t).k))

    def test_order_by_expression_not_in_select(self):
        t = make_t(500)
        out = run_sql(
            "select k, v from t order by w desc limit 3", {"t": t}
        ).to_pandas()
        df = df_of(t).sort_values("w", ascending=False).head(3)
        assert out["v"].tolist() == df.v.tolist()
        assert list(out.columns) == ["k", "v"]

    def test_limit_offset(self):
        t = make_t(50)
        out = run_sql(
            "select v from t order by v limit 10 offset 5", {"t": t}
        ).to_pandas()
        expect = sorted(df_of(t).v.tolist())[5:15]
        assert out["v"].tolist() == expect

    def test_between_and_case(self):
        t = make_t()
        out = run_sql(
            "select sum(case when v between 0 and 50 then 1 else 0 end) as c "
            "from t where k between 2 and 8",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        df = df[(df.k >= 2) & (df.k <= 8)]
        assert int(out["c"].iloc[0]) == int(((df.v >= 0) & (df.v <= 50)).sum())


class TestJoins:
    def test_comma_join_where_equi(self):
        t, d = make_t(), make_dim()
        out = run_sql(
            "select label, sum(v) as s from t, d "
            "where t.k = d.k and v > 0 group by label order by label",
            {"t": t, "d": d},
        ).to_pandas()
        df = df_of(t).merge(df_of(d), on="k")
        df = df[df.v > 0]
        g = df.groupby("label").v.sum().sort_index()
        assert out["label"].tolist() == g.index.tolist()
        assert out["s"].tolist() == g.tolist()

    def test_explicit_inner_join(self):
        t, d = make_t(300), make_dim()
        out = run_sql(
            "select t.k, label from t join d on t.k = d.k where label = 1",
            {"t": t, "d": d},
        ).to_pandas()
        df = df_of(t).merge(df_of(d), on="k")
        assert len(out) == int((df.label == 1).sum())
        assert set(out["label"]) <= {1}

    def test_left_join(self):
        t = Table(
            RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
            {"k": np.arange(30, dtype=np.int64), "v": np.arange(30, dtype=np.int64)},
        )
        d = make_dim()
        out = run_sql(
            "select t.k, label from t left join d on t.k = d.k order by t.k",
            {"t": t, "d": d},
        ).to_pandas()
        assert len(out) == 30
        assert out["label"].isna().sum() == 15  # keys 15..29 unmatched

    def test_self_join_requires_qualification(self):
        t = make_t(100)
        out = run_sql(
            "select a.k, b.v as bv from t a join t b on a.k = b.k "
            "where a.v > 90",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        expect = df[df.v > 90].merge(df, on="k", suffixes=("", "_b"))
        assert len(out) == len(expect)
        with pytest.raises(ValueError, match="ambiguous"):
            run_sql("select v from t a join t b on a.k = b.k", {"t": t})

    def test_subquery_in_from(self):
        t = make_t()
        out = run_sql(
            "select k2, sum(s) as total from "
            "(select k % 2 as k2, sum(v) as s from t group by k, 1) sub "
            "group by k2 order by k2",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        inner = df.groupby([df.k, df.k % 2]).v.sum()
        g = inner.groupby(level=1).sum().sort_index()
        assert out["total"].tolist() == g.tolist()

    def test_cross_join(self):
        a = Table(RowType(["x"], [vt.BIGINT]), {"x": np.arange(4, dtype=np.int64)})
        b = Table(RowType(["y"], [vt.BIGINT]), {"y": np.arange(3, dtype=np.int64)})
        out = run_sql(
            "select x, y from a cross join b order by x, y", {"a": a, "b": b}
        ).to_pandas()
        assert len(out) == 12


class TestTpchSql:
    """The standard TPC-H SQL text must reproduce the hand-built plans."""

    @pytest.fixture(scope="class")
    def tables(self):
        from velox_tpu.connectors.tpch import load_table

        return {
            name: load_table(name, 0.01)
            for name in ("lineitem", "orders", "customer")
        }

    def test_q6(self, tables):
        from velox_tpu.connectors.tpch.plans import build_q6

        sql = """
        select sum(l_extendedprice * l_discount) as revenue
        from lineitem
        where l_shipdate >= date '1994-01-01'
          and l_shipdate < date '1995-01-01'
          and l_discount between 0.05 and 0.07
          and l_quantity < 24
        """
        got = run_sql(sql, tables).to_pandas()
        expect = run_plan(build_q6(tables["lineitem"])).to_pandas()
        assert got["revenue"].iloc[0] == expect.iloc[0, 0]

    def test_q1(self, tables):
        from velox_tpu.connectors.tpch.plans import build_q1

        sql = """
        select l_returnflag, l_linestatus,
               sum(l_quantity) as sum_qty,
               sum(l_extendedprice) as sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge,
               avg(l_quantity) as avg_qty,
               avg(l_extendedprice) as avg_price,
               avg(l_discount) as avg_disc,
               count(*) as count_order
        from lineitem
        where l_shipdate <= date '1998-09-02'
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
        """
        got = run_sql(sql, tables).to_pandas()
        expect = run_plan(build_q1(tables["lineitem"])).to_pandas()
        assert len(got) == len(expect)
        for gc, ec in zip(got.columns, expect.columns):
            assert got[gc].tolist() == expect[ec].tolist(), (gc, ec)

    def test_q3(self, tables):
        from velox_tpu.connectors.tpch.plans import build_q3

        sql = """
        select l_orderkey,
               sum(l_extendedprice * (1 - l_discount)) as revenue,
               o_orderdate, o_shippriority
        from customer, orders, lineitem
        where c_mktsegment = 'BUILDING'
          and c_custkey = o_custkey
          and l_orderkey = o_orderkey
          and o_orderdate < date '1995-03-15'
          and l_shipdate > date '1995-03-15'
        group by l_orderkey, o_orderdate, o_shippriority
        order by revenue desc, o_orderdate
        limit 10
        """
        got = run_sql(sql, tables).to_pandas()
        expect = run_plan(
            build_q3(tables["customer"], tables["orders"], tables["lineitem"])
        ).to_pandas()
        assert len(got) == len(expect)
        assert set(got.columns) == set(expect.columns)
        for c in got.columns:
            assert got[c].tolist() == expect[c].tolist(), c


class TestSubqueries:
    def test_in_subquery(self):
        t, d = make_t(400), make_dim()
        out = run_sql(
            "select k, v from t where k in (select k from d where label = 2)",
            {"t": t, "d": d},
        ).to_pandas()
        df, dd = df_of(t), df_of(make_dim())
        keys = set(dd[dd.label == 2].k)
        assert len(out) == int(df.k.isin(keys).sum())

    def test_not_in_subquery(self):
        t, d = make_t(400), make_dim()
        out = run_sql(
            "select k from t where k not in (select k from d where label = 2)",
            {"t": t, "d": d},
        ).to_pandas()
        df, dd = df_of(t), df_of(make_dim())
        keys = set(dd[dd.label == 2].k)
        assert len(out) == int((~df.k.isin(keys)).sum())

    def test_not_in_null_semantics(self):
        """NOT IN lowers to a NULL-AWARE anti join: a NULL from the subquery
        empties the result; NULL probe values never pass (3-valued logic)."""
        probe = Table(
            RowType(["k"], [vt.BIGINT]),
            {"k": np.array([1, 2, 3], np.int64)},
            validities={"k": np.array([True, True, False])},
        )
        clean = Table(
            RowType(["j"], [vt.BIGINT]), {"j": np.array([2, 5], np.int64)}
        )
        out = run_sql(
            "select k from probe where k not in (select j from d)",
            {"probe": probe, "d": clean},
        ).to_pandas()
        # k=2 matches, k=NULL is unknown -> only k=1 survives
        assert out["k"].tolist() == [1]
        dirty = Table(
            RowType(["j"], [vt.BIGINT]),
            {"j": np.array([2, 5], np.int64)},
            validities={"j": np.array([True, False])},
        )
        out = run_sql(
            "select k from probe where k not in (select j from d)",
            {"probe": probe, "d": dirty},
        ).to_pandas()
        assert len(out) == 0  # NULL in the list: nothing is NOT IN it

    def test_scalar_subquery(self):
        t = make_t(500)
        out = run_sql(
            "select count(*) as c from t where w > (select avg(w) from t)",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        assert int(out["c"].iloc[0]) == int((df.w > df.w.mean()).sum())

    def test_correlated_scalar_q17_shape(self):
        """Correlated scalar aggregate decorrelates: group by the correlation
        key, LEFT-join back, filter (reference plan shape: TPC-H Q17)."""
        rng = np.random.default_rng(11)
        n = 800
        li = Table(
            RowType(
                ["l_partkey", "l_quantity", "l_price"],
                [vt.BIGINT, vt.BIGINT, vt.BIGINT],
            ),
            {
                "l_partkey": rng.integers(0, 50, n),
                "l_quantity": rng.integers(1, 50, n),
                "l_price": rng.integers(1, 1000, n),
            },
        )
        part = Table(
            RowType(["p_partkey", "p_size"], [vt.BIGINT, vt.BIGINT]),
            {"p_partkey": np.arange(50), "p_size": rng.integers(1, 10, 50)},
        )
        out = run_sql(
            "select sum(l_price) as s from lineitem, part "
            "where p_partkey = l_partkey and p_size < 5 and l_quantity < "
            "(select 0.2 * avg(l_quantity) from lineitem "
            " where l_partkey = p_partkey)",
            {"lineitem": li, "part": part},
        ).to_pandas()
        dfl = pd.DataFrame(
            {c: np.asarray(li.columns[c]) for c in li.schema.names}
        )
        dfp = pd.DataFrame(
            {c: np.asarray(part.columns[c]) for c in part.schema.names}
        )
        m = dfl.merge(dfp, left_on="l_partkey", right_on="p_partkey")
        avg = dfl.groupby("l_partkey").l_quantity.mean()
        m = m[(m.p_size < 5) & (m.l_quantity < 0.2 * m.l_partkey.map(avg))]
        assert int(out.s.fillna(0).iloc[0]) == int(m.l_price.sum())

    def test_exists_nonequality_q21_shape(self):
        """EXISTS with colliding inner/outer names and a non-equality
        correlated predicate (TPC-H Q21 shape) -> semi/anti join filter."""
        rng = np.random.default_rng(12)
        n = 500
        t = Table(
            RowType(["l_orderkey", "l_suppkey"], [vt.BIGINT, vt.BIGINT]),
            {
                "l_orderkey": rng.integers(0, 200, n),
                "l_suppkey": rng.integers(0, 4, n),
            },
        )
        df = pd.DataFrame(
            {c: np.asarray(t.columns[c]) for c in t.schema.names}
        )
        cnt = 0
        for _, r in df.iterrows():
            cnt += bool(
                (
                    (df.l_orderkey == r.l_orderkey)
                    & (df.l_suppkey != r.l_suppkey)
                ).any()
            )
        for neg, want in (("", cnt), ("not ", len(df) - cnt)):
            out = run_sql(
                f"select count(*) as c from l1 where {neg}exists ("
                "select l_orderkey from l2 "
                "where l2.l_orderkey = l1.l_orderkey "
                "and l2.l_suppkey <> l1.l_suppkey)",
                {"l1": t, "l2": t},
            ).to_pandas()
            assert int(out.c.iloc[0]) == want, neg

    def test_exists_correlated_q4(self):
        """TPC-H Q4's EXISTS shape vs the hand-built plan."""
        from velox_tpu.connectors.tpch import load_table
        from velox_tpu.connectors.tpch.plans import build_q4

        orders = load_table("orders", 0.01)
        lineitem = load_table("lineitem", 0.01)
        sql = """
        select o_orderpriority, count(*) as order_count
        from orders
        where o_orderdate >= date '1993-07-01'
          and o_orderdate < date '1993-10-01'
          and exists (
            select * from lineitem
            where l_orderkey = o_orderkey and l_commitdate < l_receiptdate
          )
        group by o_orderpriority
        order by o_orderpriority
        """
        got = run_sql(sql, {"orders": orders, "lineitem": lineitem}).to_pandas()
        expect = run_plan(build_q4(orders, lineitem)).to_pandas()
        for c in got.columns:
            assert got[c].tolist() == expect[c].tolist(), c

    def test_not_exists(self):
        t = Table(
            RowType(["k"], [vt.BIGINT]),
            {"k": np.arange(20, dtype=np.int64)},
        )
        d = make_dim()  # keys 0..14
        out = run_sql(
            "select k from t where not exists "
            "(select * from d where d.k = t.k) order by k",
            {"t": t, "d": d},
        ).to_pandas()
        assert out["k"].tolist() == list(range(15, 20))


class TestWindow:
    def test_row_number_rank(self):
        t = make_t(1000)
        out = run_sql(
            "select k, v, row_number() over (partition by k order by v) as rn,"
            " rank() over (partition by k order by v) as rk "
            "from t order by k, v, rn",
            {"t": t},
        ).to_pandas()
        df = df_of(t).sort_values(["k", "v"]).reset_index(drop=True)
        expect_rn = df.groupby("k").cumcount() + 1
        assert len(out) == len(df)
        got = out.sort_values(["k", "v", "rn"]).reset_index(drop=True)
        assert got.groupby("k")["rn"].max().tolist() == (
            df.groupby("k").size().tolist()
        )
        expect_rk = df.groupby("k")["v"].rank(method="min").astype(int)
        assert sorted(got["rk"].tolist()) == sorted(expect_rk.tolist())

    def test_windowed_sum_with_frame(self):
        t = make_t(500)
        out = run_sql(
            "select k, v, sum(v) over (partition by k order by v, w"
            " rows between 1 preceding and current row) as s "
            "from t",
            {"t": t},
        ).to_pandas()
        assert len(out) == 500
        # spot check: every s equals v plus at most one predecessor
        assert (out["s"] - out["v"]).abs().max() <= 200

    def test_window_in_subquery_then_filter(self):
        t = make_t(800)
        out = run_sql(
            "select k, v from (select k, v, row_number() over"
            " (partition by k order by v desc) as rn from t) sub"
            " where rn = 1 order by k",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        expect = df.groupby("k").v.max()
        assert out["v"].tolist() == expect.tolist()

    def test_window_plus_groupby(self):
        t = make_t(100)
        out = run_sql(
            "select k, sum(v) as s, row_number() over (order by k) as rn"
            " from t group by k order by k",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        gs = df.groupby("k").v.sum().sort_index()
        assert out["s"].tolist() == gs.tolist()
        assert out["rn"].tolist() == list(range(1, len(gs) + 1))


class TestUnion:
    def test_union_all(self):
        t = make_t(300)
        out = run_sql(
            "select k, v from t where v > 0 union all "
            "select k, v from t where v <= 0",
            {"t": t},
        ).to_pandas()
        assert len(out) == 300
        assert sorted(out["v"]) == sorted(df_of(t).v.tolist())

    def test_union_distinct(self):
        t = make_t(500)
        out = run_sql(
            "select k from t union select k from t", {"t": t}
        ).to_pandas()
        assert sorted(out["k"]) == sorted(set(df_of(t).k))

    def test_union_in_subquery_with_order(self):
        t = make_t(200)
        out = run_sql(
            "select a from (select k as a from t union all "
            "select v + 1000 as a from t) u order by a limit 5",
            {"t": t},
        ).to_pandas()
        df = df_of(t)
        expect = sorted(list(df.k) + list(df.v + 1000))[:5]
        assert out["a"].tolist() == expect

    def test_union_trailing_order_by_limit(self):
        """Trailing ORDER BY / LIMIT applies to the whole UNION (SQL rule)."""
        t = make_t(200)
        df = df_of(t)
        out = run_sql(
            "select k as a from t union all select v + 1000 as a from t "
            "order by a limit 5",
            {"t": t},
        ).to_pandas()
        expect = sorted(list(df.k) + list(df.v + 1000))[:5]
        assert out["a"].tolist() == expect
        out = run_sql(
            "select k as a from t union all select v + 1000 as a from t "
            "order by 1 desc",
            {"t": t},
        ).to_pandas()
        expect = sorted(list(df.k) + list(df.v + 1000), reverse=True)
        assert out["a"].tolist() == expect
        out = run_sql(
            "select k as a from t union select k as a from t order by a "
            "limit 3 offset 2",
            {"t": t},
        ).to_pandas()
        assert out["a"].tolist() == sorted(set(df.k))[2:5]


class TestGroupingSets:
    """GROUPING SETS / ROLLUP / CUBE lower through GroupIdNode
    (reference: core::GroupIdNode + exec/GroupId.cpp)."""

    def _table(self, n=600, seed=3):
        rng = np.random.default_rng(seed)
        return Table(
            RowType(["a", "b", "x"], [vt.BIGINT, vt.BIGINT, vt.BIGINT]),
            {
                "a": rng.integers(0, 4, n),
                "b": rng.integers(0, 3, n),
                "x": rng.integers(0, 100, n),
            },
        )

    @staticmethod
    def _df(t):
        return pd.DataFrame({c: np.asarray(t.columns[c]) for c in t.schema.names})

    def test_rollup(self):
        t = self._table()
        df = self._df(t)
        out = run_sql(
            "select a, b, sum(x) as s from t group by rollup(a, b)", {"t": t}
        ).to_pandas()
        ab = df.groupby(["a", "b"]).x.sum()
        a = df.groupby("a").x.sum()
        assert len(out) == len(ab) + len(a) + 1
        lvl_a = out[out.a.notna() & out.b.isna()].set_index("a")["s"]
        for k, v in a.items():
            assert int(lvl_a[k]) == int(v)
        tot = out[out.a.isna() & out.b.isna()]
        assert len(tot) == 1 and int(tot.s.iloc[0]) == int(df.x.sum())

    def test_cube(self):
        t = self._table(seed=4)
        df = self._df(t)
        out = run_sql(
            "select a, b, count(*) as c from t group by cube(a, b)", {"t": t}
        ).to_pandas()
        ab = df.groupby(["a", "b"]).size()
        assert len(out) == len(ab) + df.a.nunique() + df.b.nunique() + 1
        lvl_b = out[out.a.isna() & out.b.notna()].set_index("b")["c"]
        for k, v in df.groupby("b").size().items():
            assert int(lvl_b[k]) == int(v)

    def test_grouping_sets_explicit(self):
        t = self._table(seed=5)
        df = self._df(t)
        out = run_sql(
            "select a, b, sum(x) as s from t "
            "group by grouping sets ((a, b), (b), ())",
            {"t": t},
        ).to_pandas()
        assert len(out) == len(df.groupby(["a", "b"])) + df.b.nunique() + 1
        lvl_b = out[out.a.isna() & out.b.notna()].set_index("b")["s"]
        for k, v in df.groupby("b").x.sum().items():
            assert int(lvl_b[k]) == int(v)

    def test_plain_keys_with_rollup(self):
        """GROUP BY a, ROLLUP(b): 'a' is a fixed prefix of every set."""
        t = self._table(seed=6)
        df = self._df(t)
        out = run_sql(
            "select a, b, sum(x) as s from t group by a, rollup(b)", {"t": t}
        ).to_pandas()
        assert len(out) == len(df.groupby(["a", "b"])) + df.a.nunique()
        lvl_a = out[out.b.isna()].set_index("a")["s"]
        for k, v in df.groupby("a").x.sum().items():
            assert int(lvl_a[k]) == int(v)

    def test_mixed_constructs_cross_product(self):
        """GROUP BY ROLLUP(a), ROLLUP(b): the CROSS PRODUCT of the two set
        lists — {}, {a}, {b}, {a,b} (standard SQL; Presto semantics)."""
        t = self._table(seed=7)
        df = self._df(t)
        out = run_sql(
            "select a, b, sum(x) as s from t group by rollup(a), rollup(b)",
            {"t": t},
        ).to_pandas()
        n_ab = len(df.groupby(["a", "b"]))
        assert len(out) == n_ab + df.a.nunique() + df.b.nunique() + 1
        total = out[out.a.isna() & out.b.isna()]["s"].iloc[0]
        assert int(total) == int(df.x.sum())
        lvl_b = out[out.a.isna() & ~out.b.isna()].set_index("b")["s"]
        for k, v in df.groupby("b").x.sum().items():
            assert int(lvl_b[k]) == int(v)


class TestWindowWithGroupBy:
    """Window functions evaluate over the aggregated rows (SQL order of
    evaluation: GROUP BY -> HAVING -> window -> SELECT)."""

    def test_rank_over_aggregate(self):
        rng = np.random.default_rng(8)
        t = Table(
            RowType(["g", "x"], [vt.BIGINT, vt.BIGINT]),
            {"g": rng.integers(0, 6, 400), "x": rng.integers(0, 100, 400)},
        )
        df = pd.DataFrame({c: np.asarray(t.columns[c]) for c in ("g", "x")})
        out = run_sql(
            "select g, sum(x) as s, rank() over (order by sum(x) desc) as r "
            "from t group by g order by g",
            {"t": t},
        ).to_pandas()
        gs = df.groupby("g").x.sum().sort_index()
        assert out["s"].tolist() == gs.tolist()
        assert (
            out["r"].tolist()
            == gs.rank(method="min", ascending=False).astype(int).tolist()
        )

    def test_running_total_of_group_sums(self):
        rng = np.random.default_rng(9)
        t = Table(
            RowType(["g", "x"], [vt.BIGINT, vt.BIGINT]),
            {"g": rng.integers(0, 8, 500), "x": rng.integers(0, 50, 500)},
        )
        df = pd.DataFrame({c: np.asarray(t.columns[c]) for c in ("g", "x")})
        out = run_sql(
            "select g, sum(sum(x)) over (order by g) as running "
            "from t group by g order by g",
            {"t": t},
        ).to_pandas()
        expect = df.groupby("g").x.sum().sort_index().cumsum()
        assert out["running"].tolist() == expect.tolist()


class TestErrors:
    def test_unknown_table(self):
        with pytest.raises(KeyError, match="not in catalog"):
            plan_sql("select 1 as x from missing", {})

    def test_union_order_by_branch_raises(self):
        t = make_t(10)
        with pytest.raises(NotImplementedError, match="set-op"):
            plan_sql(
                "select k from t order by k union all select k from t",
                {"t": t},
            )

    def test_window_over_empty_spec(self):
        t = make_t(10)
        out = run_sql(
            "select sum(v) over () as s from t", {"t": t}
        ).to_pandas()
        assert set(out["s"]) == {df_of(t).v.sum()}


def test_non_equi_only_join_routes_to_nested_loop():
    """JOIN ... ON with no equality plans as a nested-loop join
    (reference: exec/NestedLoopJoinProbe.cpp)."""
    import numpy as np

    from velox_tpu.dtypes import BIGINT, RowType
    from velox_tpu.io.table import Table

    L = Table(RowType(["a"], [BIGINT]), {"a": np.array([1, 5, 9], np.int64)})
    R = Table(RowType(["b"], [BIGINT]), {"b": np.array([2, 6], np.int64)})
    out = run_sql(
        "SELECT a, b FROM L JOIN R ON a > b", {"L": L, "R": R}
    ).to_pandas()
    got = sorted((int(r.a), int(r.b)) for r in out.itertuples())
    assert got == [(5, 2), (9, 2), (9, 6)]
    out = run_sql(
        "SELECT a, b FROM L LEFT JOIN R ON a > b", {"L": L, "R": R}
    ).to_pandas()
    assert len(out) == 4  # row a=1 survives with NULL b


def _subq_catalog():
    from velox_tpu.dtypes import BIGINT

    O = Table(
        RowType(["k", "v"], [BIGINT, BIGINT]),
        {"k": np.array([1, 2, 3], np.int64),
         "v": np.array([10, 20, 30], np.int64)},
    )
    T = Table(
        RowType(["tk", "ty"], [BIGINT, BIGINT]),
        {"tk": np.array([1, 1, 2], np.int64),
         "ty": np.array([10, 99, 25], np.int64)},
    )
    return {"O": O, "T": T}


def test_correlated_in_subquery():
    """x IN (SELECT y FROM t WHERE t.k = o.k) is a semi join on the
    compound key (x, o.k) = (y, t.k)."""
    out = run_sql(
        "SELECT k FROM O WHERE v IN (SELECT ty FROM T WHERE tk = k)",
        _subq_catalog(),
    ).to_pandas()
    assert sorted(out["k"].tolist()) == [1]


def test_select_list_scalar_subqueries():
    cat = _subq_catalog()
    out = run_sql(
        "SELECT k, (SELECT max(ty) FROM T) AS m FROM O", cat
    ).to_pandas()
    assert out["m"].tolist() == [99, 99, 99]
    out = run_sql(
        "SELECT k, (SELECT sum(ty) FROM T WHERE tk = k) AS s FROM O", cat
    ).to_pandas()
    got = {int(r.k): (None if pd.isna(r.s) else int(r.s))
           for r in out.itertuples()}
    assert got == {1: 109, 2: 25, 3: None}  # missing group -> NULL scalar


def test_correlated_not_in_subquery():
    """x NOT IN (SELECT y FROM t WHERE t.k = o.k): null-aware semantics
    resolve per correlation key (NULL in the key's set drops the row, an
    empty set keeps it, a NULL x against a non-empty set drops)."""
    from velox_tpu.dtypes import BIGINT

    O = Table(
        RowType(["k", "v"], [BIGINT, BIGINT]),
        {"k": np.array([1, 1, 2, 3, 4], np.int64),
         "v": np.array([10, 11, 20, 30, 40], np.int64)},
        validities={"v": np.array([1, 1, 1, 1, 0], bool)},
    )
    T = Table(
        RowType(["tk", "ty"], [BIGINT, BIGINT]),
        {"tk": np.array([1, 1, 2, 2, 4], np.int64),
         "ty": np.array([10, 99, 77, 25, 5], np.int64)},
        validities={"ty": np.array([1, 1, 0, 1, 1], bool)},
    )
    out = run_sql(
        "SELECT v FROM O WHERE v NOT IN (SELECT ty FROM T WHERE tk = k)",
        {"O": O, "T": T},
    ).to_pandas()
    assert sorted(out["v"].tolist()) == [11, 30]


def test_correlated_scalar_subquery_non_equality():
    """Non-equality correlated scalar aggregates (round-4 verdict item 10):
    general decorrelation via unique-row-id join + per-row aggregation
    (sql/planner._attach_scalar_subquery_nonequi)."""
    from velox_tpu.dtypes import BIGINT

    rng = np.random.default_rng(7)
    n, m = 200, 300
    O = Table(
        RowType(["ok", "od", "ov"], [BIGINT] * 3),
        {"ok": rng.integers(0, 5, n), "od": rng.integers(0, 40, n),
         "ov": rng.integers(0, 1000, n)},
    )
    I = Table(
        RowType(["ik", "idt", "ix"], [BIGINT] * 3),
        {"ik": rng.integers(0, 5, m), "idt": rng.integers(0, 40, m),
         "ix": rng.integers(0, 100, m)},
    )
    cat = {"o": O, "i": I}
    do = pd.DataFrame({k: np.asarray(v) for k, v in O.columns.items()})
    di = pd.DataFrame({k: np.asarray(v) for k, v in I.columns.items()})

    # eq + non-eq correlation feeding avg (the classic decorrelation shape)
    out = (
        run_sql(
            "select ok, od, ov from o where ov > (select avg(ix) from i "
            "where i.ik = o.ok and i.idt < o.od)",
            cat,
        )
        .to_pandas()
        .sort_values(["ok", "od", "ov"])
        .reset_index(drop=True)
    )
    keep = []
    for _, r in do.iterrows():
        s = di[(di.ik == r.ok) & (di.idt < r.od)]["ix"]
        if len(s) and r.ov > s.mean():
            keep.append(r)
    exp = (
        pd.DataFrame(keep).sort_values(["ok", "od", "ov"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))

    # pure non-equality correlation (no equality keys: nested-loop route)
    out2 = (
        run_sql(
            "select ok, od from o where od * 3 < "
            "(select count(*) from i where i.idt < o.od)",
            cat,
        )
        .to_pandas()
        .sort_values(["ok", "od"])
        .reset_index(drop=True)
    )
    keep2 = do[
        [r.od * 3 < (di.idt < r.od).sum() for _, r in do.iterrows()]
    ][["ok", "od"]].sort_values(["ok", "od"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out2.astype("int64"), keep2.astype("int64"))

    # SELECT-list scalar with non-eq correlation: empty row sets give NULL
    out3 = (
        run_sql(
            "select ok, od, (select sum(ix) from i where i.ik = o.ok and "
            "i.idt > o.od) as s from o",
            cat,
        )
        .to_pandas()
        .sort_values(["ok", "od"])
        .reset_index(drop=True)
    )
    out3["s"] = out3["s"].astype("float64")
    exp3 = []
    for _, r in do.iterrows():
        s = di[(di.ik == r.ok) & (di.idt > r.od)]["ix"]
        exp3.append(float(s.sum()) if len(s) else float("nan"))
    exp3 = (
        pd.DataFrame({"ok": do.ok, "od": do.od, "s": exp3})
        .sort_values(["ok", "od"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out3, exp3, check_dtype=False)
