"""Long decimals / HUGEINT (exec/hugeint.py + ops/int128.py).

Reference test analog: velox/type/tests/HugeIntTest.cpp +
DecimalArithmeticTest.cpp — exact 128-bit arithmetic, aggregation, and IO
round-trips validated against python's arbitrary-precision ints.
"""

from decimal import Context, Decimal

CX = Context(prec=60)

import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import RowType, decimal
from velox_tpu.exec.runner import LocalExecutor, run_plan
from velox_tpu.io.table import Table
from velox_tpu.ops.int128 import np_from_int, np_to_int
from velox_tpu.plan import PlanBuilder

D38 = decimal(38, 2)
RNG = np.random.default_rng(7)


def rand_ints(n, seed=1, digits=30):
    """Random ints spanning ``digits`` decimal digits (beyond int64)."""
    rng = np.random.default_rng(seed)
    half = 10 ** (digits // 2)
    return [
        int(rng.integers(-half, half)) * int(rng.integers(1, half))
        + int(rng.integers(0, 1000))
        for _ in range(n)
    ]


def long_table(n=3000, seed=1, with_group=True):
    vals = rand_ints(n, seed)
    hi, lo = np_from_int(vals)
    cols = {"v": np.stack([lo, hi], axis=1)}
    names, types = ["v"], [D38]
    if with_group:
        rng = np.random.default_rng(seed + 1)
        cols["g"] = rng.integers(0, 8, n)
        names.append("g")
        types.append(vt.BIGINT)
    return Table(RowType(names, types), cols), vals


class TestOps:
    def test_limbs_roundtrip_and_arith(self):
        vals = rand_ints(500, seed=3, digits=36)
        hi, lo = np_from_int(vals)
        assert np_to_int(hi, lo) == vals

    def test_device_matches_numpy(self):
        import jax.numpy as jnp

        from velox_tpu.expr.registry import DEFAULT_REGISTRY as reg
        from velox_tpu.ops.int128 import (
            np_add,
            np_lt,
            np_mul_i64,
            register_i128_functions,
        )

        register_i128_functions()

        def dev(name, *args):
            sig = reg.signatures(name)[0]
            return np.asarray(
                sig.impl(None, None, None, *[jnp.asarray(a) for a in args])
            )

        a = rand_ints(300, seed=4, digits=34)
        b = rand_ints(300, seed=5, digits=34)
        ah, al = np_from_int(a)
        bh, bl = np_from_int(b)
        got_lo = dev("__i128_add_lo", al, bl)
        got_hi = dev("__i128_add_hi", ah, al, bh, bl)
        exp_hi, exp_lo = np_add(ah, al, bh, bl)
        np.testing.assert_array_equal(got_lo, exp_lo)
        np.testing.assert_array_equal(got_hi, exp_hi)
        np.testing.assert_array_equal(
            dev("__i128_lt", ah, al, bh, bl), np_lt(ah, al, bh, bl)
        )
        x = RNG.integers(-(2**62), 2**62, 400)
        y = RNG.integers(-(2**62), 2**62, 400)
        eh, el = np_mul_i64(x, y)
        np.testing.assert_array_equal(dev("__i128_mul64_hi", x, y), eh)
        np.testing.assert_array_equal(dev("__i128_mul64_lo", x, y), el)


class TestQueries:
    def test_filter_compare_literal(self):
        t, vals = long_table()
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .filter("v > 0.00")
            .aggregation([], ["count(*) as c"])
            .build()
        ).to_pandas()
        assert int(out["c"].iloc[0]) == sum(v > 0 for v in vals)

    def test_project_add_negate_to_double(self):
        t, vals = long_table(500, seed=9, with_group=False)
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .project(
                [
                    "v + v as twice",
                    "-v as neg",
                    "cast(v as double) as d",
                ]
            )
            .build()
        )
        twice = out.columns["twice"]
        assert np_to_int(twice[:, 1], twice[:, 0]) == [2 * v for v in vals]
        neg = out.columns["neg"]
        assert np_to_int(neg[:, 1], neg[:, 0]) == [-v for v in vals]
        np.testing.assert_allclose(
            out.columns["d"], [float(v) / 100 for v in vals], rtol=1e-12
        )

    def test_sum_count_avg_grouped(self):
        t, vals = long_table(4000, seed=11)
        g = np.asarray(t.columns["g"])
        out = (
            run_plan(
                PlanBuilder()
                .table_scan(t)
                .aggregation(
                    ["g"],
                    ["sum(v) as s", "count(v) as c", "avg(v) as a"],
                )
                .build()
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        for gid in range(8):
            sel = [v for v, gg in zip(vals, g) if gg == gid]
            row = out[out.g == gid].iloc[0]
            assert row["s"] == Decimal(sum(sel)).scaleb(-2, CX), gid
            assert int(row["c"]) == len(sel)
            np.testing.assert_allclose(
                float(row["a"]), sum(sel) / len(sel) / 100, rtol=1e-9
            )

    def test_sum_ungrouped_tile_invariance(self):
        t, vals = long_table(3000, seed=13, with_group=False)
        plan = (
            PlanBuilder().table_scan(t).aggregation([], ["sum(v) as s"]).build()
        )
        for tile in (256, 1 << 16):
            out = LocalExecutor(plan, tile_rows=tile).run().to_pandas()
            assert out["s"].iloc[0] == Decimal(sum(vals)).scaleb(-2, CX), tile

    def test_group_by_long_key(self):
        # few distinct long values as grouping keys
        distinct = rand_ints(5, seed=15)
        rng = np.random.default_rng(16)
        picks = rng.integers(0, 5, 2000)
        vals = [distinct[i] for i in picks]
        hi, lo = np_from_int(vals)
        t = Table(
            RowType(["k", "x"], [D38, vt.BIGINT]),
            {
                "k": np.stack([lo, hi], axis=1),
                "x": rng.integers(0, 100, 2000),
            },
        )
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(["k"], ["count(*) as c"])
            .build()
        ).to_pandas()
        assert len(out) == 5
        expect = {
            Decimal(d).scaleb(-2, CX): int((picks == i).sum())
            for i, d in enumerate(distinct)
        }
        got = {k: int(c) for k, c in zip(out["k"], out["c"])}
        assert got == expect

    def test_widening_multiply_exact(self):
        """sum(widening_multiply(a, b)) is exact past 18 digits."""
        rng = np.random.default_rng(17)
        n = 2000
        a = rng.integers(10**8, 10**9, n)  # decimal(18, 2) values
        b = rng.integers(10**8, 10**9, n)
        t = Table(
            RowType(["a", "b"], [decimal(18, 2), decimal(18, 2)]),
            {"a": a, "b": b},
        )
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .project(["widening_multiply(a, b) as p"])
            .aggregation([], ["sum(p) as s"])
            .build()
        ).to_pandas()
        exact = sum(int(x) * int(y) for x, y in zip(a, b))
        assert out["s"].iloc[0] == Decimal(exact).scaleb(-4, CX)

    def test_nulls(self):
        t, vals = long_table(1000, seed=19, with_group=False)
        rng = np.random.default_rng(20)
        valid = rng.random(1000) > 0.3
        t = Table(t.schema, t.columns, validities={"v": valid})
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation([], ["sum(v) as s", "count(v) as c"])
            .build()
        ).to_pandas()
        kept = [v for v, ok in zip(vals, valid) if ok]
        assert out["s"].iloc[0] == Decimal(sum(kept)).scaleb(-2, CX)
        assert int(out["c"].iloc[0]) == len(kept)

    def test_min_max_grouped(self):
        """Exact lexicographic (hi, lo) extremes through the pair combiner."""
        t, vals = long_table(5000, seed=21)
        g = np.asarray(t.columns["g"])
        out = (
            run_plan(
                PlanBuilder()
                .table_scan(t)
                .aggregation(["g"], ["min(v) as lo", "max(v) as hi"])
                .build()
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        for gid in range(8):
            sel = [v for v, gg in zip(vals, g) if gg == gid]
            row = out[out.g == gid].iloc[0]
            assert row["lo"] == Decimal(min(sel)).scaleb(-2, CX), gid
            assert row["hi"] == Decimal(max(sel)).scaleb(-2, CX), gid

    def test_long_multiply_exact(self):
        """long x long full 128-bit truncated product (scales add)."""
        n = 800
        a = rand_ints(n, seed=51, digits=17)
        b = rand_ints(n, seed=52, digits=17)
        ah, al = np_from_int(a)
        bh, bl = np_from_int(b)
        t = Table(
            RowType(["a", "b"], [decimal(20, 2), decimal(20, 3)]),
            {"a": np.stack([al, ah], axis=1), "b": np.stack([bl, bh], axis=1)},
        )
        out = run_plan(
            PlanBuilder().table_scan(t).project(["a * b as p"]).build()
        )
        p = out.columns["p"]
        assert out.schema.type_of("p").scale == 5
        assert np_to_int(p[:, 1], p[:, 0]) == [x * y for x, y in zip(a, b)]

    def test_long_divide_exact(self):
        """Exact decimal division with round-half-away (DecimalUtil twin)."""
        from velox_tpu.ops.int128 import np_div_round

        n = 700
        a = rand_ints(n, seed=53, digits=30)
        b = [v or 7 for v in rand_ints(n, seed=54, digits=12)]
        ah, al = np_from_int(a)
        bh, bl = np_from_int(b)
        t = Table(
            RowType(["a", "b"], [decimal(38, 2), decimal(20, 2)]),
            {"a": np.stack([al, ah], axis=1), "b": np.stack([bl, bh], axis=1)},
        )
        out = run_plan(
            PlanBuilder().table_scan(t).project(["a / b as q"]).build()
        )
        q = out.columns["q"]
        assert out.schema.type_of("q").scale == 2
        # rScale=2, k = 2 + 2 - 2 = 2: q = round_half_away(a*100 / b)
        expect = np_div_round([x * 100 for x in a], b)
        assert np_to_int(q[:, 1], q[:, 0]) == expect

    def test_divide_by_zero_raises(self):
        from velox_tpu.exec.runner import QueryError

        ah, al = np_from_int([100, 200])
        t = Table(
            RowType(["a", "b"], [decimal(38, 2), decimal(20, 2)]),
            {
                "a": np.stack([al, ah], axis=1),
                "b": np.zeros((2, 2), np.int64),
            },
        )
        with pytest.raises(QueryError):
            run_plan(
                PlanBuilder().table_scan(t).project(["a / b as q"]).build()
            )

    def test_rescale_casts(self):
        """long->long up/down rescales, long->short narrow, long->bigint."""
        vals = rand_ints(600, seed=55, digits=24)
        hi, lo = np_from_int(vals)
        t = Table(
            RowType(["v"], [decimal(30, 2)]),
            {"v": np.stack([lo, hi], axis=1)},
        )
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .project(
                [
                    "cast(v as decimal(38, 5)) as up",
                    "cast(v as decimal(38, 0)) as down",
                ]
            )
            .build()
        )
        up = out.columns["up"]
        assert np_to_int(up[:, 1], up[:, 0]) == [v * 1000 for v in vals]

        def rha(v, d):  # round half away from zero
            q, r = divmod(abs(v), d)
            if 2 * r >= d:
                q += 1
            return -q if v < 0 else q

        down = out.columns["down"]
        assert np_to_int(down[:, 1], down[:, 0]) == [rha(v, 100) for v in vals]

        # BIGINT narrowing needs int64-representable rounded values
        small = [int(x) for x in RNG.integers(-(10**17), 10**17, 300)]
        sh, sl = np_from_int(small)
        ts = Table(
            RowType(["v"], [decimal(30, 2)]),
            {"v": np.stack([sl, sh], axis=1)},
        )
        out2 = run_plan(
            PlanBuilder().table_scan(ts).project(["cast(v as bigint) as i"]).build()
        )
        np.testing.assert_array_equal(
            out2.columns["i"], [rha(v, 100) for v in small]
        )

    def test_narrow_overflow_raises(self):
        """BIGINT narrowing of a >63-bit value errors (reference throws)."""
        from velox_tpu.exec.runner import QueryError

        hi, lo = np_from_int([10**24])
        t = Table(
            RowType(["v"], [decimal(30, 2)]),
            {"v": np.stack([lo, hi], axis=1)},
        )
        with pytest.raises(QueryError):
            run_plan(
                PlanBuilder()
                .table_scan(t)
                .project(["cast(v as bigint) as i"])
                .build()
            )

    def test_narrow_to_short_decimal(self):
        vals = [int(x) for x in RNG.integers(-(10**15), 10**15, 500)]
        hi, lo = np_from_int(vals)
        t = Table(
            RowType(["v"], [decimal(30, 2)]),
            {"v": np.stack([lo, hi], axis=1)},
        )
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .project(["cast(v as decimal(18, 4)) as s"])
            .build()
        )
        np.testing.assert_array_equal(
            out.columns["s"], [v * 100 for v in vals]
        )

    def test_rescale_overflow_raises(self):
        from velox_tpu.exec.runner import QueryError

        vals = [10**36]
        hi, lo = np_from_int(vals)
        t = Table(
            RowType(["v"], [decimal(38, 0)]),
            {"v": np.stack([lo, hi], axis=1)},
        )
        with pytest.raises(QueryError):
            run_plan(
                PlanBuilder()
                .table_scan(t)
                .project(["cast(v as decimal(38, 3)) as up"])
                .build()
            )

    def test_long_multiply_overflow_raises(self):
        """128x128 products past int128 raise per-row (reference:
        DecimalUtil.h __builtin_mul_overflow -> VeloxUserError)."""
        from velox_tpu.exec.runner import QueryError

        vals = [2 * 10**21]  # squared = 4e42 > 2^127-1
        hi, lo = np_from_int(vals)
        t = Table(
            RowType(["a"], [decimal(38, 2)]),
            {"a": np.stack([lo, hi], axis=1)},
        )
        with pytest.raises(QueryError):
            run_plan(
                PlanBuilder().table_scan(t).project(["a * a as p"]).build()
            )
        # try() nulls the overflowing row instead
        out = run_plan(
            PlanBuilder().table_scan(t).project(["try(a * a) as p"]).build()
        ).to_pandas()
        assert out["p"].isna().all()

    def test_cast_double_to_long_decimal_exact(self):
        """double -> DECIMAL(38,10) is exact for every representable value
        (reference: DecimalUtil::rescaleDouble).  Guards the limb-split bug
        where lo was computed in float64 and lost the low 11 bits."""
        import math
        from decimal import Decimal, localcontext

        from velox_tpu.exec.runner import QueryError

        xs = [1.5, -2.25, 1e20, 0.0, 123456789.123456789, -2.0**80,
              2.0**26 + 0.5, 1e-11]
        t = Table(RowType(["x"], [vt.DOUBLE]), {"x": np.array(xs)})
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .project(["cast(x as decimal(38,10)) as d"])
            .build()
        ).to_pandas()
        with localcontext() as cx:
            cx.prec = 60
            for x, g in zip(xs, out["d"]):
                raw = int(math.floor(abs(x * 10**10) + 0.5))
                exp = Decimal(raw if x >= 0 else -raw) / Decimal(10**10)
                assert g == exp, (x, g, exp)
        for bad in (float("nan"), float("inf"), 1e38):
            tb = Table(RowType(["x"], [vt.DOUBLE]), {"x": np.array([bad])})
            with pytest.raises(QueryError):
                run_plan(
                    PlanBuilder()
                    .table_scan(tb)
                    .project(["cast(x as decimal(38,2)) as d"])
                    .build()
                )

    def test_unsupported_raises(self):
        t, _ = long_table(100, seed=21)
        with pytest.raises(NotImplementedError, match="long decimal|long-decimal"):
            run_plan(
                PlanBuilder()
                .table_scan(t)
                .aggregation(["g"], ["arbitrary(v) as m"])
                .build()
            )


class TestIO:
    def test_arrow_roundtrip(self):
        t, vals = long_table(400, seed=23, with_group=False)
        back = Table.from_arrow(t.to_arrow())
        assert back.schema.type_of("v").precision == 38
        arr = back.columns["v"]
        assert np_to_int(arr[:, 1], arr[:, 0]) == vals

    def test_parquet_roundtrip(self):
        t, vals = long_table(400, seed=25, with_group=False)
        path = "memory://hugeint/t.parquet"
        t.save_parquet(path)
        back = Table.load_parquet(path)
        arr = back.columns["v"]
        assert np_to_int(arr[:, 1], arr[:, 0]) == vals

    def test_distributed_matches_local(self):
        import jax

        from velox_tpu.parallel.runner import DistributedExecutor, make_mesh

        assert len(jax.devices()) >= 8
        t, vals = long_table(4000, seed=27)
        plan = (
            PlanBuilder()
            .table_scan(t)
            .aggregation(["g"], ["sum(v) as s", "count(v) as c"])
            .build()
        )
        local = run_plan(plan).to_pandas().sort_values("g").reset_index(drop=True)
        dist = (
            DistributedExecutor(plan, make_mesh(8), per_device_rows=1 << 10)
            .run()
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert local["s"].tolist() == dist["s"].tolist()
        assert local["c"].tolist() == dist["c"].tolist()


def test_join_on_long_decimal_key():
    """Long-decimal equi-join keys expand to limb pairs (two-limb packed
    lookup in joins.py handles the wide ranges)."""
    distinct = rand_ints(40, seed=33)
    rng = np.random.default_rng(34)
    picks = rng.integers(0, 40, 3000)
    pv = [distinct[i] for i in picks]
    ph, pl = np_from_int(pv)
    probe = Table(
        RowType(["k", "x"], [D38, vt.BIGINT]),
        {"k": np.stack([pl, ph], axis=1), "x": rng.integers(0, 100, 3000)},
    )
    bh, bl = np_from_int(distinct[:25])  # 25 of 40 keys present
    build = Table(
        RowType(["bk", "y"], [D38, vt.BIGINT]),
        {
            "bk": np.stack([bl, bh], axis=1),
            "y": rng.integers(0, 1000, 25),
        },
    )
    for jt in ("inner", "left", "left_semi", "anti"):
        out = run_plan(
            PlanBuilder()
            .table_scan(probe)
            .hash_join(
                PlanBuilder().table_scan(build).build(),
                ["k"],
                ["bk"],
                output=["x", "y"] if jt in ("inner", "left") else ["x"],
                join_type=jt,
            )
            .build(),
            tile_rows=512,
        ).to_pandas()
        present = set(distinct[:25])
        matched = [v in present for v in pv]
        if jt == "inner":
            assert len(out) == sum(matched)
        elif jt == "left":
            assert len(out) == len(pv)
            assert int(out["y"].isna().sum()) == len(pv) - sum(matched)
        elif jt == "left_semi":
            assert len(out) == sum(matched)
        else:
            assert len(out) == len(pv) - sum(matched)


def test_order_by_long_decimal():
    """ORDER BY a long decimal sorts by (hi, unsigned lo) limb pairs."""
    t, vals = long_table(3000, seed=41, with_group=False)
    for clause, reverse in ((["v"], False), (["v desc"], True)):
        out = run_plan(
            PlanBuilder().table_scan(t).orderby(clause).build(),
            tile_rows=512,
        ).to_pandas()
        expect = sorted(vals, reverse=reverse)
        got = [int(d.scaleb(2, CX)) for d in out["v"]]
        assert got == expect, clause


def test_topn_long_decimal():
    t, vals = long_table(2000, seed=43, with_group=False)
    out = run_plan(
        PlanBuilder().table_scan(t).topn(["v desc"], 7).build(),
        tile_rows=512,
    ).to_pandas()
    got = [int(d.scaleb(2, CX)) for d in out["v"]]
    assert got == sorted(vals, reverse=True)[:7]
