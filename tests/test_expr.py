"""Expression engine tests: parser, typing, eval semantics, casts, errors/TRY.

Mirrors the reference's expression test strategy (velox/expression/tests/
ExprTest.cpp) minus the DuckDB oracle (not available here): semantics are asserted
directly against Presto rules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu import Batch, Column, RowType
from velox_tpu.expr import ExprSet, bind_string_literals, parse_expr
from velox_tpu.dtypes import TypeKind


def make_batch(**cols):
    """cols: name=(np_array, dtype) or (np_array, dtype, validity)."""
    names, types, arrays, validities = [], [], [], []
    for name, spec in cols.items():
        arr, dtype = spec[0], spec[1]
        validity = spec[2] if len(spec) > 2 else None
        names.append(name)
        types.append(dtype)
        arrays.append(np.asarray(arr))
        validities.append(None if validity is None else np.asarray(validity))
    schema = RowType(names, types)
    return schema, Batch.from_numpy(schema, arrays, validities)


def eval_one(sql, schema, batch):
    expr = parse_expr(sql, schema)
    tables = {
        n: batch.column(n).strings
        for n in schema.names
        if batch.column(n).strings is not None
    }
    expr = bind_string_literals(expr, tables)
    [result] = ExprSet([expr]).eval(batch)
    n = int(batch.length)
    values = np.asarray(result.values)[:n]
    validity = None if result.validity is None else np.asarray(result.validity)[:n]
    errors = None if result.errors is None else np.asarray(result.errors)[:n]
    return values, validity, errors, expr


class TestParserTyping:
    schema = RowType(
        ["a", "b", "x", "s", "d"],
        [vt.BIGINT, vt.BIGINT, vt.DOUBLE, vt.VARCHAR, vt.DATE],
    )

    def test_literal_types(self):
        assert parse_expr("1", self.schema).dtype == vt.BIGINT
        assert parse_expr("0.05", self.schema).dtype == vt.decimal(3, 2)
        assert parse_expr("1e2", self.schema).dtype == vt.DOUBLE
        assert parse_expr("'hi'", self.schema).dtype == vt.VARCHAR
        assert parse_expr("date '1994-01-01'", self.schema).dtype == vt.DATE
        assert parse_expr("true", self.schema).dtype == vt.BOOLEAN

    def test_decimal_literal_unscaled(self):
        e = parse_expr("0.05", self.schema)
        assert e.value == 5 and e.dtype.scale == 2

    def test_arith_widening(self):
        assert parse_expr("a + x", self.schema).dtype == vt.DOUBLE
        assert parse_expr("a + 1", self.schema).dtype == vt.BIGINT
        assert parse_expr("a < x", self.schema).dtype == vt.BOOLEAN

    def test_interval(self):
        e = parse_expr("d - interval '90' day", self.schema)
        assert e.dtype == vt.DATE

    def test_case_when(self):
        e = parse_expr("case when a > 1 then 1 else 0 end", self.schema)
        assert e.dtype == vt.BIGINT

    def test_unknown_column_raises(self):
        with pytest.raises(ValueError, match="unknown column"):
            parse_expr("zz + 1", self.schema)


class TestEval:
    def test_arith_and_compare(self):
        schema, batch = make_batch(
            a=([1, 2, 3, 4], vt.BIGINT), b=([10, 20, 30, 40], vt.BIGINT)
        )
        values, validity, errors, _ = eval_one("a * 2 + b", schema, batch)
        np.testing.assert_array_equal(values, [12, 24, 36, 48])
        assert validity is None and errors is None

        values, _, _, _ = eval_one("a between 2 and 3", schema, batch)
        np.testing.assert_array_equal(values, [False, True, True, False])

    def test_null_propagation(self):
        schema, batch = make_batch(
            a=([1, 2, 3], vt.BIGINT, [True, False, True]),
            b=([1, 1, 1], vt.BIGINT),
        )
        values, validity, _, _ = eval_one("a + b", schema, batch)
        np.testing.assert_array_equal(validity, [True, False, True])

    def test_kleene_and_or(self):
        # AND: F dominates NULL; OR: T dominates NULL.
        schema, batch = make_batch(
            p=([True, False, True, False], vt.BOOLEAN, [True, True, False, False]),
            q=([True, True, True, False], vt.BOOLEAN),
        )
        # p AND q: [T, F, NULL(and T), NULL-p but q=F -> F]
        values, validity, _, _ = eval_one("p and q", schema, batch)
        np.testing.assert_array_equal(validity, [True, True, False, True])
        np.testing.assert_array_equal(values[validity], [True, False, False])
        # p OR q: [T, T, T(q true dominates null p), NULL? q=F,p=NULL -> NULL]
        values, validity, _, _ = eval_one("p or q", schema, batch)
        np.testing.assert_array_equal(validity, [True, True, True, False])
        np.testing.assert_array_equal(values[validity], [True, True, True])

    def test_division_errors_and_try(self):
        schema, batch = make_batch(
            a=([10, 20, 30], vt.BIGINT), b=([2, 0, 5], vt.BIGINT)
        )
        values, validity, errors, _ = eval_one("a / b", schema, batch)
        np.testing.assert_array_equal(errors, [False, True, False])
        np.testing.assert_array_equal(values[[0, 2]], [5, 6])

        values, validity, errors, _ = eval_one("try(a / b)", schema, batch)
        assert errors is None
        np.testing.assert_array_equal(validity, [True, False, True])

    def test_double_division_ieee(self):
        schema, batch = make_batch(a=([1.0, -1.0, 0.0], vt.DOUBLE))
        values, validity, errors, _ = eval_one("a / 0e0", schema, batch)
        assert errors is None
        assert np.isinf(values[0]) and np.isinf(values[1]) and np.isnan(values[2])

    def test_decimal_arith(self):
        schema, batch = make_batch(
            price=([10050, 25000], vt.decimal(12, 2)),
            disc=([5, 10], vt.decimal(12, 2)),
        )
        # price * (1 - disc): (1 - 0.05) = 0.95 scale 2; product scale 4
        values, _, _, expr = eval_one("price * (1 - disc)", schema, batch)
        assert expr.dtype.scale == 4
        np.testing.assert_array_equal(values, [100.50 * 0.95 * 10**4, 250.00 * 0.90 * 10**4])

    def test_decimal_compare_mixed_scale(self):
        schema, batch = make_batch(q=([49900, 50000, 50100], vt.decimal(12, 2)))
        values, _, _, _ = eval_one("q < 500", schema, batch)
        np.testing.assert_array_equal(values, [True, False, False])
        values, _, _, _ = eval_one("q between 499.5 and 500.5", schema, batch)
        np.testing.assert_array_equal(values, [False, True, False])

    def test_string_eq_and_in(self):
        schema, batch = make_batch(
            s=(np.asarray(["AIR", "MAIL", "SHIP", "AIR"], dtype=object), vt.VARCHAR)
        )
        values, _, _, _ = eval_one("s = 'AIR'", schema, batch)
        np.testing.assert_array_equal(values, [True, False, False, True])
        values, _, _, _ = eval_one("s in ('AIR', 'SHIP')", schema, batch)
        np.testing.assert_array_equal(values, [True, False, True, True])
        # literal absent from table matches nothing
        values, _, _, _ = eval_one("s = 'TRUCK'", schema, batch)
        np.testing.assert_array_equal(values, [False, False, False, False])

    def test_case_when_masking(self):
        schema, batch = make_batch(a=([1, 2, 3, 4], vt.BIGINT))
        values, _, _, _ = eval_one(
            "case when a < 2 then 10 when a < 4 then 20 else 30 end", schema, batch
        )
        np.testing.assert_array_equal(values, [10, 20, 20, 30])

    def test_if_branch_errors_masked(self):
        schema, batch = make_batch(a=([2, 0, 4], vt.BIGINT))
        # untaken branch's division by zero must not error the row
        values, validity, errors, _ = eval_one(
            "if(a = 0, 0, 100 / a)", schema, batch
        )
        assert errors is None or not errors.any()
        np.testing.assert_array_equal(values, [50, 0, 25])

    def test_coalesce(self):
        schema, batch = make_batch(
            a=([1, 2, 3], vt.BIGINT, [False, True, False]),
            b=([9, 9, 9], vt.BIGINT, [True, True, False]),
        )
        values, validity, _, _ = eval_one("coalesce(a, b)", schema, batch)
        np.testing.assert_array_equal(validity, [True, True, False])
        np.testing.assert_array_equal(values[:2], [9, 2])

    def test_datetime_functions(self):
        import datetime

        dates = [datetime.date(1994, 1, 1), datetime.date(1998, 12, 31), datetime.date(2000, 2, 29)]
        days = [(d - datetime.date(1970, 1, 1)).days for d in dates]
        schema, batch = make_batch(d=(np.asarray(days, dtype=np.int32), vt.DATE))
        for fn, expect in [
            ("year", [d.year for d in dates]),
            ("month", [d.month for d in dates]),
            ("day", [d.day for d in dates]),
            ("day_of_week", [d.isoweekday() for d in dates]),
            ("day_of_year", [d.timetuple().tm_yday for d in dates]),
            ("quarter", [(d.month - 1) // 3 + 1 for d in dates]),
        ]:
            values, _, _, _ = eval_one(f"{fn}(d)", schema, batch)
            np.testing.assert_array_equal(values, expect, err_msg=fn)

    def test_casts(self):
        schema, batch = make_batch(x=([1.6, -1.6, 2.5], vt.DOUBLE))
        values, _, _, _ = eval_one("cast(x as bigint)", schema, batch)
        np.testing.assert_array_equal(values, [2, -2, 2])  # rint: ties to even
        values, _, _, expr = eval_one("cast(x as decimal(10, 1))", schema, batch)
        np.testing.assert_array_equal(values, [16, -16, 25])

    def test_cse_shared_subexpression(self):
        schema, batch = make_batch(a=([1.0, 2.0], vt.DOUBLE))
        expr1 = parse_expr("sqrt(a) + sqrt(a)", schema)
        [r] = ExprSet([expr1]).eval(batch)
        np.testing.assert_allclose(np.asarray(r.values), 2 * np.sqrt([1.0, 2.0]))

    def test_eval_under_jit(self):
        schema, batch = make_batch(
            a=([1, 2, 3, 4], vt.BIGINT), b=([4, 3, 2, 1], vt.BIGINT)
        )
        expr = parse_expr("a * b + 1", schema)

        @jax.jit
        def run(b_):
            [r] = ExprSet([expr]).eval(b_)
            return r.values

        np.testing.assert_array_equal(np.asarray(run(batch)), [5, 7, 7, 5])

    def test_is_null(self):
        schema, batch = make_batch(a=([1, 2], vt.BIGINT, [True, False]))
        values, validity, _, _ = eval_one("a is null", schema, batch)
        assert validity is None
        np.testing.assert_array_equal(values, [False, True])
        values, _, _, _ = eval_one("a is not null", schema, batch)
        np.testing.assert_array_equal(values, [True, False])


class TestDecimalTyping:
    def test_multiply_keeps_raw_scales(self):
        # regression: multiply must NOT align scales first (sum_charge overflow)
        schema = RowType(["ep", "disc", "tax"], [vt.decimal(12, 2)] * 3)
        e = parse_expr("ep * (1 - disc) * (1 + tax)", schema)
        assert e.dtype.scale == 6, e.dtype

    def test_wide_sum_exact_beyond_int32_rows(self):
        import pandas as pd
        from velox_tpu.io.table import Table
        from velox_tpu.plan import PlanBuilder
        from velox_tpu.exec import run_plan

        # values large enough that a naive f64 accumulation would lose the +1s
        n = 1000
        vals = np.full(n, (1 << 53) + 1, dtype=np.int64)
        t = Table(RowType(["v"], [vt.BIGINT]), {"v": vals})
        out = run_plan(
            PlanBuilder().table_scan(t).aggregation([], ["sum(v) as s"]).build(),
            tile_rows=512,
        ).to_pandas()
        assert int(out["s"][0]) == n * ((1 << 53) + 1)  # fits int64, bit-exact


def test_is_distinct_from():
    import numpy as np

    from velox_tpu.dtypes import BIGINT, RowType
    from velox_tpu.exec import run_plan
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder

    t = Table(
        RowType(["a", "b"], [BIGINT, BIGINT]),
        {
            "a": np.array([1, 1, 0, 0], np.int64),
            "b": np.array([1, 2, 0, 0], np.int64),
        },
        validities={
            "a": np.array([1, 1, 0, 0], bool),
            "b": np.array([1, 1, 1, 0], bool),
        },
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(
            [
                "a is distinct from b as d",
                "a is not distinct from b as nd",
            ]
        )
        .build()
    ).to_pandas()
    # rows: (1,1) same; (1,2) differ; (NULL,0) distinct; (NULL,NULL) same
    assert out["d"].tolist() == [False, True, True, False]
    assert out["nd"].tolist() == [True, False, False, True]
