"""Fuzz tests (reference: ExpressionFuzzer / fuzzer.rst).

Two invariants, mirroring the reference's expression-fuzzer oracle:
1. encoding equivalence — evaluating over dictionary/constant-encoded inputs
   must equal evaluating over their flattened copies;
2. engine-vs-numpy equivalence for arithmetic over random data.
"""

import dataclasses

import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu import Batch, RowType
from velox_tpu.expr import ExprSet, parse_expr
from velox_tpu.vector.fuzzer import FuzzerOptions, VectorFuzzer

EXPRS = [
    "c0 + c1",
    "c0 * 2 - c1",
    "c0 < c1",
    "c0 = c1 or c0 > 100",
    "if(c0 < c1, c0, c1)",
    "coalesce(c0, c1)",
    "try(c0 / c1)",
    "c0 is null",
    "case when c0 < 0 then 0 - c0 else c0 end",
    "abs(c0) + abs(c1)",
]


def _eval(expr, batch):
    [r] = ExprSet([expr]).eval(batch)
    n = int(batch.length)
    values = np.asarray(r.values)[:n]
    validity = (
        np.ones(n, dtype=bool) if r.validity is None else np.asarray(r.validity)[:n]
    )
    errors = np.zeros(n, bool) if r.errors is None else np.asarray(r.errors)[:n]
    return values, validity, errors


@pytest.mark.parametrize("seed", range(8))
def test_encodings_equivalence(seed):
    """Common path over encoded inputs == flat path (reference fuzzer oracle)."""
    fz = VectorFuzzer(seed)
    schema = RowType(["c0", "c1"], [vt.BIGINT, vt.BIGINT])
    cap = 64
    batch = fz.batch(schema, cap)
    flat = Batch.make(
        schema,
        [fz.flat_copy(c, cap) for c in batch.columns],
        batch.length,
        capacity=cap,
    )
    for sql in EXPRS:
        expr = parse_expr(sql, schema)
        v1, valid1, err1 = _eval(expr, batch)
        v2, valid2, err2 = _eval(expr, flat)
        np.testing.assert_array_equal(valid1, valid2, err_msg=sql)
        np.testing.assert_array_equal(err1, err2, err_msg=sql)
        keep = valid1 & ~err1
        np.testing.assert_array_equal(v1[keep], v2[keep], err_msg=sql)


@pytest.mark.parametrize("seed", range(4))
def test_arith_vs_numpy(seed):
    fz = VectorFuzzer(seed, FuzzerOptions(null_ratio=0.0, dictionary_ratio=0.0, constant_ratio=0.0))
    schema = RowType(["c0", "c1"], [vt.BIGINT, vt.BIGINT])
    cap = 128
    batch = fz.batch(schema, cap, length=cap)
    a = np.asarray(batch.columns[0].data)
    b = np.asarray(batch.columns[1].data)
    cases = {
        "c0 + c1": a + b,
        "c0 - c1": a - b,
        "c0 * 2": a * 2,
        "c0 < c1": a < b,
        "greatest(c0, c1)": np.maximum(a, b),
        "least(c0, c1)": np.minimum(a, b),
    }
    for sql, expect in cases.items():
        expr = parse_expr(sql, schema)
        values, _, _ = _eval(expr, batch)
        np.testing.assert_array_equal(values, expect, err_msg=sql)


@pytest.mark.parametrize("seed", range(4))
def test_grouped_agg_fuzz_vs_pandas(seed):
    """Random grouped aggregation == pandas groupby on the same data
    (reference: AggregationFuzzer, exec/tests/utils/AggregationFuzzer.cpp)."""
    import pandas as pd

    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan

    rng = np.random.default_rng(seed)
    n = 500
    keys = rng.integers(0, 20, n)
    vals = rng.integers(-1000, 1000, n)
    t = Table(
        RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
        {"k": keys, "v": vals},
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(["k"], ["sum(v) as s", "min(v) as lo", "max(v) as hi", "count(*) as n"])
        .orderby(["k"])
        .build()
    )
    got = run_plan(plan, tile_rows=128).to_pandas()
    expect = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k")
        .agg(s=("v", "sum"), lo=("v", "min"), hi=("v", "max"), n=("v", "count"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


@pytest.mark.parametrize("seed", range(3))
def test_tiling_invariance_fuzz(seed):
    """Results must be identical for any tile size (exact accumulators)."""
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan
    import pandas as pd

    rng = np.random.default_rng(100 + seed)
    n = 700
    t = Table(
        RowType(["k", "v"], [vt.BIGINT, vt.decimal(12, 2)]),
        {"k": rng.integers(0, 50, n), "v": rng.integers(-10**6, 10**6, n)},
    )
    plan = (
        PlanBuilder().table_scan(t)
        .aggregation(["k"], ["sum(v) as s", "avg(v) as m"]).orderby(["k"]).build()
    )
    small = run_plan(plan, tile_rows=64).to_pandas()
    big = run_plan(plan, tile_rows=1 << 12).to_pandas()
    pd.testing.assert_frame_equal(small, big)


MORE_EXPRS = [
    "bitwise_and(c0, c1)",
    "bitwise_xor(c0, 255) + bit_count(c1)",
    "try(c0 % c1)",
    "case when c0 > c1 then c0 - c1 when c0 < c1 then c1 - c0 else 0 end",
    "coalesce(nullif(c0, c1), c1, 0)",
    "c0 between c1 - 5 and c1 + 5",
    "if(c0 is null, -1, c0)",
    "cast(c0 as double) / 3e0",
    "sign(c0) * least(abs(c0), abs(c1))",
]


@pytest.mark.parametrize("seed", range(6))
def test_more_encodings_equivalence(seed):
    """Extended function surface over the encoding matrix (reference:
    ExpressionFuzzer's common-vs-simplified oracle)."""
    fz = VectorFuzzer(100 + seed)
    schema = RowType(["c0", "c1"], [vt.BIGINT, vt.BIGINT])
    cap = 128
    batch = fz.batch(schema, cap)
    flat = Batch.make(
        schema,
        [fz.flat_copy(c, cap) for c in batch.columns],
        batch.length,
        capacity=cap,
    )
    for sql in MORE_EXPRS:
        expr = parse_expr(sql, schema)
        v1, valid1, err1 = _eval(expr, batch)
        v2, valid2, err2 = _eval(expr, flat)
        np.testing.assert_array_equal(valid1, valid2, err_msg=sql)
        np.testing.assert_array_equal(err1, err2, err_msg=sql)
        keep = valid1 & ~err1
        np.testing.assert_array_equal(v1[keep], v2[keep], err_msg=sql)


@pytest.mark.parametrize("seed", range(3))
def test_tiling_never_changes_query_results(seed):
    """Random filter+project+agg plans: results identical across tile sizes
    (the engine-level invariant the reference enforces via batch-size fuzz)."""
    import pandas as pd

    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan

    rng = np.random.default_rng(40 + seed)
    n = 3000
    t = Table(
        RowType(["a", "b", "g"], [vt.BIGINT, vt.BIGINT, vt.BIGINT]),
        {
            "a": rng.integers(-100, 100, n),
            "b": rng.integers(1, 50, n),
            "g": rng.integers(0, 321, n),
        },
    )
    filters = ["a > 0", "a % b = 0", "a + b < 60", "bitwise_and(a, 1) = 1"]
    plan = (
        PlanBuilder()
        .table_scan(t, filter=filters[seed % len(filters)])
        .project(["g", "a * b as ab", "a - b as amb"])
        .aggregation(
            ["g"], ["sum(ab) as s", "min(amb) as lo", "count(*) as c"]
        )
        .orderby(["g"])
        .build()
    )
    base = run_plan(plan, tile_rows=1 << 12).to_pandas()
    for tile in (256, 1024):
        out = run_plan(plan, tile_rows=tile).to_pandas()
        pd.testing.assert_frame_equal(base, out)
