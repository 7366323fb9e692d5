"""Complex-type fuzzing: random ARRAY/MAP columns vs a python oracle.

Reference: the nightly expression fuzzer over nested types
(velox/vector/fuzzer/VectorFuzzer.h:81, docs/develop/testing/fuzzer.rst) —
random data, every function checked against an independent host
implementation, repro determinism per seed.
"""

import numpy as np
import pytest

from velox_tpu.dtypes import BIGINT, RowType, array
from velox_tpu.exec import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.vector.complex import HostSegments

AT = array(BIGINT)


def random_arrays(rng, n, null_ratio=0.15, elem_null_ratio=0.1, max_len=6):
    rows = []
    for _ in range(n):
        if rng.random() < null_ratio:
            rows.append(None)
            continue
        size = int(rng.integers(0, max_len + 1))
        rows.append(
            [
                None if rng.random() < elem_null_ratio else int(rng.integers(-5, 20))
                for _ in range(size)
            ]
        )
    return rows


def run_exprs(rows_a, rows_b, xs, exprs):
    a, va = HostSegments.from_pylist(rows_a, AT)
    b, vb = HostSegments.from_pylist(rows_b, AT)
    validities = {}
    if va is not None:
        validities["a"] = va
    if vb is not None:
        validities["b"] = vb
    t = Table(
        RowType(["a", "b", "x"], [AT, AT, BIGINT]),
        {"a": a, "b": b, "x": xs},
        validities=validities,
    )
    return run_plan(
        PlanBuilder().table_scan(t).project(exprs).build(), tile_rows=64
    ).to_pandas()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_complex_fuzz_vs_python(seed):
    rng = np.random.default_rng(seed)
    n = 200
    rows_a = random_arrays(rng, n)
    rows_b = random_arrays(rng, n)
    xs = rng.integers(-3, 3, n)
    out = run_exprs(
        rows_a,
        rows_b,
        xs,
        [
            "cardinality(a) as card",
            "array_sum(a) as asum",
            "element_at(a, x) as eat",
            "transform(a, e -> e + x) as tr",
            "filter(a, e -> e > 4) as fl",
            "concat(a, b) as cc",
            "reverse(a) as rev",
            "contains(a, 7) as has7",
            "zip_with(a, b, (p, q) -> p + q) as zw",
        ],
    )

    def norm(v):
        import pandas as pd

        return None if v is None or (not isinstance(v, list) and pd.isna(v)) else v

    for i in range(n):
        ra, rb, x = rows_a[i], rows_b[i], int(xs[i])
        if ra is None:
            assert norm(out["card"][i]) is None
            continue
        assert out["card"][i] == len(ra)
        assert out["asum"][i] == sum(v for v in ra if v is not None)
        # element_at: 1-based, negative from end, 0/oob -> NULL
        if x == 0 or abs(x) > len(ra):
            expect = None
        else:
            expect = ra[x - 1] if x > 0 else ra[x]
        assert norm(out["eat"][i]) == expect, (i, ra, x)
        assert norm(out["tr"][i]) == [None if v is None else v + x for v in ra]
        assert norm(out["fl"][i]) == [v for v in ra if v is not None and v > 4]
        assert norm(out["rev"][i]) == ra[::-1]
        # contains: TRUE beats NULL beats FALSE-with-null
        if 7 in ra:
            assert out["has7"][i] == True  # noqa: E712
        elif None in ra:
            assert norm(out["has7"][i]) is None
        else:
            assert out["has7"][i] == False  # noqa: E712
        if rb is not None:
            assert norm(out["cc"][i]) == ra + rb
            m = max(len(ra), len(rb))
            expect_zw = [
                None
                if (j >= len(ra) or j >= len(rb) or ra[j] is None or rb[j] is None)
                else ra[j] + rb[j]
                for j in range(m)
            ]
            assert norm(out["zw"][i]) == expect_zw
        else:
            assert norm(out["cc"][i]) is None
            assert norm(out["zw"][i]) is None


@pytest.mark.parametrize("seed", [0, 1])
def test_complex_fuzz_unnest_roundtrip(seed):
    """unnest + array_agg(group by row id) reconstructs the arrays."""
    rng = np.random.default_rng(seed)
    n = 100
    rows = random_arrays(rng, n, null_ratio=0.0, elem_null_ratio=0.0)
    seg, _ = HostSegments.from_pylist(rows, AT)
    t = Table(
        RowType(["rid", "a"], [BIGINT, AT]),
        {"rid": np.arange(n, dtype=np.int64), "a": seg},
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .unnest(["rid"], ["a"])
            .aggregation(["rid"], ["array_agg(a) as back"])
            .build(),
            tile_rows=64,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    got = dict(zip(out["rid"], out["back"]))
    for i, row in enumerate(rows):
        if row:  # empty arrays produce no unnested rows (no group)
            assert got[i] == row
        else:
            assert i not in got
