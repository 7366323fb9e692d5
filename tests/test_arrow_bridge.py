"""Arrow C-ABI bridge (io/table.py to_arrow / __arrow_c_stream__ / from_arrow).

Reference analog: velox/vector/arrow/tests/ArrowBridgeTest.cpp — round-trips
through the Arrow ABI for every exportable type, null masks included.
"""

import numpy as np
import pyarrow as pa
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import DATE, DOUBLE, RowType, TIMESTAMP, VARCHAR, decimal
from velox_tpu.io.table import Table
from velox_tpu.vector.string_table import StringTable


def make_table(n=200, seed=5):
    rng = np.random.default_rng(seed)
    names = ["ash", "oak", "fir"]
    st = StringTable()
    codes = st.intern_all(names)
    return Table(
        RowType(
            ["i", "d", "s", "dt", "ts", "m"],
            [vt.BIGINT, DOUBLE, VARCHAR, DATE, TIMESTAMP, decimal(12, 2)],
        ),
        {
            "i": rng.integers(-100, 100, n),
            "d": rng.random(n),
            "s": np.asarray(codes)[rng.integers(0, 3, n)].astype(np.int32),
            "dt": rng.integers(0, 20000, n).astype(np.int32),
            "ts": rng.integers(0, 10**15, n),
            "m": rng.integers(-(10**6), 10**6, n),
        },
        string_tables={"s": st},
        validities={"i": rng.random(n) > 0.1},
    )


def test_roundtrip_through_arrow():
    t = make_table()
    at = t.to_arrow()
    assert at.num_rows == t.num_rows
    back = Table.from_arrow(at)
    for col in ("i", "d", "dt", "ts", "m"):
        np.testing.assert_array_equal(
            np.asarray(back.columns[col]),
            np.asarray(t.columns[col])
            if col != "i"
            else np.where(t.validities["i"], t.columns["i"], 0),
        )
    assert back.schema.type_of("m").scale == 2
    assert back.to_pandas()["s"].tolist() == t.to_pandas()["s"].tolist()
    np.testing.assert_array_equal(
        back.validities["i"], t.validities["i"]
    )


def test_capsule_export():
    """Any PyCapsule-aware consumer ingests a Table directly."""
    t = make_table(50, seed=6)
    at = pa.table(t)  # consumes __arrow_c_stream__
    assert at.num_rows == 50
    assert set(at.schema.names) == set(t.schema.names)


def test_capsule_import():
    """from_arrow accepts any object exposing __arrow_c_stream__."""

    class Shim:
        def __init__(self, inner):
            self._inner = inner

        def __arrow_c_stream__(self, requested_schema=None):
            return self._inner.__arrow_c_stream__(requested_schema)

    src = pa.table({"a": [1, 2, 3], "b": [1.5, None, 2.5]})
    t = Table.from_arrow(Shim(src))
    assert t.num_rows == 3
    np.testing.assert_array_equal(t.columns["a"], [1, 2, 3])
    np.testing.assert_array_equal(t.validities["b"], [True, False, True])


def test_arrow_scan_pipeline():
    """An arrow table feeds a plan through the ArrowStream source."""
    from velox_tpu.exec.runner import run_plan
    from velox_tpu.plan import PlanBuilder

    src = pa.table({"k": pa.array([1, 2, 1, 3] * 50), "v": pa.array(range(200))})
    t = Table.from_arrow(src)
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .aggregation(["k"], ["sum(v) as s"])
        .orderby(["k"])
        .build()
    ).to_pandas()
    import pandas as pd

    df = src.to_pandas()
    expect = df.groupby("k").v.sum().sort_index()
    assert out["s"].tolist() == expect.tolist()
