"""Spark-semantic function package.

Reference: velox/functions/sparksql/ tests.  The device murmur3/xxhash64
implementations are cross-validated against an independent byte-wise host
implementation of the same algorithms (Spark hashes an int as one 4-byte LE
block and a long as two, so the byte path must agree exactly).
"""

import numpy as np
import pandas as pd

from velox_tpu.dtypes import BIGINT, DATE, DOUBLE, INTEGER, RowType, VARCHAR, array
from velox_tpu.exec import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.vector.complex import HostSegments
from velox_tpu.vector.string_table import StringTable
from velox_tpu.functions.spark.scalar import _murmur3_bytes_py, _xxh64_bytes_py


def make():
    st = StringTable()
    return Table(
        RowType(["i", "l", "d", "s", "dt"], [INTEGER, BIGINT, DOUBLE, VARCHAR, DATE]),
        {
            "i": np.array([0, 42, -7], np.int32),
            "l": np.array([0, 42, -1], np.int64),
            "d": np.array([1.5, -2.5, 0.0]),
            "s": st.intern_all(["hello", "", "spark"]),
            "dt": np.array([0, 31, 59], np.int32),  # 1970-01-01, -02-01, -03-01
        },
        {"s": st},
    )


def project(exprs):
    return run_plan(
        PlanBuilder().table_scan(make()).project(exprs).build()
    ).to_pandas()


def test_hash_matches_byte_reference():
    out = project(["hash(i) as hi", "hash(l) as hl", "xxhash64(l) as xl",
                   "hash(s) as hs", "xxhash64(s) as xs"])
    for row, (i, l, s) in enumerate(
        zip([0, 42, -7], [0, 42, -1], ["hello", "", "spark"])
    ):
        assert out["hi"][row] == _murmur3_bytes_py(
            int(i).to_bytes(4, "little", signed=True), 42
        )
        assert out["hl"][row] == _murmur3_bytes_py(
            int(l).to_bytes(8, "little", signed=True), 42
        )
        assert out["xl"][row] == _xxh64_bytes_py(
            int(l).to_bytes(8, "little", signed=True), 42
        )
        assert out["hs"][row] == _murmur3_bytes_py(s.encode(), 42)
        assert out["xs"][row] == _xxh64_bytes_py(s.encode(), 42)


def test_hash_multi_column_chains_seed():
    out = project(["hash(i, l) as h"])
    # chained: second column hashed with the first column's hash as seed
    for row, (i, l) in enumerate(zip([0, 42, -7], [0, 42, -1])):
        h1 = _murmur3_bytes_py(int(i).to_bytes(4, "little", signed=True), 42)
        h2 = _murmur3_bytes_py(
            int(l).to_bytes(8, "little", signed=True), h1 & 0xFFFFFFFF
        )
        assert out["h"][row] == h2


def test_pmod_and_conditionals():
    out = project(
        [
            "pmod(-7, 3) as pm",
            "pmod(i, 0) as pz",
            "nanvl(d / 0.0, 99.0) as nv",
            "nvl(i, 5) as n1",
        ]
    )
    assert out["pm"].tolist() == [2, 2, 2]
    assert out["pz"].tolist() == [None, None, None]
    # 1.5/0 = inf (not nan), -2.5/0 = -inf, 0/0 = nan -> 99
    assert out["nv"].tolist()[2] == 99.0
    assert out["n1"].tolist() == [0, 42, -7]


def test_spark_dates():
    out = project(
        [
            "date_add(dt, 10) as da",
            "date_sub(dt, 1) as ds",
            "datediff(dt, date '1970-01-01') as dd",
            "add_months(date '1970-01-31', 1) as am",
            "months_between(date '1970-03-01', date '1970-01-01') as mb",
            "unix_date(dt) as ud",
        ]
    )
    assert out["da"].tolist() == [10, 41, 69]
    assert out["dd"].tolist() == [0, 31, 59]
    # Jan 31 + 1 month -> Feb 28 (day clamped to month length)
    assert out["am"].tolist() == [31 + 27] * 3
    assert out["mb"].tolist() == [2.0] * 3
    assert out["ud"].tolist() == [0, 31, 59]


def test_spark_strings():
    out = project(
        [
            "ascii(s) as a",
            "instr(s, 'l') as i1",
            "translate(s, 'lo', '01') as tr",
            "levenshtein(s, 'hello') as lv",
            "crc32(s) as crc",
            "soundex(s) as sx",
        ]
    )
    assert out["a"].tolist() == [ord("h"), -1, ord("s")]
    assert out["i1"].tolist() == [3, 0, 0]
    assert out["tr"].tolist() == ["he001", "", "spark"]
    assert out["lv"].tolist() == [0, 5, 5]
    import zlib

    assert out["crc"].tolist() == [
        zlib.crc32(b"hello"), zlib.crc32(b""), zlib.crc32(b"spark")
    ]
    assert out["sx"].tolist() == ["H400", "", "S162"]


def test_spark_size_and_array_aliases():
    at = array(BIGINT)
    seg, validity = HostSegments.from_pylist([[3, 1, 2], None, []], at)
    t = Table(
        RowType(["a"], [at]), {"a": seg},
        validities={} if validity is None else {"a": validity},
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(
            [
                "size(a) as n",
                "array_contains(a, 2) as c",
                "sort_array(a) as sa",
            ]
        )
        .build()
    ).to_pandas()
    assert out["n"].tolist() == [3, -1, 0]
    assert out["c"].tolist() == [True, None, False]
    assert out["sa"].tolist()[0] == [1, 2, 3]


def test_spark_aggregate_aliases():
    t = Table(
        RowType(["g", "x"], [BIGINT, BIGINT]),
        {
            "g": np.array([1, 1, 2], np.int64),
            "x": np.array([5, 3, 9], np.int64),
        },
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(
                ["g"],
                ["first(x) as f", "collect_list(x) as cl"],
            )
            .build()
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["f"].tolist() == [3, 9]  # deterministic arbitrary = smallest
    assert sorted(out["cl"][0]) == [3, 5]

    out2 = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(["g"], ["skewness(x) as sk", "kurtosis(x) as ku"])
            .build()
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # group 1: x = [5, 3] -> m3 = 0 -> skewness 0; single-row group -> NULL
    assert out2["sk"][0] == 0.0
    assert pd.isna(out2["sk"][1])
    assert pd.isna(out2["ku"][1])


def test_math_extras():
    out = project(
        [
            "hypot(3.0, 4.0) as h",
            "log1p(0.0) as l1",
            "expm1(0.0) as e1",
            "rint(2.5) as r",
            "shiftleft(i, 1) as sl",
            "shiftright(l, 1) as sr",
        ]
    )
    assert out["h"].tolist() == [5.0] * 3
    assert out["l1"].tolist() == [0.0] * 3
    assert out["e1"].tolist() == [0.0] * 3
    assert out["r"].tolist() == [2.0] * 3
    assert out["sl"].tolist() == [0, 84, -14]
    assert out["sr"].tolist() == [0, 21, -1]
