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


def test_operator_name_functions():
    """Spark registers operators as named functions so Gluten/substrait plans
    can call them by name (RegisterArithmetic.cpp, RegisterCompare.cpp)."""
    out = project([
        "add(l, 1) as a", "subtract(l, 1) as s", "unaryminus(l) as um",
        "remainder(l, 5) as r", "equalto(i, 42) as eq",
        "greaterthan(i, 0) as gt", "lessthanorequal(i, 0) as le",
        "isnull(d) as inu", "isnotnull(d) as inn",
    ])
    assert out["a"].tolist() == [1, 43, 0]
    assert out["s"].tolist() == [-1, 41, -2]
    assert out["um"].tolist() == [0, -42, 1]
    # Spark % truncates toward zero: -1 % 5 == -1
    assert out["r"].tolist() == [0, 2, -1]
    assert out["eq"].tolist() == [False, True, False]
    assert out["gt"].tolist() == [False, True, False]
    assert out["le"].tolist() == [True, False, True]
    assert out["inu"].tolist() == [False, False, False]
    assert out["inn"].tolist() == [True, True, True]


def test_equalnullsafe_and_remainder_null():
    st = StringTable()
    t = Table(
        RowType(["a", "b", "z"], [BIGINT, BIGINT, BIGINT]),
        {
            "a": np.array([1, 2, 3], np.int64),
            "b": np.array([1, 5, 4], np.int64),
            "z": np.array([0, 0, 2], np.int64),
        },
        validities={
            "a": np.array([True, False, True]),
            "b": np.array([True, False, False]),
        },
    )
    out = run_plan(
        PlanBuilder().table_scan(t).project([
            "equalnullsafe(a, b) as ens",
            "remainder(a, z) as r",
        ]).build()
    ).to_pandas()
    # <=> : both-NULL is TRUE, one-NULL is FALSE, never NULL
    assert out["ens"].tolist() == [True, True, False]
    # NULL divisor / zero divisor -> NULL
    assert out["r"][0] is None or pd.isna(out["r"][0])
    assert out["r"][1] is None or pd.isna(out["r"][1])
    assert out["r"][2] == 1


def test_spark_date_tail():
    # dt: 1970-01-01 (Thu), 1970-02-01 (Sun), 1970-03-01 (Sun)
    out = project([
        "dayofmonth(dt) as dom", "dayofweek(dt) as dw",
        "dayofyear(dt) as doy", "last_day(dt) as ld",
        "make_date(1970, 3, 1) as md", "make_date(1970, 2, 30) as bad",
    ])
    assert out["dom"].tolist() == [1, 1, 1]
    # Spark: 1=Sunday..7=Saturday; Thursday=5
    assert out["dw"].tolist() == [5, 1, 1]
    assert out["doy"].tolist() == [1, 32, 60]
    # DATE columns surface as day numbers in to_pandas
    assert out["ld"].tolist() == [30, 58, 89]  # Jan 31, Feb 28, Mar 31 1970
    assert out["md"].tolist() == [59] * 3  # 1970-03-01
    assert all(pd.isna(v) for v in out["bad"])


def test_spark_math_tail():
    out = project(["sec(d) as se", "csc(d) as cs", "cot(d) as co"])
    d = np.array([1.5, -2.5, 0.0])
    np.testing.assert_allclose(out["se"], 1 / np.cos(d), rtol=1e-12)
    np.testing.assert_allclose(out["cs"][:2], 1 / np.sin(d[:2]), rtol=1e-12)
    np.testing.assert_allclose(out["co"][:2], np.cos(d[:2]) / np.sin(d[:2]),
                               rtol=1e-12)


def test_spark_string_tail():
    out = project([
        "startswith(s, 'he') as sw", "endswith(s, 'rk') as ew",
        "left(s, 3) as lf", "substring_index(s, 'l', 2) as si",
        "overlay(s, 'XX', 2) as ov", "rlike(s, '^h') as rl",
        "sha2(s, 256) as h2",
    ])
    assert out["sw"].tolist() == [True, False, False]
    assert out["ew"].tolist() == [False, False, True]
    assert out["lf"].tolist() == ["hel", "", "spa"]
    assert out["si"].tolist() == ["hel", "", "spark"]
    assert out["ov"].tolist() == ["hXXlo", "XX", "sXXrk"]
    assert out["rl"].tolist() == [True, False, False]
    import hashlib
    assert out["h2"].tolist() == [
        hashlib.sha256(v.encode()).hexdigest() for v in ["hello", "", "spark"]
    ]


def test_conv_on_column():
    st = StringTable()
    t = Table(
        RowType(["h"], [VARCHAR]),
        {"h": st.intern_all(["ff", "10", "zz"])},
        {"h": st},
    )
    out = run_plan(
        PlanBuilder().table_scan(t).project(
            ["conv(h, 16, 10) as cv", "conv(h, 16, 2) as cb"]
        ).build()
    ).to_pandas()
    assert out["cv"].tolist() == ["255", "16", "0"]
    assert out["cb"].tolist() == ["11111111", "10000", "0"]


def test_get_json_object():
    st = StringTable()
    t = Table(
        RowType(["j"], [VARCHAR]),
        {"j": st.intern_all(['{"a": {"b": 3}}', '{"a": 1}'])},
        {"j": st},
    )
    out = run_plan(
        PlanBuilder().table_scan(t).project(
            ["get_json_object(j, '$.a.b') as v"]
        ).build()
    ).to_pandas()
    assert out["v"][0] == "3"


def test_seeded_hashes_and_rand():
    out = project([
        "hash_with_seed(7, l) as h7", "xxhash64_with_seed(7, l) as x7",
        "rand() as r1", "rand(99) as r2",
    ])
    for row, l in enumerate([0, 42, -1]):
        assert out["h7"][row] == _murmur3_bytes_py(
            int(l).to_bytes(8, "little", signed=True), 7
        )
        assert out["x7"][row] == _xxh64_bytes_py(
            int(l).to_bytes(8, "little", signed=True), 7
        )
    assert all(0.0 <= v < 1.0 for v in out["r1"])
    assert all(0.0 <= v < 1.0 for v in out["r2"])
    assert len(set(out["r2"])) == 3  # distinct per row


def test_map_from_arrays():
    ka, _ = HostSegments.from_pylist([[1, 2], [3]], array(BIGINT))
    va, _ = HostSegments.from_pylist([[10, 20], [30]], array(BIGINT))
    t = Table(
        RowType(["k", "v"], [array(BIGINT), array(BIGINT)]),
        {"k": ka, "v": va},
    )
    out = run_plan(
        PlanBuilder().table_scan(t).project(
            ["map_from_arrays(k, v) as m"]
        ).project(["element_at(m, 2) as e"]).build()
    ).to_pandas()
    assert out["e"][0] == 20
    assert pd.isna(out["e"][1])
