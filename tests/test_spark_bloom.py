"""Spark bloom_filter_agg / might_contain (utils/spark_bloom.py +
exec/sketch.py _rewrite_bloom).

Reference: velox/common/base/BloomFilter.h (blocked bloom wire format),
velox/functions/sparksql/aggregates/BloomFilterAggAggregate.cpp,
velox/functions/sparksql/MightContain.h, tests
BloomFilterAggAggregateTest.cpp / MightContainTest.cpp.
"""

import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import RowType
from velox_tpu.exec.runner import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.utils.spark_bloom import (
    build_host,
    deserialize,
    might_contain_host,
    num_words,
    serialize,
    twang_mix64_np,
)


def scan(**arrays):
    names = list(arrays)
    t = Table(
        RowType(names, [vt.BIGINT] * len(names)),
        {n: np.asarray(v, np.int64) for n, v in arrays.items()},
    )
    return PlanBuilder().table_scan(t)


class TestFormat:
    def test_serialize_roundtrip(self):
        words = np.arange(8, dtype=np.uint64) * np.uint64(0x123456789)
        data = serialize(words)
        assert data[0] == 1  # version
        np.testing.assert_array_equal(deserialize(data), words)

    def test_twang_mix64_matches_scalar_reference(self):
        # vectorized np path vs an independent python-int transcription of
        # folly's twang_mix64 (the hash the reference's BloomFilterAgg uses)
        M = (1 << 64) - 1

        def twang(key):
            key = ((~key) + (key << 21)) & M
            key ^= key >> 24
            key = (key + (key << 3) + (key << 8)) & M
            key ^= key >> 14
            key = (key + (key << 2) + (key << 4)) & M
            key ^= key >> 28
            key = (key + (key << 31)) & M
            return key

        vals = np.array([0, 1, -1, 123456789, 2**62], dtype=np.int64)
        exp = [twang(int(np.uint64(v))) for v in vals]
        assert twang_mix64_np(vals).tolist() == exp

    def test_num_words_default(self):
        # default numBits 8388608 capped at 4194304 -> capacity 262144
        # -> words = nextPow2(262144)/4 = 65536
        assert num_words(8_388_608) == 65536
        assert num_words(64) == 4  # floor

    def test_host_build_probe(self):
        vals = np.arange(0, 100000, 7, dtype=np.int64)
        data = build_host(vals, num_bits=1 << 20)
        hits = might_contain_host(data, vals)
        assert hits.all(), "no false negatives ever"
        misses = might_contain_host(
            data, np.arange(1, 100000, 7919, dtype=np.int64)
        )
        # false-positive rate ~2% at 16 bits/value; allow generous slack
        assert misses.mean() < 0.25


class TestAgg:
    def test_agg_matches_host_oracle(self):
        vals = np.array([10, 20, 30, 12345678901234], np.int64)
        out = run_plan(
            scan(x=vals)
            .aggregation([], ["bloom_filter_agg(x) as bf"])
            .build()
        )
        assert out.columns["bf"][0] == build_host(vals)

    def test_agg_size_args(self):
        vals = np.arange(100, dtype=np.int64)
        out = run_plan(
            scan(x=vals)
            .aggregation([], ["bloom_filter_agg(x, 100, 4096) as bf"])
            .build()
        )
        data = out.columns["bf"][0]
        assert len(deserialize(data)) == num_words(4096)
        assert data == build_host(vals, num_bits=4096)

    def test_agg_grouped(self):
        g = np.array([0, 1, 0, 1, 0], np.int64)
        x = np.array([1, 2, 3, 4, 5], np.int64)
        out = run_plan(
            scan(g=g, x=x)
            .aggregation(["g"], ["bloom_filter_agg(x, 10, 1024) as bf"])
            .build()
        ).to_pandas()
        out = out.sort_values("g").reset_index(drop=True)
        assert out["bf"][0] == build_host(x[g == 0], num_bits=1024)
        assert out["bf"][1] == build_host(x[g == 1], num_bits=1024)

    def test_agg_mixed_node(self):
        vals = np.arange(50, dtype=np.int64)
        out = run_plan(
            scan(x=vals)
            .aggregation(
                [], ["bloom_filter_agg(x, 10, 1024) as bf", "count(*) as c"]
            )
            .build()
        ).to_pandas()
        assert int(out["c"][0]) == 50
        assert out["bf"][0] == build_host(vals, num_bits=1024)

    def test_agg_skips_nulls(self):
        t = Table(
            RowType(["x"], [vt.BIGINT]),
            {"x": np.array([1, 2, 3], np.int64)},
            validities={"x": np.array([True, False, True])},
        )
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation([], ["bloom_filter_agg(x, 10, 1024) as bf"])
            .build()
        )
        assert out.columns["bf"][0] == build_host(
            np.array([1, 3], np.int64), num_bits=1024
        )


    def test_all_null_group_yields_null_filter(self):
        # reference BloomFilterAggAggregateTest.nullBloomFilter: groups whose
        # x values are all NULL still appear, with a NULL serialized filter
        t = Table(
            RowType(["g", "x"], [vt.BIGINT, vt.BIGINT]),
            {
                "g": np.array([1, 1, 2, 2], np.int64),
                "x": np.array([7, 8, 0, 0], np.int64),
            },
            validities={"x": np.array([True, True, False, False])},
        )
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(["g"], ["bloom_filter_agg(x, 10, 1024) as bf"])
            .orderby(["g"])
            .build()
        )
        df = out.to_pandas()
        assert len(df) == 2
        assert df["bf"][0] == build_host(np.array([7, 8], np.int64), num_bits=1024)
        assert df["bf"][1] is None or (df["bf"].isna()[1])

    def test_empty_input_yields_null_filter(self):
        # reference BloomFilterAggAggregateTest.emptyInput: a global agg over
        # zero rows emits one row with a NULL filter
        t = Table(
            RowType(["x"], [vt.BIGINT]),
            {"x": np.array([1, 2, 3], np.int64)},
        )
        out = run_plan(
            PlanBuilder()
            .table_scan(t, filter="x > 100")
            .aggregation([], ["bloom_filter_agg(x, 10, 1024) as bf"])
            .build()
        )
        df = out.to_pandas()
        assert len(df) == 1
        assert df["bf"].isna().all()


class TestMightContain:
    def test_probe_literal(self):
        vals = np.array([10, 20, 30], np.int64)
        data = build_host(vals, num_bits=1024)
        lit = data.hex()
        out = run_plan(
            scan(y=[10, 11, 30, 999])
            .project([f"might_contain(X'{lit}', y) as m"])
            .build()
        ).to_pandas()
        assert (
            out["m"].tolist()
            == might_contain_host(data, np.array([10, 11, 30, 999])).tolist()
        )
        assert out["m"].tolist()[0] and out["m"].tolist()[2]

    def test_probe_agg_roundtrip(self):
        """The aggregate's output probes correctly through might_contain."""
        build_vals = np.arange(0, 1000, 3, dtype=np.int64)
        bf = run_plan(
            scan(x=build_vals)
            .aggregation([], ["bloom_filter_agg(x) as bf"])
            .build()
        ).columns["bf"][0]
        probe = np.arange(0, 1000, dtype=np.int64)
        out = run_plan(
            scan(y=probe)
            .project([f"might_contain(X'{bf.hex()}', y) as m"])
            .build()
        ).to_pandas()
        got = np.asarray(out["m"].tolist())
        assert got[::3].all(), "no false negatives"

    def test_null_filter_probes_null(self):
        # reference MightContainTest.nullBloomFilter: a NULL filter argument
        # gets default-null semantics (NULL out), unlike an EMPTY filter
        # (isSet() ?: false -> constant false)
        out = run_plan(
            scan(y=[1, 2])
            .project(["might_contain(cast(null as varbinary), y) as m"])
            .build()
        ).to_pandas()
        assert out["m"].isna().all()


def test_varbinary_hex_literal_parses():
    from velox_tpu.dtypes import TypeKind
    from velox_tpu.expr.parser import parse_expr

    e = parse_expr("X'AB12'", RowType([], []))
    assert e.dtype.kind == TypeKind.VARBINARY
    assert e.value == bytes.fromhex("AB12")
