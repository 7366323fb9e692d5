"""Serde round-trip tests (page + UnsafeRow + CompactRow)."""

import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import RowType
from velox_tpu.io.table import Table
from velox_tpu.serde import (
    decode_compactrow,
    decode_unsaferow,
    deserialize_page,
    encode_compactrow,
    encode_unsaferow,
    serialize_page,
)
from velox_tpu.vector.string_table import StringTable


@pytest.fixture
def table():
    strings = StringTable()
    codes = strings.intern_all(["alpha", "beta", "", "alpha", "delta"])
    return Table(
        RowType(
            ["id", "price", "name", "flag", "ratio"],
            [vt.BIGINT, vt.decimal(12, 2), vt.VARCHAR, vt.BOOLEAN, vt.DOUBLE],
        ),
        {
            "id": np.arange(5, dtype=np.int64),
            "price": np.asarray([100, -250, 0, 99999, 7], dtype=np.int64),
            "name": codes,
            "flag": np.asarray([True, False, True, True, False]),
            "ratio": np.asarray([0.5, -1.25, float("inf"), 0.0, 3.25]),
        },
        {"name": strings},
        {"ratio": np.asarray([True, True, True, False, True])},
    )


def _assert_tables_equal(a: Table, b: Table):
    assert a.schema == b.schema
    pa, pb = a.to_pandas(), b.to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(pa, pb)


def test_page_roundtrip(table):
    for compress in (False, True):
        buf = serialize_page(table, compress=compress)
        back = deserialize_page(buf)
        _assert_tables_equal(table, back)


def test_page_crc_detects_corruption(table):
    buf = bytearray(serialize_page(table))
    buf[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        deserialize_page(bytes(buf))


def test_unsaferow_roundtrip(table):
    rows = encode_unsaferow(table)
    assert len(rows) == table.num_rows
    # UnsafeRow invariants: 8-byte aligned, fixed region is nulls+slots
    for r in rows:
        assert len(r) % 8 == 0
    back = decode_unsaferow(rows, table.schema)
    _assert_tables_equal(table, back)


def test_compactrow_roundtrip_and_density(table):
    urows = encode_unsaferow(table)
    crows = encode_compactrow(table)
    back = decode_compactrow(crows, table.schema)
    _assert_tables_equal(table, back)
    assert sum(map(len, crows)) < sum(map(len, urows))  # compact is denser


def test_vector_saver_roundtrip(tmp_path):
    """Reference: vector/VectorSaver.h — persist exact inputs for repro."""
    import numpy as np

    from velox_tpu.dtypes import BIGINT, RowType, VARCHAR
    from velox_tpu.io.table import Table
    from velox_tpu.vector.saver import load_batch, save_batch
    from velox_tpu.vector.string_table import StringTable

    st = StringTable()
    codes = st.intern_all(["a", "bb", "a", "ccc"])
    t = Table(
        RowType(["s", "x"], [VARCHAR, BIGINT]),
        {"s": codes, "x": np.array([1, 2, 3, 4], np.int64)},
        string_tables={"s": st},
        validities={"x": np.array([True, False, True, True])},
    )
    batch = t.tile(0, 8)
    path = str(tmp_path / "repro" / "batch.vxpg")
    save_batch(batch, path)
    back = load_batch(path)
    bt = back.schema
    assert list(bt.names) == ["s", "x"]
    vals, validity = back.column("x").decode(back.capacity)
    n = int(back.length)
    np.testing.assert_array_equal(np.asarray(vals)[:n], [1, 2, 3, 4])
    np.testing.assert_array_equal(
        np.asarray(validity)[:n], [True, False, True, True]
    )
    s = back.column("s")
    assert s.strings.decode(np.asarray(s.data)[:n]).tolist() == [
        "a", "bb", "a", "ccc",
    ]


def test_page_roundtrip_complex_columns():
    import numpy as np

    from velox_tpu.dtypes import BIGINT, RowType, VARCHAR, array, map_, row
    from velox_tpu.io.table import Table
    from velox_tpu.serde.page import deserialize_page, serialize_page
    from velox_tpu.vector.complex import HostSegments, HostStruct

    at, mt = array(BIGINT), map_(VARCHAR, BIGINT)
    rt = row(["a", "b"], [BIGINT, VARCHAR])
    seg, sv = HostSegments.from_pylist([[1, 2], None, [3, None]], at)
    mseg, _ = HostSegments.from_pylist([{"x": 1}, {}, {"y": 2, "z": 3}], mt)
    st, rv = HostStruct.from_pylist(
        [{"a": 1, "b": "p"}, None, {"a": 3, "b": "q"}], rt
    )
    t = Table(
        RowType(["k", "arr", "m", "r"], [BIGINT, at, mt, rt]),
        {
            "k": np.array([10, 20, 30], np.int64),
            "arr": seg,
            "m": mseg,
            "r": st,
        },
        validities={"arr": sv, "r": rv},
    )
    back = deserialize_page(serialize_page(t))
    assert back.columns["k"].tolist() == [10, 20, 30]
    assert back.columns["arr"].to_pylist(back.validities["arr"]) == [
        [1, 2], None, [3, None]
    ]
    assert back.columns["m"].to_pylist() == [{"x": 1}, {}, {"y": 2, "z": 3}]
    assert back.columns["r"].to_pylist(back.validities["r"]) == [
        {"a": 1, "b": "p"}, None, {"a": 3, "b": "q"}
    ]


# ---------------------------------------------------------------------------
# UnsafeRow GOLDEN BYTES: expected buffers are derived here INDEPENDENTLY of
# the encoder, straight from the documented Spark layout
# (reference: velox/row/UnsafeRowFast.h:23, serializers/UnsafeRowSerializer.cpp;
# Spark UnsafeRowWriter: zeroed 8-byte slots, sub-8-byte values in the LOW
# bytes, var-width as (offset << 32 | size) with 8-byte-aligned payload,
# null bitset of ceil(nfields/64) words, bit f of word f//64).


def test_unsaferow_golden_bigint_varchar_nulldouble():
    strings = StringTable()
    codes = strings.intern_all(["hello"])
    t = Table(
        RowType(["a", "s", "d"], [vt.BIGINT, vt.VARCHAR, vt.DOUBLE]),
        {
            "a": np.asarray([42], dtype=np.int64),
            "s": codes,
            "d": np.asarray([0.0]),
        },
        {"s": strings},
        {"d": np.asarray([False])},
    )
    (row,) = encode_unsaferow(t)
    expected = bytes.fromhex(
        "0400000000000000"  # null bitset: field 2 (d) is null
        "2a00000000000000"  # a = 42
        "0500000020000000"  # s: size=5, offset=32 -> (32<<32)|5, little-endian
        "0000000000000000"  # d: null slot is zeroed
        "68656c6c6f000000"  # "hello" + 3 pad bytes to 8-byte alignment
    )
    assert row == expected
    _assert_tables_equal(decode_unsaferow([row], t.schema), t)


def test_unsaferow_golden_negative_int_zero_padded():
    """Negative sub-8-byte ints occupy the LOW bytes of a ZEROED slot (Spark
    UnsafeRowWriter.write(int): putLong(0) then putInt) — sign-extending to
    8 bytes would be a different buffer than Spark writes."""
    t = Table(
        RowType(["i", "b", "f"], [vt.INTEGER, vt.BOOLEAN, vt.REAL]),
        {
            "i": np.asarray([-7], dtype=np.int32),
            "b": np.asarray([True]),
            "f": np.asarray([1.5], dtype=np.float32),
        },
    )
    (row,) = encode_unsaferow(t)
    expected = bytes.fromhex(
        "0000000000000000"  # no nulls
        "f9ffffff00000000"  # int32 -7: low 4 bytes, HIGH 4 BYTES ZERO
        "0100000000000000"  # boolean true: one byte
        "0000c03f00000000"  # float 1.5 = 0x3FC00000, low 4 bytes
    )
    assert row == expected
    back = decode_unsaferow([row], t.schema)
    assert int(back.columns["i"][0]) == -7
    _assert_tables_equal(back, t)


def test_unsaferow_golden_date_timestamp_smallint():
    import struct as _struct

    t = Table(
        RowType(["dt", "ts", "sh"], [vt.DATE, vt.TIMESTAMP, vt.SMALLINT]),
        {
            "dt": np.asarray([19000], dtype=np.int32),
            "ts": np.asarray([1_600_000_000_000_000], dtype=np.int64),
            "sh": np.asarray([-2], dtype=np.int16),
        },
    )
    (row,) = encode_unsaferow(t)
    expected = (
        b"\x00" * 8  # no nulls
        + b"\x38\x4a\x00\x00" + b"\x00" * 4  # date 19000 days = 0x4A38
        + _struct.pack("<q", 1_600_000_000_000_000)  # timestamp micros
        + b"\xfe\xff" + b"\x00" * 6  # int16 -2, zero-padded
    )
    assert row == expected
    _assert_tables_equal(decode_unsaferow([row], t.schema), t)


def test_unsaferow_stream_framing_big_endian():
    """The wire stream frames each row with a BIG-endian uint32 size
    (UnsafeRowSerializer.cpp:73: folly::Endian::big(size))."""
    from velox_tpu.serde import (
        deserialize_unsaferow_stream,
        serialize_unsaferow_stream,
    )

    t = Table(
        RowType(["a"], [vt.BIGINT]),
        {"a": np.asarray([1, 2], dtype=np.int64)},
    )
    data = serialize_unsaferow_stream(t)
    # each row: 8B null bitset + 8B slot = 16 bytes; frame = 00 00 00 10
    assert data[:4] == b"\x00\x00\x00\x10"
    assert len(data) == 2 * (4 + 16)
    assert data[20:24] == b"\x00\x00\x00\x10"
    _assert_tables_equal(deserialize_unsaferow_stream(data, t.schema), t)


def test_unsaferow_nan_canonicalized():
    """Spark canonicalizes NaN payloads before writing; any NaN input must
    produce the single canonical bit pattern."""
    import struct as _struct

    t = Table(
        RowType(["d"], [vt.DOUBLE]),
        {"d": np.frombuffer(_struct.pack("<Q", 0x7FF8000000000001), np.float64)},
    )
    (row,) = encode_unsaferow(t)
    assert row[8:16] == _struct.pack("<d", float("nan"))
