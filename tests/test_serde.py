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
