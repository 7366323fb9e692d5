"""Native C++ runtime kernels: interning + integer codec (velox_tpu/native).

The native path must agree bit-for-bit with the pure-Python fallbacks, and the
page serde must round-trip through whichever path is active.
"""

import numpy as np
import pytest

from velox_tpu import native
from velox_tpu.dtypes import BIGINT, DATE, RowType, VARCHAR, decimal
from velox_tpu.io.table import Table
from velox_tpu.serde.page import deserialize_page, serialize_page


def test_native_builds():
    # the environment ships g++; the native library must actually build here
    assert native.available()


@pytest.mark.parametrize("delta", [False, True])
def test_i64_codec_roundtrip(delta):
    rng = np.random.default_rng(7)
    cases = [
        np.zeros(100, dtype=np.int64),
        np.arange(1000, dtype=np.int64),
        rng.integers(-(2**62), 2**62, 257),
        np.repeat(rng.integers(0, 50, 40), rng.integers(1, 9, 40)),
        np.array([], dtype=np.int64),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max]),
    ]
    for arr in cases:
        arr = arr.astype(np.int64)
        blob = native.encode_i64(arr, delta=delta)
        out = native.decode_i64(blob, len(arr), delta=delta)
        np.testing.assert_array_equal(out, arr)
        # python fallback agrees with the native stream both ways
        py_blob = native._py_encode_i64(arr.copy(), delta)
        assert py_blob == blob
        np.testing.assert_array_equal(
            native._py_decode_i64(blob, len(arr), delta), arr
        )


def test_intern_strings_matches_python():
    values = ["apple", "", "pear", "apple", "fig", "pear", "apple", "日本語"]
    blob = "".join(values).encode("utf-8")
    offsets = np.cumsum([0] + [len(v.encode("utf-8")) for v in values]).astype(np.int64)
    result = native.intern_strings(np.frombuffer(blob, np.uint8), offsets)
    assert result is not None
    codes, uniq = result
    # decode through the dictionary and compare
    raw = blob
    decoded = []
    dict_values = [""]
    for row in uniq[1:]:
        dict_values.append(raw[offsets[row] : offsets[row + 1]].decode("utf-8"))
    for c in codes:
        decoded.append(dict_values[c])
    assert decoded == values
    assert codes[0] == codes[3] == codes[6]  # same string, same code
    assert codes[1] == 0  # '' is the canonical entry 0


def test_page_roundtrip_with_rle_columns():
    n = 500
    rng = np.random.default_rng(0)
    table = Table(
        RowType(["k", "d", "s", "dec"], [BIGINT, DATE, VARCHAR, decimal(12, 2)]),
        {
            "k": np.arange(n, dtype=np.int64),  # delta-friendly
            "d": np.repeat(np.int32(8000), n),  # RLE-friendly
            "s": rng.integers(0, 3, n).astype(np.int32),
            "dec": rng.integers(-(10**9), 10**9, n),
        },
        string_tables={
            "s": __import__(
                "velox_tpu.vector.string_table", fromlist=["StringTable"]
            ).StringTable(["a", "bb", "ccc"])
        },
        validities={"dec": rng.random(n) > 0.1},
    )
    buf = serialize_page(table)
    out = deserialize_page(buf)
    for col in table.schema.names:
        np.testing.assert_array_equal(out.columns[col], table.columns[col])
    np.testing.assert_array_equal(out.validities["dec"], table.validities["dec"])
    assert out.string_tables["s"].decode(out.columns["s"]).tolist() == (
        table.string_tables["s"].decode(table.columns["s"]).tolist()
    )


def test_parquet_plain_string_ingest(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "plain.parquet")
    pq.write_table(
        pa.table({"name": ["x", "y", "x", "", "zzz"], "v": [1, 2, 3, 4, 5]}),
        path,
    )
    t = Table.load_parquet(path)
    assert t.string_tables["name"].decode(t.columns["name"]).tolist() == [
        "x", "y", "x", "", "zzz",
    ]
    np.testing.assert_array_equal(t.columns["v"], [1, 2, 3, 4, 5])
