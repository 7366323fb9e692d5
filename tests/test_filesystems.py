"""FileSystem registry (io/filesystems.py).

Reference analog: velox/common/file/tests/FileSystemsTest.cpp — scheme
registration, local + in-memory filesystems, and gated remote adapters.
"""

import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import RowType, VARCHAR
from velox_tpu.io.filesystems import (
    FileSystem,
    MemoryFileSystem,
    filesystem_for,
    register_filesystem,
)
from velox_tpu.io.table import Table
from velox_tpu.vector.string_table import StringTable


def make_table(n=500, seed=1):
    rng = np.random.default_rng(seed)
    names = ["red", "green", "blue"]
    tab = StringTable()
    codes = tab.intern_all(names)
    return Table(
        RowType(["k", "v", "c"], [vt.BIGINT, vt.BIGINT, VARCHAR]),
        {
            "k": rng.integers(0, 10, n),
            "v": rng.integers(0, 100, n),
            "c": np.asarray(codes)[rng.integers(0, 3, n)].astype(np.int32),
        },
        string_tables={"c": tab},
    )


def test_memory_parquet_roundtrip():
    t = make_table()
    path = "memory://datasets/t1.parquet"
    t.save_parquet(path)
    back = Table.load_parquet(path)
    assert back.num_rows == t.num_rows
    np.testing.assert_array_equal(back.columns["v"], t.columns["v"])
    assert back.to_pandas()["c"].tolist() == t.to_pandas()["c"].tolist()


def test_hive_dataset_on_memory_fs():
    from velox_tpu.connectors.hive import read_table, write_table

    t = make_table(300, seed=2)
    root = "memory://warehouse/tbl"
    written = write_table(root, t, partition_by=["c"])
    assert all(p.startswith("memory://") for p in written)
    back = read_table(root)
    assert back.num_rows == t.num_rows
    # partition column round-trips as a synthesized constant column
    got = sorted(back.to_pandas()["c"].tolist())
    assert got == sorted(t.to_pandas()["c"].tolist())


def test_gated_remote_schemes():
    for scheme in ("s3", "hdfs", "gs", "abfs"):
        fs, local = filesystem_for(f"{scheme}://bucket/key")
        with pytest.raises(NotImplementedError, match="no network egress"):
            fs.open_input(local)


def test_unknown_scheme():
    with pytest.raises(ValueError, match="no filesystem registered"):
        filesystem_for("ftp://host/x")


def test_custom_scheme_registration():
    class Upper(MemoryFileSystem):
        pass

    register_filesystem("testfs", Upper)
    fs, local = filesystem_for("testfs://a/b")
    assert isinstance(fs, Upper)
    with fs.open_output(local) as f:
        f.write(b"hello")
    assert fs.open_input(local).read() == b"hello"


def test_local_roundtrip(tmp_path):
    t = make_table(100, seed=3)
    p = str(tmp_path / "x.parquet")
    t.save_parquet(p)
    back = Table.load_parquet(p)
    assert back.num_rows == 100


def test_orc_roundtrip(tmp_path):
    """ORC read/write (reference: dwio/dwrf + dwio/orc) via the Arrow
    exporter; dictionary strings and decimals survive."""
    from velox_tpu.dtypes import decimal

    t = make_table(300, seed=7)
    p = str(tmp_path / "x.orc")
    t.save_orc(p)
    back = Table.load_orc(p)
    assert back.num_rows == 300
    np.testing.assert_array_equal(
        np.asarray(back.columns["v"]), np.asarray(t.columns["v"])
    )
    assert back.to_pandas()["c"].tolist() == t.to_pandas()["c"].tolist()
    pruned = Table.load_orc(p, columns=["k"])
    assert list(pruned.schema.names) == ["k"]


def test_hive_dataset_with_orc_files(tmp_path):
    from velox_tpu.connectors.hive import read_table

    t = make_table(200, seed=8)
    root = str(tmp_path / "tbl")
    import os

    os.makedirs(root)
    t.save_orc(os.path.join(root, "part-0.orc"))
    back = read_table(root)
    assert back.num_rows == 200
