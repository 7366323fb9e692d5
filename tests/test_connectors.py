"""Connector API + Hive dataset round trips.

Reference coverage model: velox/connectors/hive/tests + TableWriteTest —
write partitioned data, scan it back with pruning, diff row-exactly.
"""

import os

import numpy as np
import pandas as pd
import pytest

import velox_tpu.dtypes as vt
from velox_tpu.connectors.base import ConnectorSplit, get_connector
from velox_tpu.connectors.hive import (
    HiveDataSource,
    _discover,
    read_table,
    write_table,
)
from velox_tpu.exec import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.vector.string_table import StringTable


def sample_table(n=200, seed=0):
    rng = np.random.default_rng(seed)
    st = StringTable()
    regions = ["asia", "europe", "americas"]
    codes = st.intern_all([regions[i % 3] for i in range(n)])
    return Table(
        vt.RowType(
            ["id", "v", "region"], [vt.BIGINT, vt.DOUBLE, vt.VARCHAR]
        ),
        {
            "id": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
            "region": codes,
        },
        string_tables={"region": st},
    )


def test_write_read_roundtrip(tmp_path):
    t = sample_table()
    root = str(tmp_path / "flat")
    paths = write_table(root, t)
    assert len(paths) == 1 and paths[0].endswith(".parquet")
    back = read_table(root)
    pd.testing.assert_frame_equal(
        back.to_pandas().sort_values("id").reset_index(drop=True),
        t.to_pandas(),
    )


def test_partitioned_write_and_pruned_scan(tmp_path):
    t = sample_table()
    root = str(tmp_path / "part")
    paths = write_table(root, t, partition_by=["region"])
    assert len(paths) == 3
    assert any("region=asia" in p for p in paths)

    # full read reattaches the partition column
    back = read_table(root, columns=["id", "v", "region"])
    a = back.to_pandas().sort_values("id").reset_index(drop=True)
    b = t.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["id", "v", "region"]], b[["id", "v", "region"]])

    # partition pruning skips non-matching directories entirely
    asia = read_table(
        root,
        columns=["id", "region"],
        partition_filter=lambda keys: keys.get("region") == "asia",
    )
    expect_ids = b.loc[b["region"] == "asia", "id"].to_numpy()
    np.testing.assert_array_equal(
        np.sort(asia.columns["id"]), np.sort(expect_ids)
    )
    assert set(asia.string_tables["region"].decode(asia.columns["region"])) == {
        "asia"
    }


def test_table_write_plan_node(tmp_path):
    t = sample_table()
    root = str(tmp_path / "sinkout")
    plan = (
        PlanBuilder()
        .table_scan(t)
        .filter("v > 0e0")
        .table_write(root)
        .build()
    )
    out = run_plan(plan).to_pandas()
    kept = int((t.to_pandas()["v"] > 0).sum())
    assert out["rows"].iloc[0] == kept
    back = read_table(root)
    assert back.num_rows == kept


def test_connector_registry_and_splits(tmp_path):
    t = sample_table(50)
    root = str(tmp_path / "reg")
    write_table(root, t, partition_by=["region"])
    conn = get_connector("hive")
    src = conn.create_data_source(columns=["id", "region"])
    splits = _discover(root)
    assert all(isinstance(s, ConnectorSplit) for s in splits)
    for s in splits:
        src.add_split(s)
    merged = src.to_table()
    assert merged.num_rows == 50


def test_bucketed_partitioned_writes(tmp_path):
    import os

    import numpy as np

    from velox_tpu.connectors.hive import HiveDataSink, read_table
    from velox_tpu.dtypes import BIGINT, RowType, VARCHAR
    from velox_tpu.io.table import Table
    from velox_tpu.vector.string_table import StringTable

    st = StringTable()
    t = Table(
        RowType(["region", "k", "v"], [VARCHAR, BIGINT, BIGINT]),
        {
            "region": st.intern_all(["eu", "eu", "us", "us"]),
            "k": np.array([1, 2, 3, 4], np.int64),
            "v": np.array([10, 20, 30, 40], np.int64),
        },
        {"region": st},
    )
    root = str(tmp_path / "bp")
    sink = HiveDataSink(
        root, partition_by=["region"], bucket_by=["k"], bucket_count=2
    )
    sink.append(t)
    files = sink.finish()
    assert all(os.sep + "region=" in f for f in files)
    assert any("00000_0_" in os.path.basename(f) or "00001_0_" in os.path.basename(f) for f in files)
    back = read_table(root)
    assert sorted(np.asarray(back.columns["v"]).tolist()) == [10, 20, 30, 40]


def test_parquet_row_group_pruning(tmp_path):
    """Predicate bounds skip row groups by file statistics — the reference's
    selective-reader/ScanSpec stats pruning (SelectiveColumnReader.h:121) at
    row-group granularity (io/table.py Table.load_parquet)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import velox_tpu as vt
    from velox_tpu.dtypes import RowType
    from velox_tpu.io.table import Table

    # three row groups with disjoint key ranges
    path = str(tmp_path / "t.parquet")
    ks = np.arange(3000, dtype=np.int64)
    vs = ks * 10
    pq.write_table(
        pa.table({"k": ks, "v": vs}), path, row_group_size=1000
    )

    full = Table.load_parquet(path)
    assert full.num_rows == 3000

    pruned = Table.load_parquet(path, ranges={"k": (1200, 1300)})
    # only the middle row group survives the stats check
    assert pruned.num_rows == 1000
    assert pruned.columns["k"].min() == 1000
    assert pruned.columns["k"].max() == 1999

    none = Table.load_parquet(path, ranges={"k": (5000, None)})
    assert none.num_rows == 0

    open_lo = Table.load_parquet(path, ranges={"k": (None, 999)})
    assert open_lo.num_rows == 1000


def test_hive_source_range_filter(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from velox_tpu.connectors.base import ConnectorSplit
    from velox_tpu.connectors.hive import HiveDataSource

    path = str(tmp_path / "part.parquet")
    ks = np.arange(2000, dtype=np.int64)
    pq.write_table(pa.table({"k": ks}), path, row_group_size=500)

    src = HiveDataSource(columns=["k"], range_filter={"k": (600, 700)})
    src.add_split(ConnectorSplit(path=path, partition_keys={}))
    t = src.to_table()
    assert t.num_rows == 500  # one of four row groups decoded
    assert t.columns["k"].min() == 500
