"""Grouped (bucketed) execution over split groups.

Reference: velox/exec/Task.cpp grouped execution + TaskTest — split groups run
as independent units with bounded concurrency; checkpoints make a group the
unit of partial restart.
"""

import numpy as np
import pytest

from velox_tpu.connectors.hive import write_table
from velox_tpu.dtypes import BIGINT, RowType, VARCHAR
from velox_tpu.exec.grouped import GroupedExecution, concat_tables, split_groups
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.utils import testvalue
from velox_tpu.vector.string_table import StringTable


def make_dataset(tmp_path):
    st = StringTable()
    t = Table(
        RowType(["region", "k", "v"], [VARCHAR, BIGINT, BIGINT]),
        {
            "region": st.intern_all(["eu", "eu", "us", "us", "ap", "ap"]),
            "k": np.array([1, 2, 1, 2, 1, 1], np.int64),
            "v": np.array([10, 20, 30, 40, 50, 60], np.int64),
        },
        {"region": st},
    )
    root = str(tmp_path / "ds")
    write_table(root, t, partition_by=["region"])
    return root


def make_plan(table):
    return (
        PlanBuilder()
        .table_scan(table)
        .aggregation(["region", "k"], ["sum(v) as s"])
        .build()
    )


def test_split_groups_and_grouped_run(tmp_path):
    root = make_dataset(tmp_path)
    groups = split_groups(root)
    assert [k for k, _ in groups] == ["region=ap", "region=eu", "region=us"]
    ge = GroupedExecution(make_plan, groups, concurrent_groups=2)
    out = ge.run().to_pandas().sort_values(["region", "k"]).reset_index(drop=True)
    assert out["region"].tolist() == ["ap", "eu", "eu", "us", "us"]
    assert out["s"].tolist() == [110, 10, 20, 30, 40]
    assert ge.groups_run == 3


def test_checkpoint_restart(tmp_path):
    root = make_dataset(tmp_path)
    groups = split_groups(root)
    ckpt = str(tmp_path / "ckpt")

    # first attempt: the 'us' group fails after others complete
    def boom(key):
        if key == "region=us":
            raise RuntimeError("injected group failure")

    ge1 = GroupedExecution(
        make_plan, groups, concurrent_groups=1, checkpoint_dir=ckpt
    )
    with testvalue.scoped("GroupedExecution::runGroup", boom):
        with pytest.raises(RuntimeError):
            ge1.run()

    # restart: completed groups restore from checkpoints; only 'us' re-runs
    ge2 = GroupedExecution(
        make_plan, groups, concurrent_groups=1, checkpoint_dir=ckpt
    )
    out = ge2.run().to_pandas().sort_values(["region", "k"]).reset_index(drop=True)
    assert ge2.groups_run == 1  # the elastic-restart unit
    assert out["s"].tolist() == [110, 10, 20, 30, 40]


def test_concat_tables_remaps_dictionaries():
    st1, st2 = StringTable(), StringTable()
    a = Table(
        RowType(["s"], [VARCHAR]),
        {"s": st1.intern_all(["x", "y"])},
        {"s": st1},
    )
    b = Table(
        RowType(["s"], [VARCHAR]),
        {"s": st2.intern_all(["y", "z"])},
        {"s": st2},
    )
    out = concat_tables([a, b]).to_pandas()
    assert out["s"].tolist() == ["x", "y", "y", "z"]
