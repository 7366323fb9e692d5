"""Spill coverage: Grace hash join and Window chunk spill.

Reference: velox/exec/Spiller.h:29-39 (spill kinds incl. kHashJoinBuild /
kHashJoinProbe / kWindow) and docs/develop/spilling.rst — every memory-bound
operator must degrade to disk instead of failing.  Sort spill is covered in
tests/test_device_sort.py; aggregation spill in tests/test_memory.py.
"""

import numpy as np
import pandas as pd
import pytest

import velox_tpu as vt
from velox_tpu.config import DEFAULT_CONFIG
from velox_tpu.dtypes import DOUBLE, RowType, VARCHAR
from velox_tpu.exec.runner import LocalExecutor
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.utils import testvalue
from velox_tpu.vector.string_table import StringTable


def probe_table(n=40_000, seed=3):
    rng = np.random.default_rng(seed)
    valid = rng.random(n) > 0.05
    return Table(
        RowType(["k", "x"], [vt.BIGINT, vt.BIGINT]),
        {
            "k": rng.integers(0, 30_000, n),
            "x": rng.integers(0, 100, n),
        },
        validities={"k": valid},
    )


def build_table(n=20_000, seed=4, dup=False):
    rng = np.random.default_rng(seed)
    k = rng.permutation(30_000)[:n].astype(np.int64)
    if dup:
        k = np.concatenate([k, k[: n // 4]])
    names = ["ash", "birch", "cedar", "fir", "oak"]
    tab = StringTable()
    codes = tab.intern_all(names)
    sc = np.asarray(codes)[rng.integers(0, len(names), len(k))].astype(np.int32)
    return Table(
        RowType(["bk", "y", "s"], [vt.BIGINT, vt.BIGINT, VARCHAR]),
        {"bk": k, "y": rng.integers(0, 1000, len(k)), "s": sc},
        string_tables={"s": tab},
    )


def join_plan(probe, build, jt, output):
    return (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build).build(),
            ["k"],
            ["bk"],
            output=output,
            join_type=jt,
        )
        .build(),
    )[0]


GRACE_CFG = DEFAULT_CONFIG.copy(query_memory_limit_bytes=80_000)


@pytest.mark.parametrize(
    "jt,output",
    [
        ("inner", ["k", "x", "y", "s"]),
        ("left", ["k", "x", "y"]),
        ("left_semi", ["k", "x"]),
        ("anti", ["k", "x"]),
    ],
)
def test_grace_join_matches_in_memory(jt, output):
    probe, build = probe_table(), build_table()
    plan = join_plan(probe, build, jt, output)
    baseline = (
        LocalExecutor(plan, tile_rows=4096).run().to_pandas()
    )
    hits = []
    with testvalue.scoped(
        "LocalExecutor::graceJoin", lambda s: hits.append(1)
    ):
        out = (
            LocalExecutor(plan, tile_rows=4096, config=GRACE_CFG)
            .run()
            .to_pandas()
        )
    assert hits, "memory limit did not trigger the grace join"
    key = [c for c in out.columns]
    a = out.sort_values(key).reset_index(drop=True)
    b = baseline.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_grace_join_duplicate_build_keys():
    """N:M expansion joins partition too (per-partition run spans)."""
    probe, build = probe_table(20_000, seed=7), build_table(8000, seed=8, dup=True)
    plan = join_plan(probe, build, "inner", ["k", "x", "y"])
    baseline = LocalExecutor(plan, tile_rows=2048).run().to_pandas()
    cfg = DEFAULT_CONFIG.copy(query_memory_limit_bytes=60_000)
    hits = []
    with testvalue.scoped(
        "LocalExecutor::graceJoin", lambda s: hits.append(1)
    ):
        out = LocalExecutor(plan, tile_rows=2048, config=cfg).run().to_pandas()
    assert hits
    key = list(out.columns)
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        baseline.sort_values(key).reset_index(drop=True),
    )


def test_grace_join_then_aggregation():
    """Steps above the join re-plan over the grace result."""
    probe, build = probe_table(), build_table()
    plan = (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build).build(),
            ["k"],
            ["bk"],
            output=["x", "y"],
        )
        .aggregation(["x"], ["sum(y) as sy", "count(*) as c"])
        .orderby(["x"])
        .build()
    )
    baseline = LocalExecutor(plan, tile_rows=4096).run().to_pandas()
    out = (
        LocalExecutor(plan, tile_rows=4096, config=GRACE_CFG).run().to_pandas()
    )
    pd.testing.assert_frame_equal(out, baseline)


def test_window_spill():
    rng = np.random.default_rng(11)
    n = 30_000
    t = Table(
        RowType(["g", "o", "v"], [vt.BIGINT, vt.BIGINT, DOUBLE]),
        {
            "g": rng.integers(0, 300, n),
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.random(n),
        },
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .window(["g"], ["o"], ["row_number() as rn", "sum(v) as sv"])
        .orderby(["g", "o"])
        .build()
    )
    baseline = LocalExecutor(plan, tile_rows=4096).run().to_pandas()
    cfg = DEFAULT_CONFIG.copy(spill_bytes_threshold=1 << 16)
    hits = []
    with testvalue.scoped(
        "LocalExecutor::windowSpill", lambda s: hits.append(1)
    ):
        out = LocalExecutor(plan, tile_rows=4096, config=cfg).run().to_pandas()
    assert hits, "window spill threshold did not trigger"
    pd.testing.assert_frame_equal(out, baseline)


def test_grace_join_single_hot_key_terminates():
    """An all-duplicate-key build cannot be split by hashing: the grace path
    must detect no progress and run that partition unbounded instead of
    recursing forever (reference: Spiller max spill level)."""
    rng = np.random.default_rng(31)
    n_p, n_b = 800, 3000
    probe = Table(
        RowType(["k", "x"], [vt.BIGINT, vt.BIGINT]),
        {"k": rng.integers(6, 9, n_p), "x": rng.integers(0, 100, n_p)},
    )
    build = Table(
        RowType(["bk", "y"], [vt.BIGINT, vt.BIGINT]),
        {
            "bk": np.full(n_b, 7, dtype=np.int64),  # ONE hot key
            "y": rng.integers(0, 1000, n_b),
        },
    )
    plan = (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build).build(),
            ["k"],
            ["bk"],
            output=["k", "x", "y"],
            join_type="inner",
        )
        .build()
    )
    cfg = DEFAULT_CONFIG.copy(query_memory_limit_bytes=40_000)
    hits, noprog = [], []
    with testvalue.scoped("LocalExecutor::graceJoin", lambda s: hits.append(1)):
        with testvalue.scoped(
            "LocalExecutor::graceNoProgress", lambda s: noprog.append(1)
        ):
            out = LocalExecutor(plan, tile_rows=4096, config=cfg).run()
    assert hits and noprog
    n_hot = int((np.asarray(probe.columns["k"]) == 7).sum())
    assert out.num_rows == n_hot * n_b


def _na_join_plan(probe, build, output):
    return (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build).build(),
            ["k"], ["bk"], output=output,
            join_type="anti", null_aware=True,
        )
        .build()
    )


def test_grace_null_aware_anti():
    """NOT IN through the Grace spill path: the null-aware rules resolve
    globally (build NULL -> empty; empty build -> keep all; probe NULLs
    drop), then partitions run plain ANTI."""
    probe, build = probe_table(), build_table()
    plan = _na_join_plan(probe, build, ["k", "x"])
    baseline = LocalExecutor(plan, tile_rows=4096).run().to_pandas()
    hits = []
    with testvalue.scoped(
        "LocalExecutor::graceJoin", lambda s: hits.append(1)
    ):
        out = (
            LocalExecutor(plan, tile_rows=4096, config=GRACE_CFG)
            .run()
            .to_pandas()
        )
    assert hits, "memory limit did not trigger the grace join"
    key = list(out.columns)
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        baseline.sort_values(key).reset_index(drop=True),
    )


def test_grace_null_aware_anti_null_in_build():
    """A NULL build key empties the result — even under Grace."""
    probe = probe_table()
    b = build_table(n=20_000)
    bk = np.asarray(b.columns["bk"])
    valid = np.ones(len(bk), dtype=bool)
    valid[7] = False
    build = Table(b.schema, dict(b.columns), b.string_tables, {"bk": valid})
    plan = _na_join_plan(probe, build, ["k", "x"])
    hits = []
    with testvalue.scoped(
        "LocalExecutor::graceJoin", lambda s: hits.append(1)
    ):
        out = (
            LocalExecutor(plan, tile_rows=4096, config=GRACE_CFG)
            .run()
            .to_pandas()
        )
    assert len(out) == 0
