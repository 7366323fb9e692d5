"""Device OrderBy/TopN (exec/sort.py): multi-tile, typed keys, nulls, limits.

Reference test analog: velox/exec/tests/OrderByTest.cpp + TopNTest.cpp — here
every case runs the pipeline at a small tile size so inputs span many tiles and
the device merge path is exercised, and results are checked against a pandas
oracle (and, for determinism, against the single-tile run).
"""

import numpy as np
import pandas as pd
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import DOUBLE, RowType, VARCHAR
from velox_tpu.exec.runner import LocalExecutor
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder


def make_table(n=5000, seed=3, with_nulls=False):
    rng = np.random.default_rng(seed)
    names = ["apple", "kiwi", "mango", "pear", "zebra"]
    cols = {
        "a": rng.integers(0, 97, n).astype(np.int64),
        "b": (rng.random(n) * 200 - 100).astype(np.float64),
        "s": rng.integers(0, len(names), n).astype(np.int64),
        "v": np.arange(n, dtype=np.int64),
    }
    df = pd.DataFrame(
        {
            "a": cols["a"],
            "b": cols["b"],
            "s": np.asarray(names)[cols["s"]],
            "v": cols["v"],
        }
    )
    validities = {}
    if with_nulls:
        validities["a"] = rng.random(n) > 0.1
        df.loc[~validities["a"], "a"] = np.nan
    from velox_tpu.vector.string_table import StringTable

    tab = StringTable()
    codes = tab.intern_all(names)
    t = Table(
        RowType(["a", "b", "s", "v"], [vt.BIGINT, DOUBLE, VARCHAR, vt.BIGINT]),
        {
            "a": cols["a"],
            "b": cols["b"],
            "s": np.asarray(codes)[cols["s"]].astype(np.int32),
            "v": cols["v"],
        },
        {"s": tab},
        validities,
    )
    return t, df


def run_tiled(plan, tile_rows):
    ex = LocalExecutor(plan, tile_rows=tile_rows)
    return ex, ex.run().to_pandas()


@pytest.mark.parametrize("tile_rows", [1024, 8192])
def test_orderby_multi_tile(tile_rows):
    t, df = make_table()
    plan = (
        PlanBuilder().table_scan(t).orderby(["a", "b desc", "v"]).build()
    )
    ex, out = run_tiled(plan, tile_rows)
    assert ex._device_sort is not None and ex._device_sort[1] is None
    expect = df.sort_values(["a", "b", "v"], ascending=[True, False, True])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), expect.reset_index(drop=True)
    )


@pytest.mark.parametrize("tile_rows", [1024, 8192])
def test_topn_multi_tile(tile_rows):
    t, df = make_table()
    plan = (
        PlanBuilder().table_scan(t).topn(["b desc", "v"], 17).build()
    )
    ex, out = run_tiled(plan, tile_rows)
    assert ex._device_sort is not None and ex._device_sort[1] == 17
    expect = df.sort_values(["b", "v"], ascending=[False, True]).head(17)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), expect.reset_index(drop=True)
    )


def test_topn_string_key():
    t, df = make_table()
    plan = (
        PlanBuilder().table_scan(t).topn(["s desc", "a", "v"], 25).build()
    )
    _, out = run_tiled(plan, 1024)
    expect = df.sort_values(
        ["s", "a", "v"], ascending=[False, True, True]
    ).head(25)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), expect.reset_index(drop=True)
    )


def test_orderby_limit_prefix():
    """ORDER BY + LIMIT fetches only offset+count rows (device prefix)."""
    t, df = make_table()
    plan = (
        PlanBuilder().table_scan(t).orderby(["a", "v"]).limit(40, offset=10).build()
    )
    ex, out = run_tiled(plan, 1024)
    assert ex._device_sort is not None and ex._device_sort[1] == 50
    expect = df.sort_values(["a", "v"]).iloc[10:50]
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), expect.reset_index(drop=True)
    )


def test_orderby_nulls_last_and_first():
    t, df = make_table(with_nulls=True)
    for clause, asc, nf in [
        (["a", "v"], True, False),
        (["a desc", "v"], False, False),
        (["a nulls first", "v"], True, True),
    ]:
        plan = PlanBuilder().table_scan(t).orderby(clause).build()
        _, out = run_tiled(plan, 1024)
        df2 = df.copy()
        expect = df2.sort_values(
            ["a", "v"],
            ascending=[asc, True],
            na_position="first" if nf else "last",
        )
        got_a = out["a"].to_numpy(dtype=float)
        exp_a = expect["a"].to_numpy(dtype=float)
        np.testing.assert_array_equal(np.isnan(got_a), np.isnan(exp_a))
        np.testing.assert_array_equal(
            got_a[~np.isnan(got_a)], exp_a[~np.isnan(exp_a)]
        )
        np.testing.assert_array_equal(out["v"].to_numpy(), expect["v"].to_numpy())


def test_device_sort_after_filter_and_join():
    """TopN above a join+filter pipeline (key-sorted probe output reordered)."""
    t, df = make_table(n=3000, seed=11)
    rng = np.random.default_rng(5)
    keys = np.arange(0, 97, dtype=np.int64)
    build = Table(
        RowType(["k", "w"], [vt.BIGINT, vt.BIGINT]),
        {"k": keys, "w": rng.integers(0, 1000, len(keys)).astype(np.int64)},
    )
    plan = (
        PlanBuilder()
        .table_scan(t, filter="v % 3 = 0")
        .hash_join(
            PlanBuilder().table_scan(build),
            ["a"],
            ["k"],
            output=["a", "v", "w"],
        )
        .topn(["w desc", "v"], 12)
        .build()
    )
    _, out = run_tiled(plan, 512)
    bdf = pd.DataFrame({"k": build.columns["k"], "w": build.columns["w"]})
    expect = (
        df[df.v % 3 == 0]
        .merge(bdf, left_on="a", right_on="k")[["a", "v", "w"]]
        .sort_values(["w", "v"], ascending=[False, True])
        .head(12)
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), expect.reset_index(drop=True)
    )


def test_orderby_spill_external_sort():
    """Spilled sorted runs merge on the host (reference: SortBuffer spill).

    A tiny spill threshold forces every run to disk; a tight memory pool
    forces the reserve-failure path.  Results must be identical to the
    in-HBM device sort.
    """
    from velox_tpu.config import DEFAULT_CONFIG
    from velox_tpu.utils import testvalue

    t, df = make_table(n=6000, seed=21, with_nulls=True)
    plan = (
        PlanBuilder().table_scan(t).orderby(["a", "b desc", "v"]).build()
    )
    baseline = LocalExecutor(plan, tile_rows=1024).run().to_pandas()

    hits = []
    with testvalue.scoped(
        "LocalExecutor::sortSpill", lambda s: hits.append(1)
    ):
        # threshold spill
        cfg = DEFAULT_CONFIG.copy(spill_bytes_threshold=1 << 14)
        out = (
            LocalExecutor(plan, tile_rows=1024, config=cfg)
            .run()
            .to_pandas()
        )
        assert hits, "spill threshold was not triggered"
        pd.testing.assert_frame_equal(out, baseline)

        # pool-pressure spill
        hits.clear()
        cfg2 = DEFAULT_CONFIG.copy(query_memory_limit_bytes=1 << 17)
        out2 = (
            LocalExecutor(plan, tile_rows=1024, config=cfg2)
            .run()
            .to_pandas()
        )
        assert hits, "pool pressure did not trigger a spill"
        pd.testing.assert_frame_equal(out2, baseline)


def test_orderby_spill_string_keys():
    """String dictionaries survive the spill round trip (codes remap on
    restore, Table.concat unifies per-run dictionaries)."""
    from velox_tpu.config import DEFAULT_CONFIG

    t, df = make_table(n=4000, seed=22)
    plan = PlanBuilder().table_scan(t).orderby(["s", "v"]).build()
    baseline = LocalExecutor(plan, tile_rows=1024).run().to_pandas()
    cfg = DEFAULT_CONFIG.copy(spill_bytes_threshold=1 << 14)
    out = LocalExecutor(plan, tile_rows=1024, config=cfg).run().to_pandas()
    pd.testing.assert_frame_equal(out, baseline)
