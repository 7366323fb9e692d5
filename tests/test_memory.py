"""Memory pool, arbitration, and spill tests (reference: memory + Spiller tests)."""

import numpy as np
import pandas as pd
import pytest

import velox_tpu as vt
from velox_tpu.config import QueryConfig
from velox_tpu.dtypes import RowType
from velox_tpu.exec.memory import MemoryPool, MemoryPoolError, Spiller, table_nbytes
from velox_tpu.exec.runner import LocalExecutor
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder


def test_pool_hierarchy_and_limits():
    root = MemoryPool("root", limit=1000)
    op1 = root.add_child("agg")
    op2 = root.add_child("join")
    op1.reserve(400)
    op2.reserve(500)
    assert root.reserved == 900
    with pytest.raises(MemoryPoolError):
        op1.reserve(200)
    op2.release(500)
    op1.reserve(200)
    assert root.peak == 900
    assert "agg" in root.usage_tree()


def test_arbitration_reclaims():
    root = MemoryPool("root", limit=1000)
    op = root.add_child("agg")
    op.reserve(900)

    def reclaimer(target):
        # spill: release everything
        freed = op.reserved
        op.release(freed)
        return freed

    op.add_reclaimer(reclaimer)
    op.reserve(500)  # triggers arbitration instead of failing
    assert op.reserved == 500


def test_spiller_roundtrip(tmp_path):
    t = Table(
        RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
        {"k": np.arange(100), "v": np.arange(100) * 3},
    )
    sp = Spiller(str(tmp_path))
    sp.spill(t)
    sp.spill(t)
    assert sp.spilled_rows == 200
    back = list(sp.restore())
    assert len(back) == 2
    np.testing.assert_array_equal(back[0].columns["v"], t.columns["v"])
    sp.cleanup()
    assert table_nbytes(t) == 100 * 8 * 2


def test_query_with_forced_spill_matches_no_spill():
    """kTestingSpillPct analog: force spilling and require identical results."""
    rng = np.random.default_rng(5)
    n = 3000
    t = Table(
        RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
        {"k": rng.integers(0, 400, n), "v": rng.integers(-100, 100, n)},
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(["k"], ["sum(v) as s", "count(*) as c"])
        .orderby(["k"])
        .build()
    )
    normal = LocalExecutor(plan, tile_rows=4096).run().to_pandas()
    forced = LocalExecutor(
        plan,
        tile_rows=4096,
        config=QueryConfig(spill_bytes_threshold=1, device_agg_merge=False),
    ).run().to_pandas()
    pd.testing.assert_frame_equal(normal, forced)
    # ~5000 distinct keys against a 1024-slot carry overflows the device group
    # merge; the executor must transparently fall back to the host-merge path
    rng2 = np.random.default_rng(6)
    n2, nkeys = 8000, 5000
    t2 = Table(
        RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
        {
            "k": rng2.permutation(np.repeat(np.arange(nkeys), 2))[:n2],
            "v": rng2.integers(-100, 100, n2),
        },
    )
    plan2 = (
        PlanBuilder()
        .table_scan(t2)
        .aggregation(["k"], ["sum(v) as s", "count(*) as c"])
        .orderby(["k"])
        .build()
    )
    via_device_fallback = LocalExecutor(plan2, tile_rows=1024).run().to_pandas()
    host_only = LocalExecutor(
        plan2, tile_rows=1024, config=QueryConfig(device_agg_merge=False)
    ).run().to_pandas()
    pd.testing.assert_frame_equal(via_device_fallback, host_only)


def test_executor_reserves_join_build_and_tiles():
    """LocalExecutor reserves HBM for join builds and uploaded scan tiles
    against its query pool (round-1 gap: pools were a library, not wired)."""
    import velox_tpu as vt
    from velox_tpu.dtypes import RowType
    from velox_tpu.exec.runner import LocalExecutor
    from velox_tpu.io.table import Table as VTable
    from velox_tpu.plan import PlanBuilder

    rng = np.random.default_rng(0)
    n = 4000
    probe = VTable(
        RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
        {
            "k": rng.integers(0, 200, n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        },
    )
    build = VTable(
        RowType(["bk", "w"], [vt.BIGINT, vt.BIGINT]),
        {
            "bk": np.arange(200, dtype=np.int64),
            "w": np.arange(200, dtype=np.int64),
        },
    )
    plan = (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(PlanBuilder().table_scan(build), ["k"], ["bk"], output=["k", "v", "w"])
        .aggregation(["k"], ["sum(v) as sv"])
        .build()
    )
    ex = LocalExecutor(plan, tile_rows=1 << 12)
    assert ex.pool.reserved > 0, "join build must be reserved"
    before = ex.pool.reserved
    tiles = ex.device_tiles()
    assert ex.pool.reserved > before, "scan tiles must be reserved"
    ex.run(prefetched_tiles=tiles)
    root_before = ex.pool.parent.reserved
    ex.__del__()
    assert ex.pool.parent is None  # detached, root released


def test_tight_limit_degrades_to_host_merge():
    """A join+agg query under a tight pool limit completes via the spilling
    host-merge path instead of erroring (MemoryReclaimer contract)."""
    import velox_tpu as vt
    from velox_tpu.config import QueryConfig
    from velox_tpu.dtypes import RowType
    from velox_tpu.exec.runner import LocalExecutor, run_plan
    from velox_tpu.io.table import Table as VTable
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.utils import testvalue

    rng = np.random.default_rng(1)
    n = 6000
    probe = VTable(
        RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
        {
            "k": rng.integers(0, 3000, n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        },
    )
    build = VTable(
        RowType(["bk", "w"], [vt.BIGINT, vt.BIGINT]),
        {
            "bk": np.arange(3000, dtype=np.int64),
            "w": np.arange(3000, dtype=np.int64),
        },
    )
    plan = (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(PlanBuilder().table_scan(build), ["k"], ["bk"], output=["k", "v", "w"])
        .aggregation(["k", "w"], ["sum(v) as sv", "count() as c"])
        .build()
    )
    expect = run_plan(plan).to_pandas()

    hits = []
    testvalue.register(
        "LocalExecutor::carryMemoryFallback", lambda s: hits.append(1)
    )
    try:
        # enough for the build + tiles, too little for the device carry
        base = LocalExecutor(plan, tile_rows=1 << 11)
        need = base.pool.reserved
        del base
        cfg = QueryConfig(query_memory_limit_bytes=need + (1 << 16))
        ex = LocalExecutor(plan, tile_rows=1 << 11, config=cfg)
        out = ex.run().to_pandas()
    finally:
        testvalue.unregister("LocalExecutor::carryMemoryFallback")
    assert hits, "expected the carry reservation to fall back"
    key = list(expect.columns)
    pd_sorted = lambda df: df.sort_values(key).reset_index(drop=True)  # noqa: E731
    import pandas as pd

    pd.testing.assert_frame_equal(pd_sorted(expect), pd_sorted(out))


def test_cache_reclaimer_frees_bytes(tmp_path):
    """Under pool pressure the arbitrator shrinks the data cache first."""
    import velox_tpu as vt
    from velox_tpu.dtypes import RowType
    from velox_tpu.exec.memory import ROOT_POOL
    from velox_tpu.io.cache import DEFAULT_CACHE
    from velox_tpu.io.table import Table as VTable

    t = VTable(
        RowType(["x"], [vt.BIGINT]),
        {"x": np.arange(200000, dtype=np.int64)},
    )
    path = str(tmp_path / "t.parquet")
    t.save_parquet(path)
    DEFAULT_CACHE.clear()
    DEFAULT_CACHE.get_or_load(path)
    assert DEFAULT_CACHE.cached_bytes > 0
    limit_pool = ROOT_POOL.add_child("tight", limit=None)
    try:
        old_limit = ROOT_POOL.limit
        ROOT_POOL.limit = ROOT_POOL.reserved + (1 << 10)
        limit_pool.reserve(1 << 20)  # exceeds root limit -> arbitration
        assert DEFAULT_CACHE.cached_bytes == 0, "cache must be evicted"
    finally:
        ROOT_POOL.limit = old_limit
        limit_pool.detach()
