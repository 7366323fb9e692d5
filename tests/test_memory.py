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
