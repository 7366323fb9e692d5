"""Shuffle joins + distributed collect + skew handling (8-device CPU mesh).

Covers the round-2 distribution work: hash-partitioned builds with probe-row
all_to_all exchange (parallel/shuffle_join.py), collect pipelines through
DistributedExecutor, broadcast-vs-shuffle selection by build cardinality, and
the carry-overflow grow-and-retry under a 90%-skewed key distribution.
Reference seams: velox/exec/HashJoinBridge.h, core/PlanNode.h:1107,
velox/exec/OutputBuffer.h:131 (backpressure analog).
"""

import numpy as np
import pandas as pd
import pytest

import jax

import velox_tpu as vt
from velox_tpu.config import QueryConfig
from velox_tpu.dtypes import RowType
from velox_tpu.exec import run_plan
from velox_tpu.io.table import Table
from velox_tpu.parallel.runner import DistributedExecutor, make_mesh
from velox_tpu.plan import PlanBuilder


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


# force shuffle joins regardless of build size
SHUFFLE = QueryConfig(broadcast_join_max_rows=0)


def make_probe(n=20000, key_range=3000, seed=1, skew=None):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, key_range, n).astype(np.int64)
    if skew is not None:
        hot = rng.random(n) < skew
        keys[hot] = 7  # 90% of rows share one key
    return Table(
        RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
        {"k": keys, "v": rng.integers(0, 10**6, n).astype(np.int64)},
    )


def make_build(key_range=3000, seed=2, holes=True):
    rng = np.random.default_rng(seed)
    keys = np.arange(key_range, dtype=np.int64)
    if holes:
        keys = keys[rng.random(key_range) < 0.7]  # some probes miss
    return Table(
        RowType(["bk", "w"], [vt.BIGINT, vt.BIGINT]),
        {"bk": keys, "w": rng.integers(0, 10**6, len(keys)).astype(np.int64)},
    )


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def join_plan(probe, build, join_type="inner", output=("k", "v", "w")):
    return (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build),
            ["k"],
            ["bk"],
            output=list(output),
            join_type=join_type,
        )
        .build()
    )


@pytest.mark.parametrize("join_type,output", [
    ("inner", ("k", "v", "w")),
    ("left", ("k", "v", "w")),
    ("left_semi", ("k", "v")),
    ("anti", ("k", "v")),
])
def test_shuffle_join_collect_matches_local(mesh, join_type, output):
    probe, build = make_probe(), make_build()
    plan = join_plan(probe, build, join_type, output)
    local = run_plan(plan).to_pandas()
    ex = DistributedExecutor(
        plan, mesh, per_device_rows=1 << 11, config=SHUFFLE
    )
    assert ex._segments, "expected a shuffle-join segment"
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


def test_broadcast_chosen_for_small_build(mesh):
    probe, build = make_probe(), make_build(key_range=100)
    plan = join_plan(probe, build)
    ex = DistributedExecutor(plan, mesh, per_device_rows=1 << 11)
    assert not ex._segments, "small build must broadcast"
    local = run_plan(plan).to_pandas()
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


def test_duplicate_build_falls_back_to_broadcast(mesh):
    probe = make_probe(n=4000, key_range=50)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 50, 200).astype(np.int64)  # duplicates
    build = Table(
        RowType(["bk"], [vt.BIGINT]),
        {"bk": keys},
    )
    plan = (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build),
            ["k"],
            ["bk"],
            output=["k", "v"],
            join_type="left_semi",  # semi dedups: shuffle path works
        )
        .build()
    )
    ex = DistributedExecutor(plan, mesh, per_device_rows=1 << 10, config=SHUFFLE)
    assert ex._segments, "semi join dedups and shuffles"
    local = run_plan(plan).to_pandas()
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


def test_distributed_collect_filter_project(mesh):
    """Collect pipelines (no aggregation) — round 1 raised NotImplementedError."""
    probe = make_probe(n=30000)
    plan = (
        PlanBuilder()
        .table_scan(probe, filter="k % 7 = 1")
        .project(["k", "v + 1 as v1"])
        .build()
    )
    local = run_plan(plan).to_pandas()
    dist = DistributedExecutor(plan, mesh, per_device_rows=1 << 11).run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


def test_shuffle_join_into_groupby(mesh):
    """Shuffle join feeding a sort-mode grouped aggregation + group exchange."""
    probe, build = make_probe(n=30000, key_range=5000), make_build(5000)
    plan = (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build), ["k"], ["bk"], output=["k", "v", "w"]
        )
        .aggregation(["k"], ["sum(v) as sv", "count() as c", "max(w) as mw"])
        .build()
    )
    local = run_plan(plan).to_pandas()
    ex = DistributedExecutor(plan, mesh, per_device_rows=1 << 11, config=SHUFFLE)
    assert ex._segments
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


def test_skewed_groupby_grows_carry_and_completes(mesh):
    """A 90%-skewed key distribution must complete distributed, not die.

    The skew concentrates whole GROUPS on one device (hash ownership); the
    carry starts deliberately undersized and the executor grows it + retries
    (the round-1 hard-fail at parallel/runner.py:367 is gone)."""
    rng = np.random.default_rng(9)
    n = 16000
    keys = rng.integers(0, 4000, n).astype(np.int64)
    hot = rng.random(n) < 0.9
    # hot rows use keys that all hash to few devices: multiples of 8 cover a
    # narrow ownership stripe without changing group count materially
    keys[hot] = (keys[hot] // 8) * 8
    t = Table(
        RowType(["k", "v"], [vt.BIGINT, vt.BIGINT]),
        {"k": keys, "v": rng.integers(0, 100, n).astype(np.int64)},
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(["k"], ["sum(v) as sv", "count() as c"])
        .build()
    )
    local = run_plan(plan).to_pandas()
    cfg = QueryConfig(distributed_carry_rows=32)  # deliberately tiny
    ex = DistributedExecutor(plan, mesh, per_device_rows=1 << 11, config=cfg)
    dist = ex.run().to_pandas()
    assert ex._carry_rows > 32, "carry must have grown"
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


def test_shuffle_join_multi_key(mesh):
    rng = np.random.default_rng(4)
    n = 12000
    k1 = rng.integers(0, 40, n).astype(np.int64)
    k2 = rng.integers(0, 50, n).astype(np.int64)
    probe = Table(
        RowType(["a", "b", "v"], [vt.BIGINT, vt.BIGINT, vt.BIGINT]),
        {"a": k1, "b": k2, "v": rng.integers(0, 10**6, n).astype(np.int64)},
    )
    pairs = {(int(a), int(b)) for a, b in zip(k1[::3], k2[::3])}
    ba = np.asarray([p[0] for p in sorted(pairs)], dtype=np.int64)
    bb = np.asarray([p[1] for p in sorted(pairs)], dtype=np.int64)
    build = Table(
        RowType(["ba", "bb", "w"], [vt.BIGINT, vt.BIGINT, vt.BIGINT]),
        {"ba": ba, "bb": bb, "w": np.arange(len(ba), dtype=np.int64)},
    )
    plan = (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build),
            ["a", "b"],
            ["ba", "bb"],
            output=["a", "b", "v", "w"],
        )
        .build()
    )
    local = run_plan(plan).to_pandas()
    ex = DistributedExecutor(plan, mesh, per_device_rows=1 << 10, config=SHUFFLE)
    assert ex._segments
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


# ---------------------------------------------------------------------------
# Duplicate-key (N:M) shuffle joins — round-2 VERDICT missing #2: these used
# to broadcast the whole build to every device; now the build partitions by
# key hash with per-partition run state and the expansion output is sized by
# the two-phase overflow protocol.


def make_nm_build(key_range=3000, seed=5, avg_dup=3):
    rng = np.random.default_rng(seed)
    reps = rng.integers(1, 2 * avg_dup, key_range)
    keys = np.repeat(np.arange(key_range, dtype=np.int64), reps)
    keep = rng.random(len(keys)) < 0.8  # holes: some probes miss
    keys = keys[keep]
    return Table(
        RowType(["bk", "w"], [vt.BIGINT, vt.BIGINT]),
        {"bk": keys, "w": rng.integers(0, 10**6, len(keys)).astype(np.int64)},
    )


@pytest.mark.parametrize("join_type,output", [
    ("inner", ("k", "v", "w")),
    ("left", ("k", "v", "w")),
])
def test_nm_shuffle_join_matches_local(mesh, join_type, output):
    probe, build = make_probe(), make_nm_build()
    plan = join_plan(probe, build, join_type, output)
    local = run_plan(plan).to_pandas()
    ex = DistributedExecutor(
        plan, mesh, per_device_rows=1 << 11, config=SHUFFLE
    )
    assert ex._segments and ex._segments[0][1].expansion, (
        "duplicate-key build must take the expansion shuffle path"
    )
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


def test_nm_shuffle_join_expansion_overflow_reprobes(mesh):
    """High multiplicity pushes the per-device expansion total past the
    default 2x slack; the two-phase protocol must re-probe exact sizes,
    recompile, and produce the right answer."""
    probe = make_probe(n=16000, key_range=400)
    build = make_nm_build(key_range=400, avg_dup=24)
    plan = join_plan(probe, build, "inner", ("k", "v", "w"))
    local = run_plan(plan).to_pandas()
    ex = DistributedExecutor(
        plan, mesh, per_device_rows=1 << 10, config=SHUFFLE
    )
    assert ex._segments[0][1].expansion
    before = list(ex._sjoin_outcaps)
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))
    assert ex._sjoin_outcaps != before, (
        "overflowing expansion must have resized its output bucket "
        f"(before={before}, after={ex._sjoin_outcaps}, rows={len(dist)})"
    )


def test_nm_shuffle_join_skewed(mesh):
    """90% of probe rows share one key with ~6 build matches: one device owns
    almost the whole output; sizing must adapt, results must match."""
    probe = make_probe(n=12000, key_range=500, skew=0.9)
    rng = np.random.default_rng(11)
    keys = np.repeat(np.arange(500, dtype=np.int64),
                     rng.integers(1, 7, 500))
    build = Table(
        RowType(["bk", "w"], [vt.BIGINT, vt.BIGINT]),
        {"bk": keys, "w": rng.integers(0, 10**6, len(keys)).astype(np.int64)},
    )
    plan = join_plan(probe, build, "inner", ("k", "v", "w"))
    local = run_plan(plan).to_pandas()
    ex = DistributedExecutor(
        plan, mesh, per_device_rows=1 << 10, config=SHUFFLE
    )
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


def test_nm_shuffle_join_into_groupby(mesh):
    probe, build = make_probe(n=24000, key_range=2000), make_nm_build(2000)
    plan = (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build), ["k"], ["bk"],
            output=["k", "v", "w"],
        )
        .aggregation(["k"], ["sum(v) as sv", "count() as c", "max(w) as mw"])
        .build()
    )
    local = run_plan(plan).to_pandas()
    ex = DistributedExecutor(
        plan, mesh, per_device_rows=1 << 11, config=SHUFFLE
    )
    assert ex._segments and ex._segments[0][1].expansion
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))


def test_nm_left_filter_replans_distributed(mesh):
    """LEFT + non-equi filter over an N:M build must re-plan (uid/inner/left)
    instead of null-ing per expanded row."""
    probe, build = make_probe(n=8000, key_range=300), make_nm_build(300)
    plan = (
        PlanBuilder()
        .table_scan(probe)
        .hash_join(
            PlanBuilder().table_scan(build),
            ["k"],
            ["bk"],
            output=["k", "v", "w"],
            join_type="left",
            filter="w < v",
        )
        .build()
    )
    local = run_plan(plan).to_pandas()
    ex = DistributedExecutor(
        plan, mesh, per_device_rows=1 << 11, config=SHUFFLE
    )
    dist = ex.run().to_pandas()
    pd.testing.assert_frame_equal(_sorted(local), _sorted(dist))
