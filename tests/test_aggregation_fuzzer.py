"""Aggregation fuzzer (reference: exec/tests/utils/AggregationFuzzer.cpp).

Random grouped aggregations over random (nullable) data must produce identical
results across logically-equal execution plans:
  * any tile size (streaming must not change results),
  * device sorted-carry merge vs host merge (the spill-capable path),
  * and match a pandas oracle.
"""

import numpy as np
import pandas as pd
import pytest

import velox_tpu.dtypes as vt
from velox_tpu.config import QueryConfig
from velox_tpu.exec.runner import LocalExecutor
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder

AGGS = [
    ("sum(v) as r", lambda g: g["v"].sum()),
    ("count(*) as r", lambda g: g["v"].size()),
    ("count(v) as r", lambda g: g["v"].count()),
    ("min(v) as r", lambda g: g["v"].min()),
    ("max(v) as r", lambda g: g["v"].max()),
    ("avg(w) as r", lambda g: g["w"].mean()),
    ("var_pop(w) as r", lambda g: g["w"].var(ddof=0)),
    # engine semantics: rows where ANY argument is null are skipped (the
    # reference keeps null payloads; deviation documented in exec/aggregates.py)
    ("min_by(v, w) as r", lambda g: g.apply(
        lambda x: (
            x.dropna(subset=["v", "w"]).sort_values(["w", "v"]).iloc[0]["v"]
            if x.dropna(subset=["v", "w"]).shape[0]
            else None
        ),
        include_groups=False,
    )),
]


def _table(seed, n=700):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, rng.integers(2, 40), n)
    v = rng.integers(-1000, 1000, n).astype(np.int64)
    w = rng.normal(size=n)
    valid_v = rng.random(n) > 0.15
    return Table(
        vt.RowType(["k", "v", "w"], [vt.BIGINT, vt.BIGINT, vt.DOUBLE]),
        {"k": k, "v": v, "w": w},
        validities={"v": valid_v},
    ), pd.DataFrame({"k": k, "v": np.where(valid_v, v, np.nan), "w": w})


@pytest.mark.parametrize("seed", range(6))
def test_aggregation_plan_equivalence(seed):
    rng = np.random.default_rng(1000 + seed)
    table, df = _table(seed)
    agg_sql, oracle_fn = AGGS[int(rng.integers(0, len(AGGS)))]
    plan = (
        PlanBuilder()
        .table_scan(table)
        .aggregation(["k"], [agg_sql])
        .orderby(["k"])
        .build()
    )
    results = {}
    for label, tile, cfg in [
        ("small_tiles", 64, None),
        ("one_tile", 4096, None),
        ("host_merge", 64, QueryConfig(device_agg_merge=False)),
    ]:
        kw = {} if cfg is None else {"config": cfg}
        results[label] = (
            LocalExecutor(plan, tile_rows=tile, **kw).run().to_pandas()
        )
    base = results["small_tiles"]
    for label, out in results.items():
        pd.testing.assert_frame_equal(base, out, check_dtype=False), label

    g = df.groupby("k")
    expect = oracle_fn(g)
    got = base.set_index("k")["r"]
    if "avg" in agg_sql or "var_pop" in agg_sql:
        np.testing.assert_allclose(
            got.to_numpy(dtype=float), expect.to_numpy(dtype=float), rtol=1e-9
        )
    else:
        ev = expect.to_numpy()
        gv = got.to_numpy()
        for a, b in zip(gv, ev):
            if b is None or (isinstance(b, float) and np.isnan(b)):
                assert a is None or (isinstance(a, float) and np.isnan(a))
            else:
                assert float(a) == float(b), (agg_sql, a, b)


@pytest.mark.parametrize("seed", range(3))
def test_multi_aggregate_tiling_invariance(seed):
    table, _ = _table(100 + seed, n=1500)
    plan = (
        PlanBuilder()
        .table_scan(table)
        .aggregation(
            ["k"],
            [
                "sum(v) as s", "count(*) as c", "min(w) as mn", "max(w) as mx",
                "avg(v) as av", "stddev(w) as sd", "min_by(w, v) as mb",
            ],
        )
        .orderby(["k"])
        .build()
    )
    a = LocalExecutor(plan, tile_rows=128).run().to_pandas()
    b = LocalExecutor(plan, tile_rows=1 << 12).run().to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
