#!/usr/bin/env python
"""Real-TPU smoke gate: run the general DOUBLE surface ON THE CHIP.

Round-4 verdict: the CPU-only test suite plus a decimal-only TPC-H bench
left the DOUBLE surface unverified on hardware, and the README quick-start
itself failed to compile on device (f64 bitcast in the canonical sort
path).  This script is the gate: every case below exercises a path that is
CPU-identical in tests but lowers differently on the TPU backend
(platform-dependent f64 codec, canonical shared sorts, window frames).

Writes DEVICE_SMOKE_r{N}.json at the repo root (pass --out) and exits
non-zero on any failure.  Reference discipline: the reference runs its
fuzzers against the real execution path nightly
(velox/.github/workflows/scheduled.yml:26), not a stand-in backend.

Usage: python scripts/device_smoke.py [--out DEVICE_SMOKE.json]
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RESULTS = {}


def case(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            try:
                fn()
                RESULTS[name] = {
                    "ok": True,
                    "seconds": round(time.perf_counter() - t0, 3),
                }
                log(f"PASS {name} ({RESULTS[name]['seconds']}s)")
            except Exception as e:
                RESULTS[name] = {
                    "ok": False,
                    "seconds": round(time.perf_counter() - t0, 3),
                    "error": repr(e)[:500],
                }
                log(f"FAIL {name}: {e!r}")
                log(traceback.format_exc()[-2000:])
            return RESULTS[name]["ok"]

        run.case_name = name
        return run

    return deco


def _table():
    from velox_tpu.dtypes import BIGINT, DOUBLE, RowType
    from velox_tpu.io.table import Table

    rng = np.random.default_rng(42)
    n = 4096
    return Table(
        RowType(["k", "v", "w"], [BIGINT, DOUBLE, DOUBLE]),
        {
            "k": rng.integers(0, 7, n),
            "v": np.round(rng.normal(size=n) * 100, 4),
            "w": rng.random(n),
        },
    )


@case("readme_quickstart")
def smoke_quickstart():
    from velox_tpu.dtypes import BIGINT, DOUBLE, RowType
    from velox_tpu.exec import run_plan
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder

    t = Table(
        RowType(["k", "v"], [BIGINT, DOUBLE]),
        {"k": np.arange(8) % 3, "v": np.linspace(0, 1, 8)},
    )
    plan = (
        PlanBuilder()
        .table_scan(t, filter="v > 0.25")
        .aggregation(["k"], ["sum(v) as s", "count(*) as c"])
        .orderby(["k"])
        .build()
    )
    df = run_plan(plan).to_pandas()
    assert list(df["k"]) == [0, 1, 2], df
    assert int(df["c"].sum()) == 6, df


@case("double_orderby")
def smoke_double_orderby():
    from velox_tpu.exec import run_plan
    from velox_tpu.plan import PlanBuilder

    t = _table()
    plan = PlanBuilder().table_scan(t).orderby(["v desc"]).limit(50).build()
    df = run_plan(plan).to_pandas()
    want = np.sort(np.asarray(t.columns["v"]))[::-1][:50]
    np.testing.assert_allclose(df["v"].to_numpy(), want, rtol=1e-6)


@case("double_groupby_sortmode")
def smoke_double_groupby():
    from velox_tpu.exec import run_plan
    from velox_tpu.plan import PlanBuilder

    t = _table()
    plan = (
        PlanBuilder()
        .table_scan(t)
        .aggregation(["k"], ["sum(v) as s", "avg(w) as a", "max(v) as m"])
        .orderby(["k"])
        .build()
    )
    df = run_plan(plan).to_pandas()
    k = np.asarray(t.columns["k"])
    v = np.asarray(t.columns["v"])
    for i, kk in enumerate(sorted(set(k.tolist()))):
        np.testing.assert_allclose(
            df["s"][i], v[k == kk].sum(), rtol=1e-5
        )


@case("double_join_payload")
def smoke_double_join():
    from velox_tpu.exec import run_plan
    from velox_tpu.dtypes import BIGINT, DOUBLE, RowType
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder

    t = _table()
    dim = Table(
        RowType(["k2", "r"], [BIGINT, DOUBLE]),
        {"k2": np.arange(7), "r": np.array([1.5, -2.25, 0.75, 3.5, -1.25, 0.5, 2.0])},
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .hash_join(
            PlanBuilder().table_scan(dim).build(),
            left_keys=["k"],
            right_keys=["k2"],
            output=["k", "v", "r"],
        )
        .aggregation(["k"], ["sum(r) as sr", "count(*) as c"])
        .orderby(["k"])
        .build()
    )
    df = run_plan(plan).to_pandas()
    k = np.asarray(t.columns["k"])
    r = np.asarray(dim.columns["r"])
    for i, kk in enumerate(sorted(set(k.tolist()))):
        cnt = int((k == kk).sum())
        assert int(df["c"][i]) == cnt
        np.testing.assert_allclose(df["sr"][i], r[kk] * cnt, rtol=1e-6)


@case("double_window")
def smoke_double_window():
    from velox_tpu.sql import run_sql

    t = _table()
    df = run_sql(
        "select k, v, row_number() over (partition by k order by v desc) as rn,"
        " sum(v) over (partition by k) as sv from t order by k, rn limit 20",
        {"t": t},
    ).to_pandas()
    assert (df.groupby("k")["rn"].min() == 1).all()


@case("float_distinct_hll")
def smoke_hll_doubles():
    # approx_distinct hashes double BITS on device (ops/f64bits word)
    from velox_tpu.sql import run_sql

    t = _table()
    df = run_sql(
        "select approx_distinct(v) as d from t", {"t": t}
    ).to_pandas()
    true = len(set(np.asarray(t.columns["v"]).tolist()))
    assert abs(int(df["d"][0]) - true) / true < 0.1, (int(df["d"][0]), true)


@case("sql_tpch_q6_sf001")
def smoke_q6():
    from velox_tpu.connectors.tpch import plans as tp
    from velox_tpu.exec.runner import LocalExecutor

    tables = tp.load_query_tables(6, 0.01)
    plan = tp.build_query(6, tables)
    result = LocalExecutor(plan, tile_rows=1 << 16).run().to_pandas()
    oracle = tp.oracle_result(6, tables)
    import pandas as pd

    pd.testing.assert_frame_equal(
        result.reset_index(drop=True), oracle, check_dtype=False
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="DEVICE_SMOKE.json")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    cases = [
        smoke_quickstart,
        smoke_double_orderby,
        smoke_double_groupby,
        smoke_double_join,
        smoke_double_window,
        smoke_hll_doubles,
        smoke_q6,
    ]
    t0 = time.perf_counter()
    ok = all([c() for c in cases])
    out = {
        "backend": backend,
        "ok": ok,
        "total_seconds": round(time.perf_counter() - t0, 1),
        "cases": RESULTS,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"device_smoke_ok": ok, "backend": backend}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
