#!/usr/bin/env python
"""TPC-H benchmark harness (reference: velox/benchmarks/tpch/TpchBenchmark.cpp:218).

Runs the headline query (Q6 at SF1 by default) on the default JAX backend (the
real TPU chip under the driver), verifies row-exact parity against the exact
numpy oracle, and prints ONE JSON line:

    {"metric": ..., "value": rows_per_sec, "unit": "rows/s", "vs_baseline": R}

``vs_baseline`` is engine rows/s divided by the *same-host numpy oracle* rows/s
on identical data — a reference-engine proxy, since the reference's dbgen/DuckDB
stack is not runnable in this environment (see BASELINE.md).  Tables are
HBM-resident before timing (the engine's steady-state regime); host->device
ingest time is reported separately on stderr.

Usage: python bench.py [--sf 1.0] [--query 6] [--all] [--quick] [--tile 4194304]
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def time_best(fn, repeats):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_query(num, sf, tile_rows, repeats=3):
    import pandas as pd

    from velox_tpu.connectors.tpch import plans as tp
    from velox_tpu.exec.runner import LocalExecutor

    tables = tp.load_query_tables(num, sf)
    plan = tp.build_query(num, tables)
    input_rows = max(t.num_rows for t in tables.values())

    executor = LocalExecutor(plan, tile_rows=tile_rows)

    # Source-scan tiles HBM-resident up front (steady-state regime).
    t0 = time.perf_counter()
    tiles = executor.device_tiles()
    import jax

    jax.block_until_ready([t.columns for t in tiles])
    ingest_s = time.perf_counter() - t0

    # Warm-up (compile) + parity check.
    result = executor.run(prefetched_tiles=tiles).to_pandas()
    if num in tp.ENGINE_OUTPUT_ORDER:
        result = result[tp.ENGINE_OUTPUT_ORDER[num]]
    oracle = tp.oracle_result(num, tables)
    pd.testing.assert_frame_equal(
        result.reset_index(drop=True), oracle, check_dtype=False
    )
    log(f"q{num}: parity OK ({len(result)} result rows)")

    engine_s = time_best(lambda: executor.run(prefetched_tiles=tiles), repeats)
    oracle_s = time_best(lambda: tp.oracle_result(num, tables), repeats)
    log(
        f"q{num} sf{sf:g}: engine {engine_s*1e3:.1f} ms, oracle(numpy) "
        f"{oracle_s*1e3:.1f} ms, ingest {ingest_s*1e3:.1f} ms, "
        f"rows {input_rows}"
    )
    return {
        "query": num,
        "sf": sf,
        "input_rows": input_rows,
        "engine_seconds": engine_s,
        "oracle_seconds": oracle_s,
        "ingest_seconds": ingest_s,
        "rows_per_sec": input_rows / engine_s,
        "vs_oracle": oracle_s / engine_s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--query", type=int, default=6)
    ap.add_argument("--all", action="store_true", help="run all 22 TPC-H queries")
    ap.add_argument("--quick", action="store_true", help="SF0.01 smoke run")
    ap.add_argument("--tile", type=int, default=1 << 22)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    if args.quick:
        args.sf = 0.01

    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    if args.all:
        from velox_tpu.connectors.tpch.plans import implemented_queries

        queries = implemented_queries()
    else:
        queries = [args.query]
    results = {}
    for num in queries:
        results[num] = bench_query(num, args.sf, args.tile, args.repeats)

    head = results[args.query if not args.all else 6]
    print(
        json.dumps(
            {
                "metric": f"tpch_sf{args.sf:g}_q{head['query']}_rows_per_sec",
                "value": round(head["rows_per_sec"], 1),
                "unit": "rows/s",
                "vs_baseline": round(head["vs_oracle"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
