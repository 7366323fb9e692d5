#!/usr/bin/env python
"""Multi-device scaling-efficiency harness (BASELINE.md: >=80% 1->N rows/s).

Runs a TPC-H query through DistributedExecutor on 1, 2, 4, ... devices of the
available mesh and reports rows/s + efficiency vs the single-device run.  On
single-chip CI this exercises the virtual CPU mesh (correctness + harness
shape); on a real pod slice it measures ICI scaling.

Usage:
  python scripts/bench_scaling.py --query 6 --sf 0.05          # real devices
  python scripts/bench_scaling.py --query 1 --cpu --devices 8  # virtual mesh
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", type=int, default=6)
    ap.add_argument("--sf", type=float, default=0.05)
    ap.add_argument("--cpu", action="store_true", help="force virtual CPU mesh")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--per-device-rows", type=int, default=1 << 16)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
        os.environ["VELOX_TPU_XLA_CACHE"] = "off"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import pandas as pd

    from velox_tpu.connectors.tpch import plans as tp
    from velox_tpu.parallel.runner import DistributedExecutor, make_mesh

    n_avail = len(jax.devices())
    print(f"backend={jax.default_backend()} devices={n_avail}", file=sys.stderr)

    tables = tp.load_query_tables(args.query, args.sf)
    plan = tp.build_query(args.query, tables)
    oracle = tp.oracle_result(args.query, tables)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    results = {}
    base_rps = None
    for n in sizes:
        mesh = make_mesh(n)
        ex = DistributedExecutor(
            plan, mesh, per_device_rows=args.per_device_rows
        )
        out = ex.run().to_pandas()  # warm-up + compile
        if args.query in tp.ENGINE_OUTPUT_ORDER:
            out = out[tp.ENGINE_OUTPUT_ORDER[args.query]]
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), oracle, check_dtype=False
        )
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            ex.run()
            best = min(best, time.perf_counter() - t0)
        rows = max(t.num_rows for t in tables.values())
        rps = rows / best
        if base_rps is None:
            base_rps = rps
        eff = rps / (base_rps * n)
        results[n] = {"seconds": best, "rows_per_sec": rps, "efficiency": eff}
        print(
            f"n={n}: {best*1e3:.1f} ms, {rps:,.0f} rows/s, eff {eff:.2f}",
            file=sys.stderr,
        )

    print(json.dumps({
        "metric": f"tpch_sf{args.sf:g}_q{args.query}_scaling",
        "value": results[sizes[-1]]["efficiency"],
        "unit": "efficiency",
        "detail": results,
    }, default=float))


if __name__ == "__main__":
    main()
