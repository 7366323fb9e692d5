"""Q3 SF1 phase timing (dev tool)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from velox_tpu.connectors.tpch import plans as tp
from velox_tpu.exec.runner import LocalExecutor

T = time.perf_counter
t0 = T(); tables = tp.load_query_tables(3, 1.0); print("load", T() - t0, flush=True)
plan = tp.build_query(3, tables)
t0 = T(); ex = LocalExecutor(plan, tile_rows=1 << 22); print("build(execs+joins)", T() - t0, flush=True)
t0 = T(); r = ex.run(); print("first run", T() - t0, flush=True)
t0 = T(); r = ex.run(); print("second run", T() - t0, flush=True)
print(r.to_pandas().head(3).to_string(), flush=True)
