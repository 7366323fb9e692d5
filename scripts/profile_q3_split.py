"""Per-stage timing of the SPLIT-dispatch Q3 path on the real chip (round 4).
Set VELOX_TPU_LOG_COMPILES=1 to see each canonical sort's first dispatch."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
from velox_tpu.connectors.tpch import plans as tp
from velox_tpu.exec.runner import LocalExecutor

T = time.perf_counter
def stamp(label, t0):
    print(f"{label}: {T()-t0:.1f}s", flush=True)

sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
t0 = T(); tables = tp.load_query_tables(3, sf); stamp("load", t0)
plan = tp.build_query(3, tables)
t0 = T(); ex = LocalExecutor(plan, tile_rows=1 << 23); stamp("build(execs+joins)", t0)
print("split:", getattr(ex, "_split_mode", False), "kind:", ex.kind, flush=True)
t0 = T(); tiles = ex.device_tiles(); jax.block_until_ready([t.columns for t in tiles]); stamp("ingest", t0)
t0 = T(); out = ex.run(prefetched_tiles=tiles); stamp("first run", t0)
t0 = T(); out = ex.run(prefetched_tiles=tiles); stamp("second run", t0)
t0 = T(); df = out.to_pandas(); stamp("to_pandas", t0)
print(len(df), "rows", flush=True)
