"""Which Q3 sub-program's remote compile is the long pole, and does it scale
with tile shape?  (round-4 bench blocker: Q3 never finished compiling within
the bench watchdog.)  Run on the real chip."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from velox_tpu.connectors.tpch import plans as tp
from velox_tpu.exec.runner import LocalExecutor, apply_streaming

T = time.perf_counter


def stamp(label, t0):
    print(f"{label}: {T() - t0:.1f}s", flush=True)


def main(sf=1.0, tile=1 << 23):
    t0 = T()
    tables = tp.load_query_tables(3, sf)
    stamp("load", t0)
    plan = tp.build_query(3, tables)
    t0 = T()
    ex = LocalExecutor(plan, tile_rows=tile)
    stamp("build(execs+joins)", t0)
    t0 = T()
    tiles = ex.device_tiles()
    jax.block_until_ready([t.columns for t in tiles])
    stamp("ingest", t0)
    tile0 = tiles[0]

    lin = ex.lin
    steps_jit = jax.jit(lambda b: apply_streaming(b, tuple(lin.steps)))
    t0 = T()
    lowered = steps_jit.lower(tile0)
    stamp("steps.lower", t0)
    txt = lowered.as_text()
    print(f"steps HLO: {len(txt)/1e6:.2f} MB text", flush=True)
    t0 = T()
    compiled = lowered.compile()
    stamp("steps.compile", t0)

    t0 = T()
    b2, err = steps_jit(tile0)
    jax.block_until_ready(b2.columns)
    stamp("steps.run", t0)

    part_jit = jax.jit(lambda b: ex.agg_exec.tile_partial(b))
    t0 = T()
    low2 = part_jit.lower(b2)
    stamp("partial.lower", t0)
    print(f"partial HLO: {len(low2.as_text())/1e6:.2f} MB text", flush=True)
    t0 = T()
    low2.compile()
    stamp("partial.compile", t0)

    t0 = T()
    out = ex.run(prefetched_tiles=tiles)
    stamp("full run (warm?)", t0)
    print(len(out.to_pandas()), "rows", flush=True)


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 23
    main(sf, tile)
