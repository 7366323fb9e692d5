#!/usr/bin/env python
"""Where does Q3's executor BUILD time go? (round-4 verdict weak #7: 8.65 s
host-side build; target < 2 s warm).

cProfile over LocalExecutor construction with warm XLA caches, plus wall
timers around the two join-bridge builds.  Run on the chip.
"""

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, ".")

import velox_tpu  # noqa: F401, E402
from velox_tpu.connectors.tpch import plans as tp  # noqa: E402
from velox_tpu.exec.runner import LocalExecutor  # noqa: E402


def main():
    tables = tp.load_query_tables(3, 1.0)
    plan = tp.build_query(3, tables)

    # warm run: compiles populate the in-process + persistent caches
    t0 = time.perf_counter()
    ex = LocalExecutor(plan, tile_rows=1 << 24)
    print(f"cold build: {time.perf_counter() - t0:.2f}s", flush=True)
    tiles = ex.device_tiles()
    ex.run(prefetched_tiles=tiles)
    del ex

    # measured build: same process, all programs compiled
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    ex2 = LocalExecutor(plan, tile_rows=1 << 24)
    pr.disable()
    print(f"warm build: {time.perf_counter() - t0:.2f}s", flush=True)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
