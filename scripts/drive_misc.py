import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import velox_tpu as vt
from velox_tpu.dtypes import RowType
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan
from velox_tpu.exec.runner import LocalExecutor
from velox_tpu.config import QueryConfig
from velox_tpu.serde import serialize_page, deserialize_page, encode_unsaferow, decode_unsaferow
from velox_tpu.utils.stats import print_plan, collect_operator_stats
from velox_tpu.utils.trace import trace_context, status

rng = np.random.default_rng(2)
t = Table(RowType(["k","v"],[vt.BIGINT]*2), {"k": rng.integers(0,300,2000), "v": rng.integers(0,100,2000)})
plan = (PlanBuilder().table_scan(t).filter("v > 10")
        .aggregation(["k"], ["sum(v) as s", "count(*) as c"]).orderby(["k"]).build())
# spill forced vs not — identical
a = LocalExecutor(plan, tile_rows=128).run().to_pandas()
b = LocalExecutor(plan, tile_rows=128, config=QueryConfig(spill_bytes_threshold=1)).run().to_pandas()
import pandas as pd; pd.testing.assert_frame_equal(a, b)
print("forced-spill parity: OK,", len(a), "groups")
# serde round-trips through files
buf = serialize_page(t)
print("page:", len(buf), "bytes; roundtrip:", deserialize_page(buf).num_rows, "rows")
rows = encode_unsaferow(t.select(["k"]))
print("unsaferow:", len(rows), "rows,", len(rows[0]), "bytes/row")
# stats and tracing
with trace_context("Demo"):
    print(status())
print(print_plan(plan, collect_operator_stats(plan)))
# probe: corrupt page
bad = bytearray(buf); bad[100] ^= 0xFF
try: deserialize_page(bytes(bad))
except ValueError as e: print("probe corrupt page ->", e)
# probe: pool exhaustion error text
from velox_tpu.exec.memory import MemoryPool, MemoryPoolError
p = MemoryPool("q", limit=10)
try: p.reserve(100)
except MemoryPoolError as e: print("probe pool limit ->", str(e)[:60])
