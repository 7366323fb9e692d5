import os, sys, traceback
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms", "cpu")
import pandas as pd
from velox_tpu.connectors.tpch import plans as tp
from velox_tpu.exec.runner import LocalExecutor
from velox_tpu.parallel.runner import DistributedExecutor, make_mesh

mesh = make_mesh(8)
SF = 0.01
ok, fail = [], []
for num in tp.implemented_queries():
    try:
        tables = tp.load_query_tables(num, SF)
        plan = tp.build_query(num, tables)
        local = LocalExecutor(plan, tile_rows=1 << 13).run().to_pandas()
        dist = DistributedExecutor(plan, mesh, per_device_rows=1 << 11).run().to_pandas()
        pd.testing.assert_frame_equal(local.reset_index(drop=True), dist.reset_index(drop=True))
        ok.append(num)
        print(f"q{num}: OK", flush=True)
    except Exception as e:
        fail.append(num)
        print(f"q{num}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
print("OK:", ok)
print("FAIL:", fail)
