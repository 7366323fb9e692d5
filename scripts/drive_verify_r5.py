#!/usr/bin/env python
"""/verify drive: exercise the public surface end-to-end, including the new
SEQUENCE/BIAS encodings feeding a plan (filter+project+agg) vs the oracle."""

import os
import sys

if os.environ.get("VELOX_DRIVE_CPU"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import velox_tpu as vt
from velox_tpu import Batch, Column, RowType

print(f"backend={jax.default_backend()}", flush=True)

# Batch mixing all five encodings
cap = 8
base = Column.from_numpy(np.array([10, 20, 30], dtype=np.int64), vt.BIGINT)
seq = Column.sequence(base, [3, 3, 2], capacity=cap)
bias = Column.bias(1000, np.arange(cap, dtype=np.int8), vt.BIGINT)
flat = Column.from_numpy(np.arange(cap, dtype=np.int64), vt.BIGINT)
const = Column.constant(5, vt.BIGINT)
dict_base = Column.from_numpy(np.array([1, 2], dtype=np.int64), vt.BIGINT)
dct = Column.dictionary(
    np.arange(cap, dtype=np.int32) % 2, dict_base,
)
schema = RowType(
    ["s", "b", "f", "c", "d"], [vt.BIGINT] * 5
)
batch = Batch.make(schema, [seq, bias, flat, const, dct], cap)
for name in schema.names:
    vals, _ = batch.column(name).to_numpy(cap)
    print(name, vals.tolist(), flush=True)

s_vals, _ = batch.column("s").to_numpy(cap)
assert s_vals.tolist() == [10, 10, 10, 20, 20, 20, 30, 30]
b_vals, _ = batch.column("b").to_numpy(cap)
assert b_vals.tolist() == [1000 + i for i in range(cap)]

# plan: scan -> filter -> project -> aggregate, vs numpy oracle
from velox_tpu.io.table import Table
from velox_tpu.plan.builder import PlanBuilder
from velox_tpu.exec.runner import LocalExecutor

rng = np.random.default_rng(0)
n = 4000
k = rng.integers(0, 4, n)
v = rng.integers(0, 1000, n)
w = rng.normal(size=n)
tab = Table(
    RowType(["k", "v", "w"], [vt.BIGINT, vt.BIGINT, vt.DOUBLE]),
    {"k": k.astype(np.int64), "v": v.astype(np.int64), "w": w},
)
plan = (
    PlanBuilder()
    .table_scan(tab)
    .filter("v >= 100")
    .project(["k", "v * 2 + 1 as v2", "w"])
    .aggregation(["k"], ["sum(v2)", "avg(w)", "count(*)"])
    .build()
)
ex = LocalExecutor(plan)
out = ex.run()
df = out.to_pandas()
sel = v >= 100
import collections

exp_sum = collections.defaultdict(int)
exp_wsum = collections.defaultdict(float)
exp_cnt = collections.defaultdict(int)
for ki, vi, wi in zip(k[sel], v[sel], w[sel]):
    exp_sum[ki] += vi * 2 + 1
    exp_wsum[ki] += wi
    exp_cnt[ki] += 1
names = list(out.schema.names)
got = {
    int(row[names[0]]): (int(row[names[1]]), float(row[names[2]]), int(row[names[3]]))
    for _, row in df.iterrows()
}
for kk in exp_cnt:
    s, a, c = got[kk]
    assert s == exp_sum[kk], (kk, s, exp_sum[kk])
    assert c == exp_cnt[kk]
    assert abs(a - exp_wsum[kk] / exp_cnt[kk]) < 1e-9
print("plan filter+project+agg parity OK", flush=True)
print("DRIVE PASS", flush=True)
