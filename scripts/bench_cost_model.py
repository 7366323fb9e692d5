"""On-chip primitive cost model (dev tool).

Times the primitives that decide operator design — lax.sort, gather, scatter,
segment-sum — with the CHAINED-dependent-iterations method: each jit runs the
primitive K times inside one dispatched program with a true data dependency
between iterations, so (t_K - t_1) / (K - 1) is the honest per-op time with
the host round-trip subtracted (VERDICT r2: block_until_ready alone used to
lie through the device tunnel).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import velox_tpu  # noqa: F401  (enables jax_enable_x64)
import jax
import jax.numpy as jnp
import numpy as np

ONLY = sys.argv[1] if len(sys.argv) > 1 else None  # primitive name filter
N = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 23)  # 8M
K = 5


def want(name):
    return ONLY is None or ONLY in name


def _force(r):
    """block_until_ready can be a no-op through the device tunnel (VERDICT
    r2); fetching one element guarantees the device work actually ran."""
    leaves = jax.tree_util.tree_leaves(r)
    return float(leaves[0].reshape(-1)[0])


def timed(fn, *args):
    _force(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, t1, tk, per_item_bytes=None):
    per = (tk - t1) / (K - 1)
    line = f"{name}: {per*1e3:8.3f} ms/op  (t1={t1*1e3:.1f} tK={tk*1e3:.1f})"
    if per_item_bytes:
        line += f"  {per_item_bytes * N / per / 1e9:7.1f} GB/s"
    print(line, flush=True)
    return per


def chain_jits(body):
    """(jit_k1, jit_kK) running `body(x) -> x'` 1 or K times, dependent."""

    def run(x, k):
        def step(i, acc):
            return body(acc)

        return jax.lax.fori_loop(0, k, step, x)

    return jax.jit(lambda x: run(x, 1)), jax.jit(lambda x: run(x, K))


key = jax.random.PRNGKey(0)
x64 = jax.random.randint(key, (N,), 0, 1 << 40, dtype=jnp.int64)
x32 = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)

print(f"n = {N} ({N/1e6:.1f}M rows)", flush=True)

# ---- 1-operand int64 sort ----
if want("sort1"):
    f1, fk = chain_jits(lambda a: jax.lax.sort([a ^ 2654435761], num_keys=1)[0])
    report("sort 1-op i64", timed(f1, x64), timed(fk, x64))

# ---- 2-operand sort (key + payload) ----
def s2(pair):
    a, b = pair
    k_, v_ = jax.lax.sort([a ^ 2654435761, b], num_keys=1)
    return (k_, v_)

if want("sort2"):
    f1, fk = chain_jits(s2)
    report("sort 2-op i64", timed(f1, (x64, x64)), timed(fk, (x64, x64)))

# ---- 1-operand int32 sort ----
if want("sort32"):
    f1, fk = chain_jits(
        lambda a: jax.lax.sort([a ^ jnp.int32(123456)], num_keys=1)[0]
    )
    report("sort 1-op i32", timed(f1, x32), timed(fk, x32))

# ---- gather: N int64 values by N random indices from an N-element table ----
table = x64
def g(idx):
    v = jnp.take(table, idx, mode="clip")
    return (idx + v.astype(jnp.int32)) & (N - 1)

if want("gather_big"):
    f1, fk = chain_jits(g)
    report("gather i64[N] by N idx", timed(f1, x32), timed(fk, x32), 8)

# ---- gather from a SMALL table (1M) ----
small = x64[: 1 << 20]
def gs(idx):
    v = jnp.take(small, idx & ((1 << 20) - 1), mode="clip")
    return (idx + v.astype(jnp.int32)) & (N - 1)

if want("gather_small"):
    f1, fk = chain_jits(gs)
    report("gather i64[1M] by N idx", timed(f1, x32), timed(fk, x32), 8)

# ---- scatter-add: N updates into 1M buckets ----
def sc(idx):
    acc = jnp.zeros((1 << 20,), jnp.int64).at[idx & ((1 << 20) - 1)].add(1)
    return (idx + acc[0].astype(jnp.int32)) & (N - 1)

if want("scatter_add"):
    f1, fk = chain_jits(sc)
    report("scatter-add N->1M", timed(f1, x32), timed(fk, x32), 8)

# ---- scatter-set: N writes into N slots ----
def ss(idx):
    out = jnp.zeros((N,), jnp.int32).at[idx].set(idx)
    return (idx + out[0]) & (N - 1)

if want("scatter_set"):
    f1, fk = chain_jits(ss)
    report("scatter-set N->N", timed(f1, x32), timed(fk, x32), 4)

# ---- cumsum over N int64 ----
def cs(a):
    return jnp.cumsum(a ^ 1) & ((1 << 40) - 1)

if want("cumsum"):
    f1, fk = chain_jits(cs)
    report("cumsum i64", timed(f1, x64), timed(fk, x64), 8)

# ---- elementwise pass (roofline sanity) ----
if want("xor"):
    f1, fk = chain_jits(lambda a: a ^ 2654435761)
    report("xor pass i64", timed(f1, x64), timed(fk, x64), 16)
