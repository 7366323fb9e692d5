"""Q3 SF1 phase timing on the real chip with forced-fetch timing (dev tool).

Breaks the single-tile Q3 program into its stages and times each with a
scalar fetch (block_until_ready is unreliable through the tunnel)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from velox_tpu.connectors.tpch import plans as tp
from velox_tpu.exec.runner import LocalExecutor, apply_streaming

T = time.perf_counter


def force_batch(b):
    return float(jnp.asarray(b.columns[0].values).reshape(-1)[0])


def timeit(label, fn, *args, reps=3):
    fn(*args)  # warm (compile)
    best = 1e9
    for _ in range(reps):
        t0 = T()
        fn(*args)
        best = min(best, T() - t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return best


def main():
    t0 = T()
    tables = tp.load_query_tables(3, 1.0)
    print("load", round(T() - t0, 1), flush=True)
    plan = tp.build_query(3, tables)
    t0 = T()
    ex = LocalExecutor(plan, tile_rows=1 << 23)
    print("build(execs+joins)", round(T() - t0, 1), "kind", ex.kind, flush=True)
    t0 = T()
    tiles = ex.device_tiles()
    jax.block_until_ready([t.columns for t in tiles])
    print("ingest", round(T() - t0, 1), "tiles", len(tiles), flush=True)
    tile = tiles[0]

    # full run (reference number)
    timeit("full run", lambda: ex.run(prefetched_tiles=tiles))

    # stage 1: filter+project+join probe
    steps_jit = jax.jit(
        lambda b: apply_streaming(b, ex.lin.steps), donate_argnums=()
    )
    b2, err = steps_jit(tile)
    timeit("steps(filter+join)", lambda: force_batch(steps_jit(tile)[0]))

    # stage 2: grouping partial
    agg = ex.agg_exec
    part_jit = jax.jit(lambda b: agg.tile_partial(b))
    part = part_jit(b2)
    timeit(
        "tile_partial", lambda: float(jnp.asarray(part_jit(b2)[2]).reshape(()))
    )

    # stage 2b: the join probe WITHOUT the output-column gathers
    je = None
    pre_steps = []
    for s in ex.lin.steps:
        if s[0] == "join":
            je = s[1]
            break
        pre_steps.append(s)
    if je is not None:
        pre_jit = jax.jit(lambda b: apply_streaming(b, pre_steps)[0])
        b2_pre = pre_jit(tile)
        def probe_only(b):
            cap = b.capacity
            vals = []
            import jax.numpy as jnp

            key_ok = jnp.ones((cap,), jnp.bool_)
            for k in je.node.left_keys:
                v, val = b.column(k).decode(cap)
                vals.append(v)
                if val is not None:
                    key_ok = key_ok & val
            pk = vals[0].astype(jnp.int64)
            perm, pos, hit, live = je._lookup_sorted(
                pk, b.active_mask(), key_ok
            )
            return perm

        pj = jax.jit(probe_only)
        timeit(
            "lookup_sorted only",
            lambda: float(jnp.asarray(pj(b2_pre)).reshape(-1)[0]),
        )

    print("done", flush=True)


if __name__ == "__main__":
    main()
