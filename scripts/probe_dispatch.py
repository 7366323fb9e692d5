#!/usr/bin/env python
"""Measure the device tunnel's dispatch behavior: per-dispatch latency,
whether dependent dispatches pipeline, and the cost of a scalar sync.

Drives the split-dispatch design (docs/roadmap.md): if dispatches pipeline
asynchronously, only SYNC points (scalar fetches) cost a round trip and
fusing glue programs buys little; if every dispatch blocks ~latency, the
fusion work is the whole game.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import velox_tpu  # noqa: F401  (x64 + cache)

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    n = 1 << 22  # 4M int64 = 32 MB — shared-sort-tile-ish
    x = jnp.arange(n, dtype=jnp.int64)

    @jax.jit
    def step(a):
        return a + 1

    @jax.jit
    def heavy(a):
        return jax.lax.sort([a], num_keys=1)[0]

    # warm
    jax.block_until_ready(step(x))
    jax.block_until_ready(heavy(x))

    def timed(label, fn, reps=5):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:.1f} ms", file=sys.stderr)
        return best

    # 1 dependent tiny dispatch, synced
    timed("1 tiny dispatch + sync", lambda: jax.block_until_ready(step(x)))

    # K dependent tiny dispatches, one sync at the end
    def chainK(k):
        a = x
        for _ in range(k):
            a = step(a)
        jax.block_until_ready(a)

    t1 = timed("1 chained + sync", lambda: chainK(1))
    t8 = timed("8 chained + sync", lambda: chainK(8))
    t32 = timed("32 chained + sync", lambda: chainK(32))
    print(
        f"per-extra-dispatch cost: {(t32 - t1) / 31 * 1e3:.1f} ms "
        f"({'pipelined' if (t8 - t1) < 3 * t1 else 'blocking'})",
        file=sys.stderr,
    )

    # scalar fetch (sync) cost
    s = jnp.sum(x)
    jax.block_until_ready(s)
    timed("scalar fetch int()", lambda: int(jnp.sum(x)))

    # a canonical-sort-sized dispatch
    timed("sort dispatch + sync", lambda: jax.block_until_ready(heavy(x)))

    # K dependent sorts, one sync
    def sortK(k):
        a = x
        for _ in range(k):
            a = heavy(a)
        jax.block_until_ready(a)

    ts1 = timed("1 sort + sync", lambda: sortK(1))
    ts4 = timed("4 sorts + sync", lambda: sortK(4))
    print(f"per-extra-sort: {(ts4 - ts1) / 3 * 1e3:.1f} ms", file=sys.stderr)

    # mixed: tiny between sorts (the split-pipeline shape)
    def mixed(k):
        a = x
        for _ in range(k):
            a = heavy(step(a))
        jax.block_until_ready(a)

    tm1 = timed("1 (glue+sort) + sync", lambda: mixed(1))
    tm4 = timed("4 (glue+sort) + sync", lambda: mixed(4))
    print(
        f"per-extra-(glue+sort): {(tm4 - tm1) / 3 * 1e3:.1f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
