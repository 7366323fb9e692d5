"""Measure jax.lax.sort cost configurations on the real TPU chip.

Sizes the opportunity for packed single-operand sorts vs multi-operand sorts
(exec/grouping.py sorts [liveness] + keys + [perm] with num_keys=1+len(keys)).
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = 1 << 22  # 4M
    rng = np.random.default_rng(0)
    k64 = jnp.asarray(rng.integers(0, 1 << 40, n, dtype=np.int64))
    k32 = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
    mask = jnp.asarray(rng.random(n) < 0.5)
    perm = jnp.arange(n, dtype=jnp.int32)
    payload = [jnp.asarray(rng.integers(0, 1 << 40, n, dtype=np.int64)) for _ in range(3)]

    print("backend:", jax.devices(), file=sys.stderr)

    f1 = jax.jit(lambda k: jax.lax.sort([k], num_keys=1)[0])
    print(f"single int64 sort 4M:           {timeit(f1, k64)*1e3:8.1f} ms")

    f1b = jax.jit(lambda k: jax.lax.sort([k], num_keys=1)[0])
    print(f"single int32 sort 4M:           {timeit(f1b, k32)*1e3:8.1f} ms")

    f2 = jax.jit(lambda k, p: jax.lax.sort([k, p], num_keys=1))
    print(f"int64 key + int32 payload:      {timeit(f2, k64, perm)*1e3:8.1f} ms")

    f3 = jax.jit(lambda m, k, p: jax.lax.sort([m, k, p], num_keys=2))
    print(f"mask + int64 key + payload:     {timeit(f3, mask, k64, perm)*1e3:8.1f} ms")

    def packed(m, k):
        # pack (liveness, key-hi-bits) into the key itself, payload separate
        kk = jnp.where(m, k, jnp.int64(1) << 62)
        return jax.lax.sort([kk, jnp.arange(kk.shape[0], dtype=jnp.int32)], num_keys=1)

    f4 = jax.jit(packed)
    print(f"packed(mask into key) + payload:{timeit(f4, mask, k64)*1e3:8.1f} ms")

    def pack_idx(m, k):
        # (key<<22 | idx) single-operand sort; works when key fits 41 bits
        kk = jnp.where(m, k, (jnp.int64(1) << 40) - 1)
        merged = (kk << 22) | jnp.arange(kk.shape[0], dtype=jnp.int64)
        s = jax.lax.sort([merged], num_keys=1)[0]
        return s >> 22, (s & ((1 << 22) - 1)).astype(jnp.int32)

    f5 = jax.jit(pack_idx)
    print(f"fully packed single-operand:    {timeit(f5, mask, k64)*1e3:8.1f} ms")

    f6 = jax.jit(lambda m, k, p: jax.lax.sort([m, k] + p + [perm], num_keys=2))
    print(f"mask+key+3 payloads (6 ops):    {timeit(f6, mask, k64, payload)*1e3:8.1f} ms")

    g = jax.jit(lambda p, q: [jnp.take(x, q, mode="clip") for x in p])
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))
    print(f"gather 3x int64 via perm:       {timeit(g, payload, idx)*1e3:8.1f} ms")

    # segment-style ops for scale
    f7 = jax.jit(lambda k: jnp.cumsum(k))
    print(f"cumsum int64 4M:                {timeit(f7, k64)*1e3:8.1f} ms")

    n16 = 1 << 24  # 16M
    k64b = jnp.asarray(rng.integers(0, 1 << 40, n16, dtype=np.int64))
    f8 = jax.jit(lambda k: jax.lax.sort([k], num_keys=1)[0])
    print(f"single int64 sort 16M:          {timeit(f8, k64b)*1e3:8.1f} ms")
    f9 = jax.jit(lambda k, p: jax.lax.sort([k, p], num_keys=1))
    p16 = jnp.arange(n16, dtype=jnp.int32)
    print(f"int64 + payload sort 16M:       {timeit(f9, k64b, p16)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
