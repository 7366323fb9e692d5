"""Measure jax.lax.sort cost configurations on the real TPU chip, honestly.

Sizes the opportunity for packed single-operand sorts vs multi-operand
sorts (exec/grouping.py sorts [liveness] + keys + [perm] with
num_keys=1+len(keys)) and for int32-vs-int64 keys.

Timing methodology (round-2 VERDICT item 1): block_until_ready does NOT
block through the device tunnel, so each configuration chains K dependent
sorts inside ONE dispatched program (a tuple optimization_barrier carries a
zero that depends on the previous iteration, so passes cannot collapse or
hoist) and reports (T(K) - T(1)) / (K - 1) with a forced scalar fetch.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 9


def chained(fn):
    """fn(ops) -> list of sorted arrays; returns jitted chained timer."""

    @jax.jit
    def run(ops, kk):
        def body(_, acc):
            _, zero = jax.lax.optimization_barrier(
                (acc, jnp.zeros((), jnp.int64))
            )
            perturbed = [o + zero.astype(o.dtype) for o in ops]
            outs = fn(perturbed)
            a = jnp.zeros((), jnp.int64)
            for o in outs:
                a = a + jnp.sum(o.astype(jnp.int64))
            return acc + a

        return jax.lax.fori_loop(0, kk, body, jnp.zeros((), jnp.int64))

    return run


def per_pass(fn, ops, repeats=3):
    run = chained(fn)
    int(run(ops, 1))  # compile + warm (one program; kk is dynamic)

    def best(kk):
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            int(run(ops, kk))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(K) - best(1)) / (K - 1), 1e-9)


def main():
    n = 1 << 22  # 4M
    rng = np.random.default_rng(0)
    k64 = jnp.asarray(rng.integers(0, 1 << 40, n, dtype=np.int64))
    k32 = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
    k20 = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.int32))
    perm = jnp.arange(n, dtype=jnp.int32)
    pay64 = [
        jnp.asarray(rng.integers(0, 1 << 40, n, dtype=np.int64))
        for _ in range(3)
    ]
    pay32 = [p.astype(jnp.int32) for p in pay64]

    print("backend:", jax.devices(), file=sys.stderr)

    cases = [
        ("sort 4M int64 key alone", [k64],
         lambda o: jax.lax.sort(o, num_keys=1)),
        ("sort 4M int32 key alone", [k32],
         lambda o: jax.lax.sort(o, num_keys=1)),
        ("sort 4M int32 narrow(20b) key", [k20],
         lambda o: jax.lax.sort(o, num_keys=1)),
        ("int64 key + int32 perm", [k64, perm],
         lambda o: jax.lax.sort(o, num_keys=1)),
        ("int32 key + int32 perm", [k32, perm],
         lambda o: jax.lax.sort(o, num_keys=1)),
        ("int64 key + 3 int64 payloads", [k64] + pay64,
         lambda o: jax.lax.sort(o, num_keys=1)),
        ("int64 key + 3 int32 payloads", [k64] + pay32,
         lambda o: jax.lax.sort(o, num_keys=1)),
        ("2-key (int64,int64) + perm", [k64, pay64[0], perm],
         lambda o: jax.lax.sort(o, num_keys=2)),
        ("argsort-then-3-gathers", [k64] + pay64,
         lambda o: (
             lambda s: [s[0]] + [jnp.take(p, s[1]) for p in o[1:]]
         )(jax.lax.sort([o[0], jnp.arange(o[0].shape[0], dtype=jnp.int32)],
                        num_keys=1))),
        ("cummax scan over 8M", [jnp.concatenate([k64, k64])],
         lambda o: [jax.lax.cummax(o[0])]),
        ("gather 4M random int64", [pay64[0], k32],
         lambda o: [jnp.take(o[0], (o[1] & (n - 1)), mode="clip")]),
    ]
    results = {}
    for name, ops, fn in cases:
        s = per_pass(fn, ops)
        results[name] = s
        print(f"{name:36s} {s*1e3:9.2f} ms", flush=True)
    import json

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
