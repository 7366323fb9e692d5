#!/usr/bin/env python
"""Time the Pallas grouped-sum kernel (ops/pallas_group_sum.py) against the
variadic-reduce XLA formulation on the chip — chained-K with a REAL
perturbation (bench_group_reduce.py methodology)."""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import velox_tpu  # noqa: F401, E402
from velox_tpu.ops.pallas_group_sum import grouped_int64_sums  # noqa: E402

CAP = 1 << 23
G = 8
NCOLS = 10
K = 9


def main():
    print(f"backend={jax.default_backend()} cap={CAP} G={G} ncols={NCOLS}",
          flush=True)
    keys = jax.random.split(jax.random.PRNGKey(0), NCOLS + 2)
    cols = tuple(
        jax.random.randint(keys[i], (CAP,), 0, 1 << 40, dtype=jnp.int64)
        for i in range(NCOLS)
    )
    gids = jax.random.randint(keys[-2], (CAP,), 0, G, dtype=jnp.int32)
    mask = jax.random.uniform(keys[-1], (CAP,)) < 0.97

    # correctness vs numpy on a small prefix
    small = 1 << 13
    got = grouped_int64_sums(
        tuple(c[:small] for c in cols), gids[:small], mask[:small], G
    )
    cn = [np.asarray(c[:small]) for c in cols]
    gn, mn = np.asarray(gids[:small]), np.asarray(mask[:small])
    for c, o in zip(cn, got):
        exp = np.zeros(G, np.int64)
        np.add.at(exp, gn[mn], c[mn])
        np.testing.assert_array_equal(np.asarray(o), exp)
    print("exact on chip (small prefix)", flush=True)

    @jax.jit
    def chained(cs, gi, m, kk):
        def body(_, acc):
            bit = acc & jnp.int64(1)
            csp = tuple(c + bit for c in cs)
            outs = grouped_int64_sums(csp, gi, m, G)
            a2 = acc
            for o in outs:
                a2 = a2 + jnp.sum(o)
            return a2

        return jax.lax.fori_loop(0, kk, body, jnp.zeros((), jnp.int64))

    t0 = time.perf_counter()
    int(chained(cols, gids, mask, 1))
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)

    def best(kk, r=3):
        b = float("inf")
        for _ in range(r):
            t0 = time.perf_counter()
            int(chained(cols, gids, mask, kk))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, tk = best(1), best(K)
    per = (tk - t1) / (K - 1)
    total_bytes = sum(c.nbytes for c in cols) + gids.nbytes + mask.nbytes
    print(
        f"pallas_group_sum  {per*1e3:8.3f} ms/run  "
        f"{total_bytes/per/1e9:7.1f} GB/s eff",
        flush=True,
    )


if __name__ == "__main__":
    main()
