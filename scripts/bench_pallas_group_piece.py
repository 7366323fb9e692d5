#!/usr/bin/env python
"""Time the narrow grouped piece-sum kernel (ops/pallas_group_piece) at the
SF1 Q1 shape on the chip — chained-K with a data-dependent perturbation
(bench_group_reduce.py methodology: block_until_ready is a no-op through
the tunnel, so we difference K-chained vs 1 dispatched program)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.ops.pallas_group_piece import (
    PIECE_MAX_PALLAS,
    Factor,
    grouped_piece_sums,
    grouped_piece_sums_xla,
    plan_spec,
)

CAP = 1 << 23
G = 6
K = 9


def time_best(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"backend={jax.default_backend()} cap={CAP} G={G}", flush=True)
    rng = np.random.default_rng(0)
    ep = rng.integers(90000, 10500000, CAP).astype(np.int32)
    qty = rng.integers(100, 5001, CAP).astype(np.int16)
    d = rng.integers(0, 11, CAP).astype(np.int8)
    t = rng.integers(0, 9, CAP).astype(np.int8)
    gid = rng.integers(0, G, CAP).astype(np.int8)
    gid[rng.random(CAP) < 0.02] = -1

    f_ep = Factor(0, 1, 0, 90000, 10500000)
    f_qty = Factor(1, 1, 0, 100, 5000)
    f_d = Factor(2, 1, 0, 0, 10)
    f_1md = Factor(2, -1, 100, 90, 100)
    f_1pt = Factor(3, 1, 100, 100, 108)
    pmax = None if "--xla" in sys.argv else PIECE_MAX_PALLAS
    plans = tuple(
        plan_spec(s, **({} if pmax is None else {"piece_max": pmax}))
        for s in (
            [f_qty], [f_ep], [f_ep, f_1md], [f_ep, f_1md, f_1pt], [f_d], [],
        )
    )
    npieces = sum(p.n_chunks for p in plans)
    print(f"pieces={npieces} plans={[ (p.n_prefix, p.chunk_w, p.n_chunks) for p in plans ]}",
          flush=True)

    cols = tuple(jnp.asarray(c) for c in (ep, qty, d, t))
    gidj = jnp.asarray(gid)

    impl0 = (grouped_piece_sums_xla
             if "--xla" in sys.argv else grouped_piece_sums)
    # correctness on-chip vs numpy (prefix)
    small_n = 1 << 13
    got = impl0(
        tuple(c[:small_n] for c in cols), gidj[:small_n], plans, G
    )
    gn = gid[:small_n]
    live = gn >= 0
    arrs = [ep, qty, d, t]
    for plan, o in zip(plans, got):
        v = np.ones(small_n, np.int64)
        for f in plan.factors:
            v = v * (f.scale * arrs[f.col][:small_n].astype(np.int64) + f.offset)
        e = np.zeros(G, np.int64)
        np.add.at(e, gn[live], v[live])
        np.testing.assert_array_equal(np.asarray(o), e)
    print("exact on chip (8k prefix)", flush=True)

    impl = (grouped_piece_sums_xla
            if "--xla" in sys.argv else grouped_piece_sums)

    @jax.jit
    def chained(cs, gi, kk):
        def body(_, acc):
            bit = (acc & jnp.int64(1)).astype(jnp.int32)
            csp = (cs[0] + bit,) + cs[1:]
            outs = impl(csp, gi, plans, G)
            a2 = acc
            for o in outs:
                a2 = a2 + jnp.sum(o)
            return a2

        return jax.lax.fori_loop(0, kk, body, jnp.zeros((), jnp.int64))

    int(chained(cols, gidj, 1))  # compile + warm
    t1 = time_best(lambda: int(chained(cols, gidj, 1)))
    tk = time_best(lambda: int(chained(cols, gidj, K)))
    per = (tk - t1) / (K - 1)
    bytes_read = sum(c.dtype.itemsize for c in cols + (gidj,)) * CAP
    print(
        f"t1={t1*1e3:.2f}ms tK={tk*1e3:.2f}ms per_run={per*1e3:.3f}ms "
        f"bytes={bytes_read/1e6:.0f}MB eff={bytes_read/per/1e9:.0f}GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
