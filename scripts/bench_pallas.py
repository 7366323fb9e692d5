#!/usr/bin/env python
"""Benchmark the Pallas selective-sum kernel vs the XLA-fused equivalent.

Run on the real TPU (default backend).  Prints both timings and which path
the engine should prefer; the kernel only earns its place if it wins here.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from velox_tpu.ops.pallas_kernels import selective_sum, selective_sum_xla

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    n = 1 << 22
    rng = np.random.default_rng(0)
    vals = jax.device_put(jnp.asarray(rng.integers(0, 10**10, n)))
    f1 = jax.device_put(jnp.asarray(rng.integers(0, 100, n)))
    f2 = jax.device_put(jnp.asarray(rng.integers(0, 2400, n)))
    bounds = [(5, 7), (0, 1200)]

    xla = jax.jit(lambda v, a, b: selective_sum_xla(v, [a, b], bounds))
    r1 = xla(vals, f1, f2)
    jax.block_until_ready(r1)

    interp = jax.default_backend() != "tpu"
    try:
        r2 = selective_sum(vals, [f1, f2], bounds, interpret=interp)
        jax.block_until_ready(r2)
        pallas_ok = True
    except Exception as e:  # Mosaic lowering failure — report, keep XLA path
        print(f"pallas compile failed: {type(e).__name__}: {e}", file=sys.stderr)
        pallas_ok = False

    def best(fn, reps=20):
        t = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            t = min(t, time.perf_counter() - t0)
        return t

    t_xla = best(lambda: xla(vals, f1, f2))
    bw = 3 * n * 8 / t_xla / 1e9
    print(f"xla fused:  {t_xla*1e6:9.1f} us  ({bw:.0f} GB/s effective)")
    if pallas_ok:
        t_p = best(
            lambda: selective_sum(vals, [f1, f2], bounds, interpret=interp)
        )
        bwp = 3 * n * 8 / t_p / 1e9
        print(f"pallas:     {t_p*1e6:9.1f} us  ({bwp:.0f} GB/s effective)")
        assert int(r1[2]) == int(r2[2]), "count mismatch"
        print(f"winner: {'pallas' if t_p < t_xla else 'xla'}")


if __name__ == "__main__":
    main()
