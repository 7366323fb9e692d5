#!/usr/bin/env python
"""Microbenchmark: grouped-aggregation formulations for the direct (kArray)
mode — the Q1 kernel (VERDICT r4 weak #3: 7% of device roofline).

Hypothesis: the per-accumulator masked reductions (ops/segmented.py
direct_group_reduce) each stream their input column from HBM, so ~20
accumulator arrays cost ~20 passes (measured 4.4 ms vs 0.32 ms SoL at SF1).
A single VARIADIC lax.reduce whose operands are fused (cap, G) contribution
producers should read every column once.

Timing: chained-K dependent executions inside one dispatched program
(bench.py methodology — a lazy tunnel cannot skip the work).

Run: python scripts/bench_group_reduce.py  (on the TPU chip)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import velox_tpu  # noqa: F401, E402  (x64 + cache config)

CAP = 1 << 23
G = 8
N_SUM64 = 10  # int64 sum accumulators (wide-sum limbs etc.)
N_SUMF = 3  # float64 sums
K = 9


def make_inputs(seed=0):
    """Generate ON DEVICE: uploading ~1 GB through the tunnel costs tens of
    minutes at its worst (measured round 5); jax.random costs nothing."""
    keys = jax.random.split(jax.random.PRNGKey(seed), N_SUM64 + N_SUMF + 2)
    cols64 = [
        jax.random.randint(
            keys[i], (CAP,), 0, 1 << 40, dtype=jnp.int64
        )
        for i in range(N_SUM64)
    ]
    colsf = [
        jax.random.uniform(keys[N_SUM64 + i], (CAP,), jnp.float64)
        for i in range(N_SUMF)
    ]
    gids = jax.random.randint(keys[-2], (CAP,), 0, G, dtype=jnp.int32)
    mask = jax.random.uniform(keys[-1], (CAP,)) < 0.97
    return cols64, colsf, gids, mask


def formulation_current(cols64, colsf, gids, mask):
    """Today's path: per-accumulator loop of per-group masked reductions."""
    outs = []
    for c in cols64 + colsf:
        ident = jnp.asarray(0, c.dtype)
        per_g = []
        for g in range(G):
            sel = mask & (gids == g)
            per_g.append(jnp.sum(jnp.where(sel, c, ident)))
        outs.append(jnp.stack(per_g))
    return tuple(outs)


def formulation_variadic_2d(cols64, colsf, gids, mask):
    """One variadic reduce; operands are fused (cap, G) producers."""
    garange = jnp.arange(G, dtype=gids.dtype)
    onehot = mask[:, None] & (gids[:, None] == garange[None, :])
    operands, inits = [], []
    for c in cols64 + colsf:
        ident = jnp.asarray(0, c.dtype)
        operands.append(jnp.where(onehot, c[:, None], ident))
        inits.append(ident)

    def comb(accs, xs):
        return tuple(a + x for a, x in zip(accs, xs))

    return jax.lax.reduce(
        tuple(operands), tuple(inits), comb, dimensions=(0,)
    )


def formulation_variadic_flat(cols64, colsf, gids, mask):
    """One variadic reduce; one (cap,) operand per (column, group)."""
    operands, inits = [], []
    for c in cols64 + colsf:
        ident = jnp.asarray(0, c.dtype)
        for g in range(G):
            sel = mask & (gids == g)
            operands.append(jnp.where(sel, c, ident))
            inits.append(ident)

    def comb(accs, xs):
        return tuple(a + x for a, x in zip(accs, xs))

    outs = jax.lax.reduce(
        tuple(operands), tuple(inits), comb, dimensions=(0,)
    )
    ncols = N_SUM64 + N_SUMF
    return tuple(
        jnp.stack(outs[i * G : (i + 1) * G]) for i in range(ncols)
    )


def formulation_gt_2d(cols64, colsf, gids, mask):
    """(G, cap) layout: reduce along lanes instead of sublanes."""
    garange = jnp.arange(G, dtype=gids.dtype)
    onehot = mask[None, :] & (gids[None, :] == garange[:, None])  # (G, cap)
    operands, inits = [], []
    for c in cols64 + colsf:
        ident = jnp.asarray(0, c.dtype)
        operands.append(jnp.where(onehot, c[None, :], ident))
        inits.append(ident)

    def comb(accs, xs):
        return tuple(a + x for a, x in zip(accs, xs))

    return jax.lax.reduce(
        tuple(operands), tuple(inits), comb, dimensions=(1,)
    )


def time_chained(fn, cols64, colsf, gids, mask, label):
    def fold(out):
        acc = jnp.zeros((), jnp.int64)
        for leaf in jax.tree_util.tree_leaves(out):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                acc = acc + jnp.nan_to_num(jnp.sum(leaf)).astype(jnp.int64)
            else:
                acc = acc + jnp.sum(leaf.astype(jnp.int64))
        return acc

    @jax.jit
    def chained(c64, cf, gi, m, kk):
        def body(_, acc):
            # REAL value-changing perturbation (acc & 1): exactness does not
            # matter for timing, and a provably-zero perturbation was
            # hoisted for the matmul/i32 formulations (measured: 1.7 TB/s
            # "effective" — above HBM physics)
            bit = (acc & jnp.int64(1))
            c64p = [c + bit for c in c64]
            cfp = [c + bit.astype(c.dtype) for c in cf]
            gip = gi + bit.astype(gi.dtype) * 0
            return acc + fold(fn(c64p, cfp, gip, m))

        return jax.lax.fori_loop(0, kk, body, jnp.zeros((), jnp.int64))

    t0 = time.perf_counter()
    int(chained(cols64, colsf, gids, mask, 1))
    compile_s = time.perf_counter() - t0

    def best(kk, r=3):
        b = float("inf")
        for _ in range(r):
            t0 = time.perf_counter()
            int(chained(cols64, colsf, gids, mask, kk))
            b = min(b, time.perf_counter() - t0)
        return b

    t1 = best(1)
    tk = best(K)
    per = (tk - t1) / (K - 1)
    total_bytes = sum(c.nbytes for c in cols64 + colsf) + gids.nbytes + mask.nbytes
    gbps = total_bytes / per / 1e9
    print(
        f"{label:24s} {per*1e3:8.3f} ms/run  {gbps:7.1f} GB/s eff  "
        f"(compile {compile_s:.1f}s)",
        flush=True,
    )
    return per


def main():
    print(f"backend={jax.default_backend()} cap={CAP} G={G} "
          f"cols={N_SUM64}xi64+{N_SUMF}xf64", flush=True)
    cols64, colsf, gids, mask = make_inputs()
    jax.block_until_ready(cols64)

    # correctness cross-check on small slice first
    small = 1 << 12
    s64 = [c[:small] for c in cols64]
    sf = [c[:small] for c in colsf]
    sg, sm = gids[:small], mask[:small]
    ref = [np.asarray(x) for x in formulation_current(s64, sf, sg, sm)]

    for name, fn in (
        ("variadic_2d", formulation_variadic_2d),
        ("variadic_flat", formulation_variadic_flat),
        ("gt_2d", formulation_gt_2d),
        ("onehot_matmul", formulation_onehot_matmul),
    ):
        got = [np.asarray(x) for x in fn(s64, sf, sg, sm)]
        for r, g2 in zip(ref, got):
            np.testing.assert_allclose(r, g2, rtol=1e-12)
        print(f"{name}: exact on small slice", flush=True)

    for name, fn in (
        ("current_per_acc", formulation_current),
        ("variadic_2d", formulation_variadic_2d),
        ("variadic_flat", formulation_variadic_flat),
        ("gt_2d", formulation_gt_2d),
        ("variadic_2d_i32", formulation_variadic_2d_i32),
        ("onehot_matmul", formulation_onehot_matmul),
    ):
        try:
            time_chained(fn, cols64, colsf, gids, mask, name)
        except Exception as e:
            print(f"{name}: FAILED {e!r}", flush=True)


def formulation_variadic_2d_i32(cols64, colsf, gids, mask):
    """Diagnosis: same as variadic_2d but int32 operands — if much faster,
    the limiter is int64-emulation COMPUTE, not HBM."""
    garange = jnp.arange(G, dtype=gids.dtype)
    onehot = mask[:, None] & (gids[:, None] == garange[None, :])
    operands, inits = [], []
    for c in cols64:
        c32 = c.astype(jnp.int32)
        ident = jnp.asarray(0, jnp.int32)
        operands.append(jnp.where(onehot, c32[:, None], ident))
        inits.append(ident)

    def comb(accs, xs):
        return tuple(a + x for a, x in zip(accs, xs))

    return jax.lax.reduce(
        tuple(operands), tuple(inits), comb, dimensions=(0,)
    )


def formulation_onehot_matmul(cols64, colsf, gids, mask):
    """MXU route: per-block one-hot matmul over 8-bit limbs in bf16, exact
    block partials in f32 (< 2^24), recombined in int64 with natural wrap."""
    BS = 4096
    n = cols64[0].shape[0]
    nb = n // BS
    garange = jnp.arange(G, dtype=jnp.int32)
    onehot = (
        (mask[:, None] & (gids[:, None] == garange[None, :]))
        .astype(jnp.bfloat16)
        .reshape(nb, BS, G)
    )
    limbs = []
    for c in cols64:
        u = c.astype(jnp.uint64)
        for i in range(8):
            limbs.append(((u >> jnp.uint64(8 * i)) & jnp.uint64(0xFF)).astype(jnp.bfloat16))
    lm = jnp.stack(limbs, axis=-1).reshape(nb, BS, len(limbs))  # (nb, BS, L)
    part = jnp.einsum(
        "brg,brl->bgl", onehot, lm, preferred_element_type=jnp.float32
    )
    s = jnp.sum(part.astype(jnp.int64), axis=0)  # (G, L)
    outs = []
    for ci in range(len(cols64)):
        acc = jnp.zeros((G,), jnp.int64)
        for i in range(8):
            acc = acc + (s[:, ci * 8 + i] << jnp.int64(8 * i))
        outs.append(acc)
    return tuple(outs)


if __name__ == "__main__":
    main()
