"""Pallas TPU kernels for hot scan paths.

Reference counterpart: the reference's closest analog is Wave, the CUDA
operator runtime (velox/experimental/wave/exec/ExprKernel.cu) that replaces
operator subsequences with accelerator programs.  Here the whole engine is
already device-native; Pallas is the escape hatch where XLA's fusion or memory
scheduling can be beaten by hand (SURVEY.md §7: "pallas kernels for the rest").

First kernel: ``selective_sum`` — a fused predicate + exact wide-sum over
HBM-resident int columns, the inner loop of TPC-H Q6-class scans.  The
predicate arrives as per-column [lo, hi] inclusive bands (the engine's pushed
range filters); the sum accumulates in two 32-bit limbs so int64 products
cannot wrap (same scheme as exec/aggregates.py's wide sums).

The kernel exists to be *benchmarked honestly* against the XLA-fused
equivalent (scripts/bench_pallas.py); the executor keeps whichever wins.  On
CPU it runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 512 * 1024  # rows per grid step: 4 MB/column of int64 in VMEM


def _kernel(n_filters: int, value_ref, *refs):
    # refs layout: f0_ref .. f{k-1}_ref, bounds_ref (SMEM), hi_ref, lo_ref, cnt_ref
    filter_refs = refs[:n_filters]
    bounds_ref = refs[n_filters]
    hi_ref, lo_ref, cnt_ref = refs[n_filters + 1 :]
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hi_ref[0, 0] = jnp.int64(0)
        lo_ref[0, 0] = jnp.int64(0)
        cnt_ref[0, 0] = jnp.int64(0)

    mask = None
    for k, fr in enumerate(filter_refs):
        v = fr[:]
        m = (v >= bounds_ref[k, 0]) & (v <= bounds_ref[k, 1])
        mask = m if mask is None else (mask & m)
    v = value_ref[:]
    if mask is None:
        sel = v
        ones = jnp.ones_like(v)
    else:
        sel = jnp.where(mask, v, jnp.zeros_like(v))
        ones = jnp.where(mask, jnp.ones_like(v), jnp.zeros_like(v))
    hi_ref[0, 0] += jnp.sum(sel >> 32)
    lo_ref[0, 0] += jnp.sum(sel & jnp.int64(0xFFFFFFFF))
    cnt_ref[0, 0] += jnp.sum(ones)


@functools.partial(jax.jit, static_argnames=("n_filters", "interpret"))
def _selective_sum_call(values, filters, bounds, n_filters, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = values.shape[0]
    block = min(_BLOCK, n)
    grid = (max(1, -(-n // block)),)
    kernel = functools.partial(_kernel, n_filters)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block,), lambda i: (i,))]
        * (1 + n_filters)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.int64)] * 3,
        interpret=interpret,
    )(values, *filters, bounds)
    return out


def selective_sum(
    values: jax.Array,
    filters: Sequence[jax.Array],
    bounds: Sequence[Tuple[int, int]],
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """sum/count of ``values`` rows where every filters[k] is within bounds[k].

    Returns (hi_limb, lo_limb, count); exact value = hi * 2**32 + lo.
    """
    b = jnp.asarray(np.asarray(bounds, dtype=np.int64).reshape(len(bounds), 2))
    hi, lo, cnt = _selective_sum_call(
        values.astype(jnp.int64),
        tuple(f.astype(jnp.int64) for f in filters),
        b,
        n_filters=len(filters),
        interpret=interpret,
    )
    return hi[0, 0], lo[0, 0], cnt[0, 0]


def selective_sum_xla(values, filters, bounds):
    """The XLA-fused equivalent, for benchmarking and as the fallback."""
    mask = None
    for f, (lo_b, hi_b) in zip(filters, bounds):
        m = (f >= lo_b) & (f <= hi_b)
        mask = m if mask is None else (mask & m)
    v = values.astype(jnp.int64)
    sel = v if mask is None else jnp.where(mask, v, 0)
    ones = (
        jnp.ones_like(v)
        if mask is None
        else jnp.where(mask, 1, 0).astype(jnp.int64)
    )
    return (
        jnp.sum(sel >> 32),
        jnp.sum(sel & jnp.int64(0xFFFFFFFF)),
        jnp.sum(ones),
    )
