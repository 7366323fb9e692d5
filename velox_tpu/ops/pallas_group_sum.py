"""Pallas TPU kernel: exact grouped int64 sums in ONE pass over the data.

The Q1-class bottleneck (round-4 verdict weak #3): array-mode grouped
aggregation emits per-(accumulator, group) masked reductions; XLA fuses
per-operand but still streams the inputs several times and burns VPU time on
int64-emulated compare/select/add per group — measured ceiling ~115 GB/s
effective on v5e (scripts/bench_group_reduce.py) against a ~500 GB/s HBM
roofline.

This kernel reads every column once and turns the per-group routing into an
MXU matmul:

  per block of BS rows:
    onehot[g, r] = (gids[r] == g) & mask[r]                 (f32, G x BS)
    limbs[l, r]  = (col_c >> 7*i) & 0x7F  (l = c*10+i)      (f32, L x BS)
    acc[g, l]   += onehot @ limbs^T                          (MXU, f32->i32)

Exactness: 7-bit limbs make every block partial <= BS*127 (f32-exact far
below 2^24) and every int32 accumulator <= N*127 (exact to N = 2^24 rows per
... < 2^31/127 = 16.9M rows per tile — above the engine's 2^24-row tile
ceiling).  Arithmetic right shifts reassemble two's complement exactly mod
2^64, so the int64 recombination (sum of limb sums << 7i, natural wrap)
equals XLA's wrapping int64 sum for ANY signs.

Reference counterpart: single-pass accumulator updates over group pointers,
velox/exec/GroupingSet.cpp:294; the MXU routing trick replaces the CPU's
scattered writes.

MEASURED VERDICT (round 5, v5e behind the axon tunnel): the kernel is exact
in interpreter mode (selfcheck below) but CANNOT run on this TPU stack —
its X64 rewriter rejects ANY pallas custom-call with a 64-bit operand
("While rewriting computation to not contain X64 element types, XLA
encountered an HLO for which this rewriting is not implemented:
pallas_call ... operand_layout_constraints={s64[...]}"), and in-kernel
int64 converts either recurse (int64->int32) or crash the remote compiler
(int64->f32).  Splitting the int64 inputs into int32 pairs outside the
kernel materializes ~2x the bytes and lands at the XLA onehot-matmul
formulation's measured 6.5 ms (scripts/bench_group_reduce.py) — worse than
the variadic reduce.  The production path is therefore
ops/segmented.direct_group_reduce_batch (one variadic XLA reduce: 7.9 ms
vs the 10.3 ms per-accumulator loop at the benchmark shape, with the
measured int64-emulation compute ceiling of ~115 GB/s vs 327 GB/s for
int32 data).  This kernel stays as the ready implementation for a stack
whose Mosaic accepts 64-bit operands.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

N_LIMBS = 10  # 7-bit limbs: 70 bits covers int64 two's complement
_LIMB_BITS = 7
_BS = 2048  # rows per grid step


_SUB = 16  # sublanes per block; block rows = _SUB * 128 = _BS


def _kernel(ncols: int, g_pad: int, *refs):
    from jax.experimental import pallas as pl

    col_refs = refs[:ncols]
    gid_ref, mask_ref = refs[ncols], refs[ncols + 1]
    out_ref = refs[ncols + 2]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    gids = gid_ref[0]  # (_SUB, 128) int32
    mask = mask_ref[0]  # (_SUB, 128) int32 (0/1)
    garange = jax.lax.broadcasted_iota(
        jnp.int32, (g_pad, _SUB, 128), 0
    )
    onehot = (
        (gids[None, :, :] == garange) & (mask[None, :, :] > 0)
    ).astype(jnp.float32)  # (G, _SUB, 128)
    limb_rows: List[jax.Array] = []
    for c in range(ncols):
        col = col_refs[c][0]  # (_SUB, 128) int64
        for li in range(N_LIMBS):
            limb = (
                (col >> jnp.int64(_LIMB_BITS * li)) & jnp.int64(0x7F)
            ).astype(jnp.int32)
            limb_rows.append(limb.astype(jnp.float32))
    limbs = jnp.stack(limb_rows, axis=0)  # (L, _SUB, 128)
    acc = jnp.zeros((g_pad, len(limb_rows)), jnp.float32)
    for s in range(_SUB):
        acc = acc + jax.lax.dot_general(
            onehot[:, s, :],
            limbs[:, s, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, L)
    out_ref[:, :] += acc.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "interpret")
)
def grouped_int64_sums(
    cols,
    gids: jax.Array,
    mask: jax.Array,
    num_groups: int,
    interpret: bool = False,
):
    """[num_groups] wrapping int64 sum per group for every column.

    cols: tuple of (cap,) int64 arrays; gids int32; mask bool.
    cap must be a multiple of 2048 (the engine's tile buckets are).
    Returns a tuple of (num_groups,) int64 arrays.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cols = tuple(cols)
    ncols = len(cols)
    cap = cols[0].shape[0]
    assert cap % _BS == 0, f"capacity {cap} not a multiple of {_BS}"
    nb = cap // _BS
    g_pad = max(8, -(-num_groups // 8) * 8)
    L = ncols * N_LIMBS

    cols2 = [c.reshape(nb, _SUB, 128) for c in cols]
    gid2 = gids.astype(jnp.int32).reshape(nb, _SUB, 128)
    mask2 = mask.astype(jnp.int32).reshape(nb, _SUB, 128)

    row_spec = pl.BlockSpec(
        (1, _SUB, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, ncols, g_pad),
        grid=(nb,),
        in_specs=[row_spec] * (ncols + 2),
        out_specs=pl.BlockSpec(
            (g_pad, L), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g_pad, L), jnp.int32),
        interpret=interpret,
    )(*cols2, gid2, mask2)

    results = []
    for c in range(ncols):
        acc = jnp.zeros((num_groups,), jnp.int64)
        for li in range(N_LIMBS):
            acc = acc + (
                out[:num_groups, c * N_LIMBS + li].astype(jnp.int64)
                << jnp.int64(_LIMB_BITS * li)
            )
        results.append(acc)
    return tuple(results)


def selfcheck(seed: int = 0, cap: int = 1 << 14, ncols: int = 3, G: int = 8,
              interpret: bool = True) -> None:
    """Exactness check against numpy, including negative values and wrap."""
    rng = np.random.default_rng(seed)
    cols = [
        rng.integers(-(1 << 62), 1 << 62, cap, dtype=np.int64)
        for _ in range(ncols)
    ]
    gids = rng.integers(0, G, cap, dtype=np.int32)
    mask = rng.random(cap) < 0.9
    got = grouped_int64_sums(
        tuple(jnp.asarray(c) for c in cols),
        jnp.asarray(gids),
        jnp.asarray(mask),
        num_groups=G,
        interpret=interpret,
    )
    for c, g_out in zip(cols, got):
        expect = np.zeros(G, np.int64)
        sel = mask
        np.add.at(expect, gids[sel], c[sel])
        np.testing.assert_array_equal(np.asarray(g_out), expect)
