#!/usr/bin/env python
"""Probe 2: 2-D onehot constructions for the grouped-sum matmul (the 3-D
broadcasted_iota of probe 1 SIGABRTs this stack's remote compiler).

Pattern A (per-sublane-row matmuls): block (SUB, 128); for each sublane row
s: onehot_s = (iota2d(G,128) == gid[s:s+1, :]) f32, pieces_s (P,128);
partial += dot_general(onehot_s, pieces_s, contract lanes) -> (G, P).

Pattern B: same but concatenating pieces once per row from (1,128) slices.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
G, P = 8, 4


def kernel_a(x_ref, g_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.int32)  # (SUB, LANE)
    gids = g_ref[...].astype(jnp.int32)  # (SUB, LANE)
    garange = jax.lax.broadcasted_iota(jnp.int32, (G, LANE), 0)
    part = jnp.zeros((G, P), jnp.float32)
    for s in range(SUB):
        oh = (garange == gids[s : s + 1, :]).astype(jnp.float32)  # (G, LANE)
        row = x[s : s + 1, :].astype(jnp.float32)  # (1, LANE)
        pieces = jnp.concatenate(
            [row, row * 2.0, row * 3.0, row * 4.0], axis=0
        )  # (P, LANE)
        part = part + jax.lax.dot_general(
            oh,
            pieces,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[...] += part.astype(jnp.int32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...]


def run_a():
    steps = 4
    n = steps * SUB * LANE
    rng = np.random.default_rng(0)
    xv = rng.integers(0, 50, n).astype(np.int16)
    gv = rng.integers(0, G, n).astype(np.int8)
    x = jnp.asarray(xv).reshape(steps, SUB, LANE)
    g = jnp.asarray(gv).reshape(steps, SUB, LANE)
    import os
    interp = bool(os.environ.get('PALLAS_INTERP'))
    out = pl.pallas_call(
        kernel_a3,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, P), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, P), jnp.int32),
        scratch_shapes=[pltpu.VMEM((G, P), jnp.int32)],
        interpret=interp,
    )(x, g)
    got = np.asarray(out)
    exp = np.zeros((G, P), np.int64)
    for p in range(P):
        np.add.at(exp[:, p], gv, xv.astype(np.int64) * (p + 1))
    np.testing.assert_array_equal(got, exp)
    return "exact"


def kernel_a3(x_ref, g_ref, o_ref, acc_ref):
    # identical math but block refs carry the leading 1-axis
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.int32)
    gids = g_ref[0].astype(jnp.int32)
    garange = jax.lax.broadcasted_iota(jnp.int32, (G, LANE), 0)
    part = jnp.zeros((G, P), jnp.float32)
    for s in range(SUB):
        oh = (garange == gids[s : s + 1, :]).astype(jnp.float32)
        row = x[s : s + 1, :].astype(jnp.float32)
        pieces = jnp.concatenate(
            [row, row * 2.0, row * 3.0, row * 4.0], axis=0
        )
        part = part + jax.lax.dot_general(
            oh, pieces, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[...] += part.astype(jnp.int32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...]


def probe(name, fn):
    try:
        r = fn()
        print(f"OK   {name}: {r}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {repr(e)[:250]}", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    probe("pattern A (per-sublane onehot matmul)", run_a)


if __name__ == "__main__":
    main()
