#!/usr/bin/env python
"""Probe: does this TPU stack's Mosaic accept NARROW (int8/int16/int32)
pallas_call operands + in-kernel widening + f32 matmul accumulation?

The round-5 group-sum kernel (ops/pallas_group_sum.py) was rejected solely
for its s64 operands; device tiles are already bounds-narrowed
(io/table.py Table.tile), so a kernel over the raw narrow columns would
have no 64-bit operand at all.  This probe checks each piece in isolation.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"OK   {name}: {np.asarray(out).ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = repr(e).replace("\n", " ")[:300]
        print(f"FAIL {name}: {msg}", flush=True)
        return False


SUB, LANE = 8, 128
N = SUB * LANE


def k_narrow_load(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(jnp.int32) * 2


def narrow_case(dtype):
    x = jnp.arange(N, dtype=jnp.int32).reshape(SUB, LANE) % 100

    def run():
        return pl.pallas_call(
            k_narrow_load,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
        )(x.astype(dtype))

    return run


def k_matmul(p_ref, h_ref, o_ref):
    # (G, N) @ (N, P) f32 matmul accumulation on the MXU
    o_ref[...] = jnp.dot(
        h_ref[...], p_ref[...], preferred_element_type=jnp.float32
    )


def matmul_case():
    G, P = 8, 16
    pieces = jnp.ones((N, P), jnp.float32)
    onehot = jnp.ones((G, N), jnp.float32)

    def run():
        return pl.pallas_call(
            k_matmul,
            out_shape=jax.ShapeDtypeStruct((G, P), jnp.float32),
        )(pieces, onehot)

    return run


def k_iota_onehot(g_ref, o_ref):
    G = 8
    gids = g_ref[...].astype(jnp.int32)  # (SUB, LANE)
    garange = jax.lax.broadcasted_iota(jnp.int32, (G, SUB, LANE), 0)
    onehot = (garange == gids[None]).astype(jnp.float32)
    o_ref[...] = jnp.sum(onehot, axis=(1, 2)).reshape(1, G)


def onehot_case(dtype):
    g = (jnp.arange(N, dtype=jnp.int32) % 8).reshape(SUB, LANE)

    def run():
        return pl.pallas_call(
            k_iota_onehot,
            out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        )(g.astype(dtype))

    return run


def k_scratch_acc(x_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += x_ref[...].astype(jnp.int32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...]


def scratch_case():
    from jax.experimental.pallas import tpu as pltpu

    steps = 4
    x = jnp.ones((steps * SUB, LANE), jnp.int16)

    def run():
        return pl.pallas_call(
            k_scratch_acc,
            grid=(steps,),
            in_specs=[pl.BlockSpec((SUB, LANE), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((SUB, LANE), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
            scratch_shapes=[pltpu.VMEM((SUB, LANE), jnp.int32)],
        )(x)

    return run


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    probe("int32 operand", narrow_case(jnp.int32))
    probe("int16 operand", narrow_case(jnp.int16))
    probe("int8 operand", narrow_case(jnp.int8))
    probe("f32 matmul", matmul_case())
    probe("onehot from int8 gid", onehot_case(jnp.int8))
    probe("onehot from int32 gid", onehot_case(jnp.int32))
    probe("grid + int32 scratch acc", scratch_case())


if __name__ == "__main__":
    main()
