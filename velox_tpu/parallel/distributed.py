"""Distributed query steps over a device mesh.

Reference re-orientation (SURVEY.md §2.12): the reference's parallelism is
intra-pipeline driver parallelism + distributed partitioned exchange.  Here:

* driver parallelism  -> rows sharded over the mesh's ``data`` axis; elementwise
  pipeline stages (filter/project) run on local shards with XLA auto-partitioning;
* distributed shuffle -> explicit ``shard_map`` region using
  velox_tpu.parallel.exchange (hash partition + all_to_all over ICI/DCN);
* after the exchange every group key lives on exactly one device, so grouped
  aggregation is purely local — no post-aggregation merge collective needed
  (the reference's final-aggregation-after-shuffle topology).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..expr.compiler import ExprSet
from ..expr.ir import Expr
from ..vector.column import Batch, Column
from .exchange import exchange_rows


def make_mesh(n_devices: int, axis: str = "data") -> Mesh:
    devices = jax.devices()[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def distributed_grouped_sum(
    mesh: Mesh,
    predicate: Expr,
    value_expr: Expr,
    schema,
    num_groups: int,
    axis: str = "data",
) -> Callable:
    """Build a jitted distributed step: filter -> project -> exchange-by-key ->
    local grouped sum.  Inputs: dict of sharded [N] column arrays + a [N] int32
    group-key array; output: [n_devices, num_groups] partial sums where row d
    holds exactly the groups owned by device d (others zero).
    """
    n = mesh.devices.size

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(tuple(P(axis) for _ in schema.names), P(axis)),
        out_specs=P(axis),
    )
    def step(local_cols: Tuple[jax.Array, ...], local_keys: jax.Array):
        cap = local_keys.shape[0]
        batch = Batch.make(
            schema,
            [Column.flat(c, t) for c, t in zip(local_cols, schema.types)],
            length=cap,
            capacity=cap,
        )
        [pred, val] = ExprSet([predicate, value_expr]).eval(batch)
        mask = pred.values.astype(jnp.bool_)
        if pred.validity is not None:
            mask = mask & pred.validity
        values = val.values
        # shuffle rows so each key lands on device hash(key) % n
        # default bucket = full capacity: overflow is impossible, the
        # dropped counter is zero by construction
        (vals_recv,), keys_recv, live, _dropped = exchange_rows(
            [values], local_keys, mask, axis, n
        )
        from ..ops.segmented import direct_group_reduce

        gids = jnp.clip(keys_recv.astype(jnp.int32), 0, num_groups - 1)
        partial = direct_group_reduce(vals_recv, live, gids, num_groups, "sum")
        return partial[None]

    def run(columns: Sequence[jax.Array], keys: jax.Array):
        return step(tuple(columns), keys)

    return jax.jit(run)
