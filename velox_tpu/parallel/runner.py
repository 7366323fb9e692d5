"""Distributed plan execution over a device mesh.

Reference re-orientation: the reference scales out via N identical Drivers per
pipeline (intra-host, velox/exec/LocalPlanner.cpp:174) plus a partitioned
exchange between hosts (§5.8).  Here:

* intra-pipeline data parallelism -> the scan's tiles are sharded over the
  mesh's ``data`` axis; the SAME traced tile program as the single-chip path
  runs under jit with sharding annotations, and XLA inserts the cross-device
  ``psum`` for the (replicated) accumulator reduction automatically — the
  compiler is the exchange planner for aggregation states;
* explicit row exchange (joins / high-cardinality shuffles) uses
  velox_tpu.parallel.exchange inside shard_map (see distributed.py) — wired in
  for grouped sort-mode aggregation, where each device reduces its shard's key
  runs and the exact merge happens once at the end.

The executor validates against LocalExecutor bit-for-bit: accumulators are
integer-exact, so device count cannot change results.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..exec.runner import (
    AggExecutor,
    LocalExecutor,
    RunStats,
    _linearize,
    _pick_capacity,
    _raise_on_errors,
    apply_streaming,
)
from ..io.table import Table
from ..plan.nodes import PlanNode, ValuesNode
from ..vector.column import Batch, Column


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


class DistributedExecutor:
    """Executes a single-pipeline plan with tiles sharded over a mesh axis.

    The per-tile capacity is ``n_devices * per_device_rows`` so each device owns
    an equal contiguous shard of every tile.
    """

    def __init__(
        self,
        root: PlanNode,
        mesh: Mesh,
        per_device_rows: int = 1 << 18,
        axis: str = "data",
    ):
        self.mesh = mesh
        self.axis = axis
        self.n = mesh.devices.size
        lin = _linearize(root)
        from ..exec.joins import HashJoinExec

        resolved: List[Tuple] = []
        for step in lin.steps:
            if step[0] == "join":
                # build sides are small by design (broadcast build): run locally,
                # replicate the built table to every device via jit closure
                build = LocalExecutor(step[1].right).run()
                resolved.append(("join", HashJoinExec.build(step[1], build)))
            else:
                resolved.append(step)
        lin.steps = resolved
        self.lin = lin
        self.source_table = lin.source.table.select(
            list(lin.source.output_schema.names)
        )
        per_device = _pick_capacity(
            max(-(-self.source_table.num_rows // self.n), 1), per_device_rows
        )
        self.capacity = per_device * self.n
        self.row_sharding = NamedSharding(mesh, P(axis))
        self.replicated = NamedSharding(mesh, P())

        if lin.agg is not None:
            ex = AggExecutor(lin.agg, self.capacity)
            self.agg_exec = ex
            if ex.mode in ("ungrouped", "array"):
                self.kind = "direct_agg"

                def tile_step(carry, batch):
                    (accs_rc, errs) = carry
                    batch2, err = apply_streaming(batch, lin.steps)
                    return (ex.update_carry(accs_rc, batch2), errs + err)

                # accumulators replicated; rows sharded — XLA inserts the psum
                self._tile_step = jax.jit(
                    tile_step, out_shardings=self.replicated, donate_argnums=(0,)
                )
            else:
                self.kind = "sort_agg_exchange"
                # per-DEVICE executor: partial groups, exchange, local merge
                self.per_dev = self.capacity // self.n
                self.local_agg = AggExecutor(lin.agg, self.per_dev)
                self._build_exchange_step()
        else:
            raise NotImplementedError(
                "distributed collect pipelines land with the distributed join work"
            )

    # ------------------------------------------------------------------
    def _build_exchange_step(self):
        """Jitted distributed tile step: per-device pipeline + partial groups,
        hash all_to_all of the groups so each device owns its key space, then
        device-local carry merge (SURVEY.md §5.8: the partitioned exchange as
        collectives; reference seam PartitionedOutput -> ExchangeSource)."""
        from .exchange import all_to_all_exchange, bucketize, hash64, partition_destinations

        ex = self.local_agg
        lin = self.lin
        n, axis, per_dev = self.n, self.axis, self.per_dev
        mesh = self.mesh
        nkeys = len(ex.key_infos)
        acc_widths = [len(a.acc_ops) for a in ex.aggs]

        def local_shard_step(carry_flat, arrays, active, errs):
            # rebuild the local batch shard and run the pipeline
            batch = self._local_batch(arrays, active)
            batch2, err = apply_streaming(batch, lin.steps)
            keys, accs, nruns = ex.tile_partial(batch2)
            flat = list(keys) + [a for acc in accs for a in acc]
            live = jnp.arange(per_dev, dtype=jnp.int32) < nruns
            # partition groups by combined key hash
            h = jnp.zeros((per_dev,), dtype=jnp.uint64)
            for k in keys:
                h = h * jnp.uint64(31) + hash64(k.astype(jnp.int64))
            dest = (h % jnp.uint64(n)).astype(jnp.int32)
            bucketed, counts, _ = bucketize(flat, dest, live, n, per_dev)
            overflow_x = jnp.sum((counts > per_dev).astype(jnp.int32))
            received, recv_counts = all_to_all_exchange(bucketed, counts, axis)
            offs = jnp.arange(per_dev, dtype=jnp.int32)[None, :]
            recv_live = (offs < recv_counts[:, None]).reshape(-1)
            recv_flat = [r.reshape((n * per_dev,) + r.shape[2:]) for r in received]
            keys_r = tuple(recv_flat[:nkeys])
            accs_r = []
            i = nkeys
            for w in acc_widths:
                accs_r.append(tuple(recv_flat[i : i + w]))
                i += w
            state, cerrs = carry_flat
            keys_c, accs_c, count, overflow = state
            new_state = ex.merge_partial_into_carry(
                (keys_c, accs_c, count, overflow + overflow_x),
                (keys_r, tuple(accs_r), recv_live),
            )
            return (new_state, cerrs + err + errs * 0)

        self._exchange_step_builder = local_shard_step

    def _local_batch(self, arrays, active):
        """Rebuild a per-device Batch from flattened shard arrays."""
        per_dev = self.per_dev
        schema = self._batch_schema
        local_cols = []
        pos = 0
        for (has_validity, strings), dtype in zip(self._batch_layout, schema.types):
            values = arrays[pos]
            pos += 1
            validity = None
            if has_validity:
                validity = arrays[pos]
                pos += 1
            local_cols.append(Column.flat(values, dtype, validity, strings))
        lb = Batch.make(schema, local_cols, length=per_dev, capacity=per_dev)
        return dataclasses.replace(lb, selection=active)

    def _flatten_batch(self, batch: Batch):
        cols = [c.flatten(batch.capacity) for c in batch.columns]
        arrays, layout = [], []
        for c in cols:
            arrays.append(c.data)
            if c.validity is not None:
                arrays.append(c.validity)
                layout.append((True, c.strings))
            else:
                layout.append((False, c.strings))
        self._batch_schema = batch.schema
        self._batch_layout = layout
        return arrays, batch.active_mask()

    def _sharded_partial(self, batch: Batch):
        """Per-device sort-mode partials via shard_map: each device sorts and
        run-reduces its own shard; results are [n, per_device_cap] stacked."""
        ex = self.agg_exec
        lin = self.lin
        per_dev = self.capacity // self.n
        mesh, axis = self.mesh, self.axis

        cols = [c.flatten(batch.capacity) for c in batch.columns]
        arrays = []
        layout: List[Tuple[int, bool]] = []
        for c in cols:
            arrays.append(c.data)
            if c.validity is not None:
                arrays.append(c.validity)
                layout.append((1, True))
            else:
                layout.append((1, False))
        active = batch.active_mask()

        schema = batch.schema

        def local(arrs, mask):
            # rebuild a local per-device Batch from the shard
            local_cols = []
            pos = 0
            for (_, has_validity), dtype, col in zip(layout, schema.types, cols):
                values = arrs[pos]
                pos += 1
                validity = None
                if has_validity:
                    validity = arrs[pos]
                    pos += 1
                local_cols.append(Column.flat(values, dtype, validity, col.strings))
            lb = Batch.make(schema, local_cols, length=per_dev, capacity=per_dev)
            lb = dataclasses.replace(lb, selection=mask)
            return ex.tile_partial(lb)

        sm = jax.shard_map(
            lambda arrs, m: _stack_partial(local(arrs, m)),
            mesh=mesh,
            in_specs=(tuple(P(axis) for _ in arrays), P(axis)),
            out_specs=P(axis),
        )
        return sm(tuple(arrays), active)

    def device_tiles(self) -> List[Batch]:
        tiles = []
        n_tiles = self.source_table.num_tiles(self.capacity)
        for i in range(n_tiles):
            host = self.source_table.tile(i, self.capacity)

            def place(x):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == self.capacity:
                    return jax.device_put(x, self.row_sharding)
                return jax.device_put(x, self.replicated)

            tiles.append(jax.tree_util.tree_map(place, host))
        return tiles

    def run(self, prefetched_tiles=None, stats: Optional[RunStats] = None) -> Table:
        tiles = prefetched_tiles if prefetched_tiles is not None else self.device_tiles()
        if stats is not None:
            stats.tiles = len(tiles)
            stats.rows_in = self.source_table.num_rows
        lin = self.lin
        if self.kind == "direct_agg":
            ex = self.agg_exec
            carry = (ex.init_carry(), jnp.zeros((), dtype=jnp.int64))
            carry = jax.device_put(carry, self.replicated)
            for t in tiles:
                carry = self._tile_step(carry, t)
            (accs, rowcounts), errs = carry
            accs_np = [tuple(np.asarray(a) for a in acc) for acc in accs]
            _raise_on_errors(int(errs))
            result = ex.extract(None, accs_np, np.asarray(rowcounts))
        else:
            ex = self.local_agg
            n, per_dev, axis = self.n, self.per_dev, self.axis
            step_fn = self._exchange_step_builder

            jit_step = None
            carry = None
            err_total = 0
            for t in tiles:
                arrays, active = self._flatten_batch(t)
                if jit_step is None:
                    # carry: per-device sorted-carry state, sharded over the mesh
                    def init_global():
                        keys = tuple(
                            jnp.zeros((n * per_dev,), dtype=i.dtype.device_dtype)
                            for i in ex.key_infos
                        )
                        accs = tuple(agg.acc_init(n * per_dev) for agg in ex.aggs)
                        count = jnp.zeros((n,), dtype=jnp.int32)
                        overflow = jnp.zeros((n,), dtype=jnp.int32)
                        errs = jnp.zeros((n,), dtype=jnp.int64)
                        return ((keys, accs, count, overflow), errs)

                    def shard_body(state_errs, arrs, mask):
                        (keys_c, accs_c, count, overflow), errs = state_errs
                        state = (
                            keys_c,
                            accs_c,
                            count.reshape(()),
                            overflow.reshape(()),
                        )
                        new_state, new_errs = step_fn(
                            (state, errs.reshape(())), arrs, mask,
                            jnp.zeros((), jnp.int64),
                        )
                        ks, acs, cnt, ovf = new_state
                        return (
                            (ks, acs, cnt.reshape(1), ovf.reshape(1)),
                            new_errs.reshape(1),
                        )

                    from jax.sharding import PartitionSpec as P2

                    jit_step = jax.jit(
                        jax.shard_map(
                            shard_body,
                            mesh=self.mesh,
                            in_specs=(
                                (
                                    (
                                        tuple(P2(axis) for _ in ex.key_infos),
                                        tuple(
                                            tuple(P2(axis) for _ in agg.acc_ops)
                                            for agg in ex.aggs
                                        ),
                                        P2(axis),
                                        P2(axis),
                                    ),
                                    P2(axis),
                                ),
                                tuple(P2(axis) for _ in arrays),
                                P2(axis),
                            ),
                            out_specs=(
                                (
                                    tuple(P2(axis) for _ in ex.key_infos),
                                    tuple(
                                        tuple(P2(axis) for _ in agg.acc_ops)
                                        for agg in ex.aggs
                                    ),
                                    P2(axis),
                                    P2(axis),
                                ),
                                P2(axis),
                            ),
                            check_vma=False,
                        ),
                        donate_argnums=(0,),
                    )
                    carry = jax.device_put(
                        init_global(),
                        jax.tree_util.tree_map(
                            lambda _: self.row_sharding, init_global()
                        ),
                    )
                carry = jit_step(carry, tuple(arrays), active)
            (keys_g, accs_g, counts_g, overflow_g), errs_g = carry
            counts = np.asarray(counts_g)
            overflow = np.asarray(overflow_g)
            err_total = int(np.asarray(errs_g).sum())
            _raise_on_errors(err_total)
            if overflow.sum():
                raise RuntimeError(
                    "distributed group exchange overflowed its buckets; "
                    "raise per_device_rows"
                )
            # every key lives on exactly one device: concat per-device prefixes
            keys_np = [np.asarray(k) for k in keys_g]
            accs_np = [[np.asarray(a) for a in acc] for acc in accs_g]
            key_chunks, acc_chunks = [], []
            for d in range(n):
                cnt = int(counts[d])
                sl = slice(d * per_dev, d * per_dev + cnt)
                key_chunks.append([k[sl] for k in keys_np])
                acc_chunks.append([tuple(a[sl] for a in acc) for acc in accs_np])
            group_keys, merged = ex.merge_partials_host(key_chunks, acc_chunks)
            result = ex.extract(group_keys, merged)
        from ..exec.runner import apply_finishers

        return apply_finishers(result, lin.finishers)


def _stack_partial(partial):
    """Flatten a tile_partial result for shard_map output stacking."""
    key_arrays, accs, num_groups = partial
    return (
        tuple(key_arrays),
        tuple(tuple(a for a in acc) for acc in accs),
        num_groups.reshape(1),
    )
