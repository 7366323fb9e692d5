"""Hash join execution.

Reference: velox/exec/HashBuild.h:39 / HashProbe.h:28 / HashJoinBridge.h — the
reference builds a quadratic-probing hash table from the build side and streams
probe batches through it.

TPU re-design: random-access probing (hash probes, binary search) is hostile to
this machine — measured on TPU v5e, vectorized binary search over a 4M tile
costs seconds while a multi-operand sort costs ~55 ms.  The probe is therefore a
**sort-merge lookup**:

  1. build side: key-sorted arrays, device-resident (the JoinBridge analog);
  2. per probe tile: sort the concatenation [build keys ++ probe keys] with a
     tie-break flag so each build row precedes equal probe keys;
  3. a running maximum (cummax) of "last build row index seen" gives every probe
     row its candidate match in one scan;
  4. a second sort by original position restores probe order ("scatter = sort").

Everything is sort/scan/gather — no scatters, no binary search.  This is the
normalized-key regime the reference itself prefers (HashTable kNormalizedKey,
velox/exec/HashTable.h:74).

Round-1 scope: single-key equi-joins with a UNIQUE build side (primary-key
joins; validated at build time).  INNER / LEFT (probe-preserving) / LEFT_SEMI /
ANTI are supported; duplicate-build-key expansion joins land with the
dynamic-output work.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import RowType
from ..io.table import Table
from ..plan.nodes import HashJoinNode, JoinType
from ..vector.column import Batch, Column


class JoinBuildError(RuntimeError):
    pass


@dataclasses.dataclass
class HashJoinExec:
    """Device-resident build state + trace-time probe application."""

    node: HashJoinNode
    build_keys: jax.Array  # [B] sorted
    build_cols: Dict[str, Tuple[jax.Array, Optional[jax.Array]]]  # sorted payloads
    build_size: int
    build_tables: Dict[str, object]

    @staticmethod
    def build(node: HashJoinNode, build_result: Table) -> "HashJoinExec":
        """Construct the bridge from the executed build-side pipeline result."""
        if len(node.right_keys) != 1 or len(node.left_keys) != 1:
            raise NotImplementedError("multi-key joins not yet supported")
        key_name = node.right_keys[0]
        keys = np.asarray(build_result.columns[key_name])
        order = np.argsort(keys, kind="stable")
        keys_sorted = keys[order]
        if len(keys_sorted) > 1 and (keys_sorted[1:] == keys_sorted[:-1]).any():
            raise JoinBuildError(
                "build side has duplicate keys; only unique-build joins are "
                "supported in this version"
            )
        cols: Dict[str, Tuple[jax.Array, Optional[jax.Array]]] = {}
        right_schema = node.right.output_schema
        for name in node.output_columns:
            if name in right_schema and name != key_name:
                arr = np.asarray(build_result.columns[name])[order]
                validity = build_result.validities.get(name)
                v = None if validity is None else jnp.asarray(validity[order])
                cols[name] = (jnp.asarray(arr), v)
        return HashJoinExec(
            node,
            jnp.asarray(keys_sorted),
            cols,
            len(keys_sorted),
            dict(build_result.string_tables),
        )

    # ---- sort-merge lookup --------------------------------------------
    def _lookup(self, probe_keys: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Returns (build_pos [cap] int32, found [cap] bool) in probe order."""
        cap = probe_keys.shape[0]
        B = self.build_size
        if B == 0:
            return (
                jnp.zeros((cap,), jnp.int32),
                jnp.zeros((cap,), jnp.bool_),
            )
        kt = self.build_keys.dtype
        all_keys = jnp.concatenate([self.build_keys, probe_keys.astype(kt)])
        is_probe = jnp.concatenate(
            [jnp.zeros((B,), jnp.int8), jnp.ones((cap,), jnp.int8)]
        )
        orig = jnp.concatenate(
            [
                jnp.arange(B, dtype=jnp.int32),
                jnp.arange(cap, dtype=jnp.int32),
            ]
        )
        # sort by (key, is_probe): build rows precede equal probe keys
        k_s, p_s, o_s = jax.lax.sort((all_keys, is_probe, orig), num_keys=2)
        bidx = jnp.where(p_s == 0, o_s, jnp.int32(-1))
        last_build = jax.lax.cummax(bidx)
        cand = jnp.clip(last_build, 0, B - 1)
        hit = (
            (p_s == 1)
            & (last_build >= 0)
            & (jnp.take(self.build_keys, cand, mode="clip") == k_s)
        )
        # restore probe order: sort by (is_probe, orig); probe section is the tail
        _, o2, pos2, hit2 = jax.lax.sort(
            (p_s, o_s, cand, hit.astype(jnp.int8)), num_keys=2
        )
        return pos2[B:], hit2[B:].astype(jnp.bool_)

    # ---- trace-time probe -------------------------------------------------
    def probe(self, batch: Batch) -> Batch:
        node = self.node
        cap = batch.capacity
        left_schema = node.left.output_schema
        probe_key_col = batch.column(node.left_keys[0])
        probe_keys, probe_valid = probe_key_col.decode(cap)
        pos, found = self._lookup(probe_keys)
        if probe_valid is not None:
            found = found & probe_valid

        jt = node.join_type
        if jt in (JoinType.INNER, JoinType.LEFT_SEMI):
            batch = batch.with_selection(found)
        elif jt == JoinType.ANTI:
            batch = batch.with_selection(~found)
        elif jt == JoinType.LEFT:
            pass  # probe-preserving
        else:
            raise NotImplementedError(f"join type {jt} not yet supported")

        out_cols: List[Column] = []
        key_right = node.right_keys[0]
        for name, dtype in zip(
            node.output_schema.names, node.output_schema.types
        ):
            if name in left_schema:
                out_cols.append(batch.column(name))
            elif name == key_right:
                # right key equals left key on matched rows
                validity = found if jt == JoinType.LEFT else None
                out_cols.append(
                    Column.flat(
                        probe_keys.astype(dtype.device_dtype), dtype, validity
                    )
                )
            else:
                values, validity = self.build_cols[name]
                if self.build_size == 0:
                    gathered = jnp.zeros((cap,), dtype=values.dtype)
                    gv = jnp.zeros((cap,), dtype=jnp.bool_)
                else:
                    gathered = jnp.take(values, pos, mode="clip")
                    gv = (
                        None
                        if validity is None
                        else jnp.take(validity, pos, mode="clip")
                    )
                if jt == JoinType.LEFT:
                    gv = found if gv is None else (gv & found)
                out_cols.append(
                    Column.flat(gathered, dtype, gv, self.build_tables.get(name))
                )
        if node.filter is not None:
            raise NotImplementedError("join filters not yet supported")
        return batch.with_columns(node.output_schema, out_cols)
