"""Trace-time value form of ARRAY/MAP expressions.

Scalar expressions evaluate to flat jnp arrays (EvalResult.values); complex
expressions evaluate to a :class:`SegValue` — per-row (start, size) spans over
fixed-capacity element pools.  SegValue exists only inside a trace: it is
built from a complex ``Column`` at FieldAccess and converted back at the
ExprSet output boundary, so it needs no pytree registration.

``normalized()`` repacks pools into dense row order (ops.segpool.normalize)
and memoizes the result — lambda evaluation and per-row reductions need the
pool↔row correspondence, while pure span lookups (cardinality, element_at)
work on any layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..dtypes import DataType, TypeKind
from ..vector.string_table import StringTable


@dataclasses.dataclass
class Elems:
    """One element pool: values (+validity) of the child of an ARRAY/MAP."""

    values: Any  # jax.Array | SegValue (nested complex elements)
    validity: Optional[jax.Array]
    dtype: DataType
    strings: Optional[StringTable] = None

    @property
    def pool_cap(self) -> int:
        if isinstance(self.values, SegValue):
            return self.values.capacity
        return self.values.shape[0]

    def validity_or_true(self) -> jax.Array:
        if self.validity is None:
            return jnp.ones((self.pool_cap,), jnp.bool_)
        return self.validity

    def take(self, indices: jax.Array) -> "Elems":
        if isinstance(self.values, SegValue):
            values = self.values.take_rows(indices)
        else:
            values = jnp.take(self.values, indices, axis=0, mode="clip")
        validity = (
            None
            if self.validity is None
            else jnp.take(self.validity, indices, axis=0, mode="clip")
        )
        return Elems(values, validity, self.dtype, self.strings)


@dataclasses.dataclass
class SegValue:
    """Per-row spans over element pools: the device value of ARRAY/MAP rows."""

    starts: jax.Array  # int32[capacity]
    sizes: jax.Array  # int32[capacity]
    children: Tuple[Elems, ...]  # ARRAY: (elements,); MAP: (keys, values)
    dtype: DataType  # the ARRAY/MAP type
    _norm_cache: Optional["NormSeg"] = dataclasses.field(default=None, repr=False)

    @property
    def capacity(self) -> int:
        return self.starts.shape[0]

    @property
    def pool_cap(self) -> int:
        return self.children[0].pool_cap

    def take_rows(self, indices: jax.Array) -> "SegValue":
        return SegValue(
            jnp.take(self.starts, indices, mode="clip"),
            jnp.take(self.sizes, indices, mode="clip"),
            self.children,
            self.dtype,
        )

    # ---- normalization ---------------------------------------------------
    def normalized(self) -> "NormSeg":
        if self._norm_cache is not None:
            return self._norm_cache
        from ..ops.segpool import normalize

        flat_pools, specs = [], []
        for ch in self.children:
            arrs, spec = _flatten_elems(ch)
            flat_pools.extend(arrs)
            specs.append(spec)
        starts, sizes, new_pools, rowid, emask, overflow = normalize(
            self.starts, self.sizes, tuple(flat_pools), self.pool_cap
        )
        new_children = []
        i = 0
        for ch, spec in zip(self.children, specs):
            ch2, i = _rebuild_elems(ch, spec, new_pools, i)
            new_children.append(ch2)
        norm = NormSeg(
            SegValue(starts, sizes, tuple(new_children), self.dtype),
            rowid,
            emask,
            overflow,
        )
        self._norm_cache = norm
        return norm

    # ---- Column conversion ----------------------------------------------
    @staticmethod
    def from_column(col) -> "SegValue":
        assert col.dtype.is_complex
        children = []
        for ch in col.children:
            if ch.dtype.is_complex:
                children.append(
                    Elems(SegValue.from_column(ch), ch.validity, ch.dtype, None)
                )
            else:
                children.append(Elems(ch.data, ch.validity, ch.dtype, ch.strings))
        return SegValue(
            col.data[:, 0], col.data[:, 1], tuple(children), col.dtype
        )

    def to_column(self, validity: Optional[jax.Array] = None):
        from ..vector.column import Column, Encoding

        spans = jnp.stack(
            [self.starts.astype(jnp.int32), self.sizes.astype(jnp.int32)], axis=1
        )
        children = []
        for ch in self.children:
            if isinstance(ch.values, SegValue):
                children.append(ch.values.to_column(ch.validity))
            else:
                children.append(
                    Column.flat(ch.values, ch.dtype, ch.validity, ch.strings)
                )
        return Column(
            spans, validity, None, self.dtype, Encoding.FLAT, None, tuple(children)
        )


@dataclasses.dataclass
class StructValue:
    """Trace-time value of ROW expressions: one Elems per field."""

    fields: Tuple[Elems, ...]
    dtype: DataType  # the ROW type

    @staticmethod
    def from_column(col) -> "StructValue":
        fields = []
        for ch, ft in zip(col.children, col.dtype.children):
            if ft.kind == TypeKind.ROW:
                fields.append(
                    Elems(StructValue.from_column(ch), ch.validity, ft, None)
                )
            elif ft.is_complex:
                fields.append(
                    Elems(SegValue.from_column(ch), ch.validity, ft, None)
                )
            else:
                fields.append(Elems(ch.data, ch.validity, ft, ch.strings))
        return StructValue(tuple(fields), col.dtype)

    def to_column(self, validity: Optional[jax.Array] = None):
        from ..vector.column import Column, Encoding

        children = []
        capacity = None
        for f in self.fields:
            if isinstance(f.values, (SegValue, StructValue)):
                children.append(f.values.to_column(f.validity))
                capacity = capacity or (
                    f.values.capacity
                    if isinstance(f.values, SegValue)
                    else None
                )
            else:
                children.append(
                    Column.flat(f.values, f.dtype, f.validity, f.strings)
                )
                capacity = capacity or f.values.shape[0]
        placeholder = jnp.zeros((capacity or 1,), jnp.int8)
        return Column(
            placeholder, validity, None, self.dtype, Encoding.FLAT, None,
            tuple(children),
        )

    def field(self, name: str) -> Elems:
        return self.fields[self.dtype.names.index(name)]


@dataclasses.dataclass
class NormSeg:
    """A SegValue with a dense, row-ordered pool + derived index arrays."""

    seg: SegValue
    rowid: jax.Array  # int32[pool_cap]: owning row of each pool slot
    emask: jax.Array  # bool[pool_cap]: live pool slots
    # scalar bool: total elements exceeded the static pool (duplicated spans);
    # consumers surface this as a query error rather than truncate silently
    overflow: Optional[jax.Array] = None

    @property
    def starts(self):
        return self.seg.starts

    @property
    def sizes(self):
        return self.seg.sizes

    @property
    def children(self):
        return self.seg.children


def _flatten_elems(ch: Elems):
    """Elems -> (flat jax arrays to gather, reassembly spec)."""
    if isinstance(ch.values, SegValue):
        # nested complex: the nested spans are pool-level arrays; nested pools
        # themselves stay put (they are indexed through the nested spans)
        arrs = [ch.values.starts, ch.values.sizes]
        spec = ("nested", ch.validity is not None)
        if ch.validity is not None:
            arrs.append(ch.validity)
        return arrs, spec
    arrs = [ch.values]
    spec = ("leaf", ch.validity is not None)
    if ch.validity is not None:
        arrs.append(ch.validity)
    return arrs, spec


def _rebuild_elems(ch: Elems, spec, pools, i):
    kind, has_validity = spec
    if kind == "nested":
        starts, sizes = pools[i], pools[i + 1]
        i += 2
        validity = None
        if has_validity:
            validity = pools[i]
            i += 1
        inner = ch.values
        return (
            Elems(
                SegValue(starts, sizes, inner.children, inner.dtype),
                validity,
                ch.dtype,
                ch.strings,
            ),
            i,
        )
    values = pools[i]
    i += 1
    validity = None
    if has_validity:
        validity = pools[i]
        i += 1
    return Elems(values, validity, ch.dtype, ch.strings), i
